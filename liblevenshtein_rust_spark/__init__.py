"""PySpark-native approximate-string-matching / record-linkage engine.

A from-scratch distributed re-expression of the capabilities of
``vinary-tree/liblevenshtein-rust`` (Levenshtein-automaton fuzzy matching over
dictionaries — see SURVEY.md): blocking + pairwise scoring + transitive
clustering over tables of multi-turn conversation transcripts.

Design principles (Spark-first, not a port):

- DataFrame / Spark SQL everywhere; the Levenshtein automaton's branch pruning
  becomes *blocking-key selectivity* (deletion-neighborhood keys a la the
  automaton's delete transitions, PassJoin pigeonhole segment keys for long
  text), all generated JVM-side with ``explode``/``substring`` so Catalyst and
  whole-stage codegen own the hot path.
- Python appears only in the vectorized Arrow/pandas scoring kernels
  (numpy banded DP over codepoint matrices — the distributed analog of the
  reference's SIMD kernels, ``/root/reference/src/distance/simd.rs``).
- No RDDs, no per-row Python UDFs, no driver-side loops over collected rows.
"""

__version__ = "0.1.0"
