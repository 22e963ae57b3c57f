"""Turn-text canonicalization (pipeline stage 0).

The reference matches raw terms; our transcripts need a deterministic
canonical form first so that "same utterance" is well defined: lowercase,
trim, whitespace collapse. All built-in column expressions (JVM-side).

The optional phonetic rewrite stage ports the intent of the reference's
Zompist English spelling-normalization rules
(/root/reference/src/phonetic/rules.rs — orthography/phonetic rule sets
applied before matching) as a chain of regexp_replace column expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def canon_text(col: Column | str) -> Column:
    """lower + trim + collapse internal whitespace runs to single spaces."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")


# A compact, deterministic subset of English spelling-normalization rewrite
# rules in the spirit of the reference's orthography_rules()/zompist_rules()
# (/root/reference/src/phonetic/rules.rs): each entry (pattern, replacement)
# is applied in order with regexp_replace. Terminating by construction
# (each rule is applied once, no rule re-introduces its own pattern).
# Patterns are RE2-safe (no lookahead/backrefs) so the same chain runs
# verbatim in engines with RE2 regexes (e.g. the DuckDB oracle).
PHONETIC_RULES: list[tuple[str, str]] = [
    (r"ph", "f"),        # orthographic ph -> f
    (r"ght", "t"),       # light -> lit
    (r"kn", "n"),        # knife -> nife
    (r"wr", "r"),        # write -> rite
    (r"mb$", "m"),       # lamb -> lam
    (r"ck", "k"),        # back -> bak
    (r"qu", "kw"),       # quick -> kwick
    (r"x", "ks"),        # box -> boks
    (r"ce", "se"),       # cell -> sell (soft c, spelled out per vowel:
    (r"ci", "si"),       #   RE2 has no lookahead)
    (r"cy", "sy"),
    (r"c", "k"),         # cat -> kat
] + [(f"{c}+", c) for c in "abcdefghijklmnopqrstuvwxyz"]  # collapse runs


def phonetic_canon(col: Column | str) -> Column:
    """Apply the phonetic rewrite chain after basic canonicalization."""
    c = canon_text(col)
    for pat, rep in PHONETIC_RULES:
        c = F.regexp_replace(c, pat, rep)
    return c


def term_id(col: Column | str) -> Column:
    """Deterministic, collision-safe (128-bit) term identifier.

    md5 hex of the canonical text: stable across runs/clusters (unlike
    monotonically_increasing_id), so checkpoints resume byte-identically;
    128 bits keeps the birthday bound negligible at 10^12 distinct terms.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.encode(c, "UTF-8"))
