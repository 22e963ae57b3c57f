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


# The reference's FULL 13-rule Zompist chain, rule for rule and in rule-set
# order (/root/reference/src/phonetic/rules.rs: orthography_rules() 8 +
# phonetic_rules() 3 + test_rules() 2; composition zompist_rules() at
# rules.rs:286). Representation choices and deviations, all deliberate:
#
# - Digraph phones ç (tsh) and $ (sh) are represented as 'C' and 'S' —
#   input is lowercased by canon_text, so uppercase letters are free
#   representation symbols that survive both engines as plain ASCII.
# - Context::BeforeVowel([e,i]) is spelled out per vowel (ce→se, ci→si)
#   because RE2 (the DuckDB oracle's regex engine) has no lookahead;
#   spelled-out consumption is equivalent to the reference's
#   position-scan for these rules (vowels are never rule targets).
# - Context::Final is the RE2-safe '$' anchor (term-level application —
#   apply to words, not multi-word turn texts).
# - APPLICATION SEMANTICS: one global left-to-right pass per rule, in
#   order. The reference's apply_rules_seq (application.rs:313) instead
#   loops to a fixpoint with restart and a FUEL bound — under which the
#   qu→kw / kw→qu pair oscillates until fuel is exhausted, making the
#   result fuel-dependent. The single-pass chain is the deterministic,
#   unconditionally terminating restriction (each rule fires once; no
#   fuel parameter), and agrees with the fixpoint on oscillation-free
#   inputs.
ZOMPIST_RULES: list[tuple[str, str]] = [
    (r"ch", "C"),     # rule 1: ch -> ç (tsh digraph)
    (r"sh", "S"),     # rule 2: sh -> $ (sh digraph)
    (r"ph", "f"),     # rule 3
    (r"ce", "se"),    # rule 20: c -> s / _[ie]
    (r"ci", "si"),
    (r"c", "k"),      # rule 21: c -> k elsewhere
    (r"ge", "je"),    # rule 22: g -> j / _[ie]
    (r"gi", "ji"),
    (r"e$", ""),      # rule 33: silent final e
    (r"gh", ""),      # rule 34: gh -> ∅
    (r"th", "t"),     # rule 100 (phonetic, weight 0.15)
    (r"qu", "kw"),    # rule 101
    (r"kw", "qu"),    # rule 102 (note: with 101 in sequence, original
                      #   qu round-trips and original kw becomes qu)
    (r"x", "yy"),     # rule 200 (expansion test rule)
    (r"y", "z"),      # rule 201
]


def zompist_canon(col: Column | str) -> Column:
    """Full Zompist spelling-normalization of a TERM (single word)."""
    c = canon_text(col)
    for pat, rep in ZOMPIST_RULES:
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
