"""Fellegi-Sunter probabilistic record linkage (blocked candidate pairs
-> comparison vectors -> EM-estimated m/u probabilities -> match weights
-> classified links).

The reference engine stops at distance-thresholded query results; a
record-linkage deployment needs a principled way to combine evidence from
SEVERAL fields (name edit distance, exact attribute agreement, ...) into
one match decision. This module implements the classic probabilistic
framework (Fellegi & Sunter, JASA 1969; EM estimation per Winkler 1988;
the same decomposition used by Splink and FEBRL):

- gamma (comparison) vectors: per-field agreement levels, computed with
  built-in JVM expressions (``levenshtein(l, r, k)`` bounded, equality) —
  whole-stage codegen, no Python in the data path;
- pattern counts: ONE groupBy over the gamma columns. Partial (map-side)
  aggregation means the shuffle carries at most
  ``prod(levels) * partitions`` rows — for 3 fields here, <= 12 rows per
  partition regardless of corpus size. This is the property that makes
  EM viable at 10^12 candidate pairs: the data-scale work is a single
  combine-style aggregation, and everything after it is O(#patterns);
- EM: driver-side fixed-point over the collected pattern-count table
  (<= prod(levels) rows). Each iteration's parameters are quantized to
  the 1e-9 grid with ``floor(x*1e9 + 0.5)/1e9`` — floor/multiply/divide
  are exactly-rounded IEEE ops, so any engine (or SQL twin) repeating the
  same formulas reproduces the parameters bit-for-bit regardless of its
  internal summation order (drift ~1e-16 per iteration is re-absorbed by
  the grid each round);
- match weights: log2(m/u) per agreement level, summed across fields
  (FS "agreement/disagreement weights"); classification by threshold;
- clusters: matched pairs feed the existing connected-components
  operator (operators/cluster.py) unchanged.

Scale notes (100 TB): candidate generation is an equi-join on the
blocking key (hash-partitioned, AQE-skew-handled like every blocked join
in this engine); gamma + weight evaluation is pure codegen projection;
the only new aggregation is the <= prod(levels)-row pattern count; EM
cost is independent of data size. Nothing here materializes more than
the candidate-pair set the blocking scheme already implies.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "FieldSpec", "block_candidate_pairs", "comparison_vectors",
    "pattern_counts", "em_fit", "fs_em_params", "match_weight_expr",
    "em_weights_milli", "score_pairs", "tf_adjusted_weights", "fs_link",
]

EPS = 1e-6
_GRID = 1e9


def _quant_clamp(x: float) -> float:
    """Clamp to [EPS, 1-EPS] then snap to the 1e-9 grid.

    Mirrors the SQL twin's
    ``floor(least(greatest(x, 0.000001), 0.999999) * 1000000000 + 0.5)
    / 1000000000`` exactly (same IEEE double ops in the same order).
    """
    x = min(max(x, EPS), 1.0 - EPS)
    return math.floor(x * _GRID + 0.5) / _GRID


@dataclass(frozen=True)
class FieldSpec:
    """One comparison field: gamma column name, number of agreement
    levels (level 0 = strongest agreement), and the CASE expression (SQL
    string over the suffixed pair columns) that assigns the level.

    ``null_expr`` / ``null_level`` (optional, set together): FS practice
    (Fellegi-Sunter's "comparison not possible"; Splink's null handling)
    treats a MISSING observation as its own agreement level, not as
    disagreement — a pair that cannot be compared on a field carries no
    evidence either way on it. When ``null_expr`` (a SQL boolean over the
    suffixed pair columns, e.g. ``phone_l IS NULL OR phone_r IS NULL``)
    is set, ``comparison_vectors`` assigns ``null_level`` BEFORE
    evaluating ``expr`` (whose bare equality would otherwise leak nulls
    into the ELSE/disagreement branch), ``levels`` counts the missing
    level, EM estimates its m/u like any level (missingness independent
    of match status converges to m ~= u, i.e. log2(m/u) ~= 0), and the
    clerical weight convention gives it weight 0."""
    gamma: str
    levels: int
    expr: str
    null_expr: str | None = None
    null_level: int | None = None

    def __post_init__(self):
        if (self.null_expr is None) != (self.null_level is None):
            raise ValueError("null_expr and null_level must be set together")
        if self.null_level is not None and not (
                0 <= self.null_level < self.levels):
            raise ValueError("null_level must be a valid level index")


def transcript_field_specs() -> list[FieldSpec]:
    """The canonical 3-field comparison for the linkage-record corpus:
    name at exact / d<=2 / disagree, city exact, phone exact / disagree /
    missing (the corpus plants NULL phones on ``i % 11 == 0`` variants)."""
    return [
        FieldSpec("g_name", 3,
                  "CASE WHEN name_l = name_r THEN 0 "
                  "WHEN levenshtein(name_l, name_r) <= 2 THEN 1 "
                  "ELSE 2 END"),
        FieldSpec("g_city", 2, "CASE WHEN city_l = city_r THEN 0 ELSE 1 END"),
        FieldSpec("g_phone", 3,
                  "CASE WHEN phone_l = phone_r THEN 0 ELSE 1 END",
                  null_expr="phone_l IS NULL OR phone_r IS NULL",
                  null_level=2),
    ]


def block_candidate_pairs(
    records: DataFrame,
    *,
    block_col: str = "block",
    id_col: str = "rec_id",
    payload_cols: tuple[str, ...] = ("name", "city", "phone"),
    extra_cols: tuple[str, ...] = (),
    blocks: list[str] | None = None,
) -> DataFrame:
    """All candidate record pairs (id_l < id_r), columns suffixed _l/_r.

    Single-rule form (default): one hash-partitioned self-equi-join on
    ``block_col`` — the north rule's "candidate pairs at a fixed
    blocking key". The key column rides along in the output.

    Multi-rule form: ``blocks`` is a list of SQL key expressions over the
    record columns (Splink-style blocking-rule union; the reference's
    multiple-backend-over-one-term-set idea). Candidates are the UNION of
    each rule's intra-key pairs, deduplicated on the id pair before any
    gamma/scoring work — a pair found by several rules is compared once.
    Rows whose key expression is NULL generate no pairs under that rule
    (standard FS practice: an unobserved blocking key blocks nothing;
    this also mirrors the equi-join's own null-rejecting semantics while
    keeping null rows out of the shuffle entirely).

    Scale shape: one self-equi-join per rule on its key (each
    hash-partitioned, AQE-skew-handled, runtime-bloom-eligible like every
    blocked join in this engine), then ONE dropDuplicates shuffle keyed on
    the id pair — the same cardinality the scorer consumes, and the price
    of not scoring cross-rule duplicates twice. Nothing materializes
    beyond the candidate set the union of rules already implies."""
    if blocks is None:
        keep = [id_col, block_col, *payload_cols, *extra_cols]
        left = records.select(
            [F.col(c).alias(c if c == block_col else f"{c}_l") for c in keep])
        right = records.select(
            [F.col(c).alias(c if c == block_col else f"{c}_r") for c in keep])
        return (
            left.join(right, block_col)
            .where(F.col(f"{id_col}_l") < F.col(f"{id_col}_r"))
        )
    if not blocks:
        raise ValueError("blocks must be a non-empty list of key exprs")
    keep = [id_col, *payload_cols, *extra_cols]
    out = None
    for rule in blocks:
        keyed = (records
                 .withColumn("_bk", F.expr(rule))
                 .where(F.col("_bk").isNotNull()))
        left = keyed.select(
            "_bk", *[F.col(c).alias(f"{c}_l") for c in keep])
        right = keyed.select(
            "_bk", *[F.col(c).alias(f"{c}_r") for c in keep])
        p = (left.join(right, "_bk")
             .where(F.col(f"{id_col}_l") < F.col(f"{id_col}_r"))
             .drop("_bk"))
        out = p if out is None else out.unionByName(p)
    if len(blocks) > 1:
        out = out.dropDuplicates([f"{id_col}_l", f"{id_col}_r"])
    return out


def comparison_vectors(pairs: DataFrame,
                       specs: list[FieldSpec]) -> DataFrame:
    """Attach one integer gamma column per field (codegen CASE exprs).
    Fields with a declared missing level test ``null_expr`` FIRST, so a
    null observation lands on its own level instead of leaking into the
    base expression's ELSE/disagreement branch."""
    out = pairs
    for s in specs:
        expr = s.expr
        if s.null_expr is not None:
            expr = (f"CASE WHEN {s.null_expr} THEN {s.null_level} "
                    f"ELSE ({s.expr}) END")
        out = out.withColumn(s.gamma, F.expr(expr).cast("int"))
    return out


def pattern_counts(gammas: DataFrame, specs: list[FieldSpec]) -> DataFrame:
    """groupBy over the gamma columns -> (gammas..., c double).

    Map-side partial aggregation bounds the shuffle at prod(levels) rows
    per input partition; the result has at most prod(levels) rows total.
    """
    cols = [s.gamma for s in specs]
    return (gammas.groupBy(*cols)
            .agg(F.count(F.lit(1)).cast("double").alias("c")))


def default_init(specs: list[FieldSpec]) -> tuple[float, dict, dict]:
    """Fixed deterministic EM starting point (shared with the SQL twin):
    lambda = 0.5; m mass concentrated on agreement, u on disagreement.
    Fields with a declared missing level start it at equal small mass in
    m AND u (an uninformative prior — missingness initially carries no
    match evidence; EM moves it from the data)."""
    inits3 = ((0.6, 0.3, 0.1), (0.1, 0.2, 0.7))
    inits2 = ((0.9, 0.1), (0.2, 0.8))
    inits_null3 = ((0.7, 0.2, 0.1), (0.15, 0.75, 0.1))
    m, u = {}, {}
    for s in specs:
        if s.null_level is not None:
            if s.levels != 3 or s.null_level != 2:
                raise ValueError("default_init supports missing levels "
                                 "only as level 2 of a 3-level field")
            pick = inits_null3
        elif s.levels == 3:
            pick = inits3
        elif s.levels == 2:
            pick = inits2
        else:
            raise ValueError("default_init supports 2- or 3-level fields")
        m[s.gamma] = list(pick[0])
        u[s.gamma] = list(pick[1])
    return 0.5, m, u


def em_fit(
    patterns: list[tuple[tuple[int, ...], float]],
    specs: list[FieldSpec],
    *,
    n_iter: int = 20,
) -> tuple[float, dict, dict]:
    """Fixed-iteration EM over (gamma-tuple, count) rows (pure Python,
    O(#patterns * n_iter); runs on the driver).

    Per iteration: E-step w_p = lam*prod(m)/ (lam*prod(m) +
    (1-lam)*prod(u)); M-step lam' = sum(w c)/sum(c), m_f[l]' =
    sum_{gamma_f=l} w c / sum(w c), u_f[l]' analogous with (1-w);
    every updated parameter is clamp+grid-quantized (_quant_clamp).
    """
    lam, m, u = default_init(specs)
    rows = sorted(patterns)
    for _ in range(n_iter):
        ws = []
        for g, c in rows:
            pm = lam
            pu = 1.0 - lam
            for k, s in enumerate(specs):
                pm = pm * m[s.gamma][g[k]]
                pu = pu * u[s.gamma][g[k]]
            ws.append(pm / (pm + pu))
        total = 0.0
        wsum = 0.0
        vsum = 0.0
        for (g, c), w in zip(rows, ws):
            total += c
            wsum += w * c
            vsum += (1.0 - w) * c
        new_m = {}
        new_u = {}
        for k, s in enumerate(specs):
            new_m[s.gamma] = []
            new_u[s.gamma] = []
            for lvl in range(s.levels):
                ml = sum(w * c for (g, c), w in zip(rows, ws)
                         if g[k] == lvl)
                ul = sum((1.0 - w) * c for (g, c), w in zip(rows, ws)
                         if g[k] == lvl)
                new_m[s.gamma].append(_quant_clamp(ml / wsum))
                new_u[s.gamma].append(_quant_clamp(ul / vsum))
        lam = _quant_clamp(wsum / total)
        m, u = new_m, new_u
    return lam, m, u


def fs_em_params(
    spark: SparkSession,
    gammas: DataFrame,
    specs: list[FieldSpec],
    *,
    n_iter: int = 20,
) -> DataFrame:
    """EM-estimated parameters as a DataFrame
    (field, level, m_milli, u_milli) plus a ('lambda', -1, lam_milli, -1)
    row (-1 integer sentinels keep the output hash-stable)."""
    pat = pattern_counts(gammas, specs).collect()
    rows = [(tuple(r[s.gamma] for s in specs), float(r["c"])) for r in pat]
    lam, m, u = em_fit(rows, specs, n_iter=n_iter)

    def milli(x: float) -> int:
        return int(math.floor(x * 1000 + 0.5))

    out = [("lambda", -1, milli(lam), -1)]
    for s in specs:
        field = s.gamma.removeprefix("g_")
        for lvl in range(s.levels):
            out.append((field, lvl, milli(m[s.gamma][lvl]),
                        milli(u[s.gamma][lvl])))
    return spark.createDataFrame(
        out, "field string, level int, m_milli long, u_milli long")


def match_weight_expr(specs: list[FieldSpec],
                      weights: dict[str, list[int]],
                      *, scale: int = 1000) -> str:
    """Integer milli match-weight SQL expression: ``scale`` * sum over
    fields of the per-level weight. With the clerical defaults the
    weights are whole log2(m/u) units (callers pick m/u with
    power-of-two ratios) and scale=1000 lifts them to milli; EM-derived
    weights arrive already in milli (``em_weights_milli``) and use
    scale=1. Either way the whole score is integer arithmetic
    (hash-stable in any engine)."""
    terms = []
    for s in specs:
        cases = " ".join(
            f"WHEN {lvl} THEN {weights[s.gamma][lvl]}"
            for lvl in range(s.levels - 1))
        terms.append(f"(CASE {s.gamma} {cases} "
                     f"ELSE {weights[s.gamma][s.levels - 1]} END)")
    return f"cast({scale} * (" + " + ".join(terms) + ") as long)"


def em_weights_milli(m: dict, u: dict,
                     specs: list[FieldSpec]) -> dict[str, list[int]]:
    """Integer-milli log2(m/u) match weights from EM-estimated
    parameters (the unsupervised replacement for clerical weights):
    w_field[level] = round(1000 * log2(m_level / u_level)). Parameters
    come pre-clamped to [1e-6, 1-1e-6] by em_fit, so the log is always
    finite; bounds are ±~19931 milli."""
    return {
        s.gamma: [
            int(math.floor(
                1000.0 * math.log2(m[s.gamma][lvl] / u[s.gamma][lvl])
                + 0.5))
            for lvl in range(s.levels)]
        for s in specs}


# Clerical weights for transcript_field_specs: log2(m/u) per level with
# power-of-two ratios. Chosen so the worst true-match pattern
# (name d<=2, city+phone both corrupted: 7-2-4 = +1) still outscores the
# best non-match pattern (name disagree, city+phone coincidentally equal:
# -8+2+3 = -3) — threshold 0 separates perfectly on the planted corpus.
# The phone MISSING level (null on either side) carries weight 0: no
# evidence either way (worst true match with a missing phone: 7-2+0 = +5;
# best non-match with one: -8+2+0 = -6 — separation preserved).
DEFAULT_WEIGHTS: dict[str, list[int]] = {
    "g_name": [8, 7, -8],
    "g_city": [2, -2],
    "g_phone": [3, -4, 0],
}


def score_pairs(
    gammas: DataFrame,
    specs: list[FieldSpec],
    *,
    weights: dict[str, list[int]] | None = None,
    threshold_milli: int = 0,
    scale: int = 1000,
) -> DataFrame:
    """Attach weight_milli (long) and is_match (long 0/1). ``scale``
    follows match_weight_expr: 1000 for whole-log2 clerical weights,
    1 for already-milli EM weights."""
    w = DEFAULT_WEIGHTS if weights is None else weights
    return (gammas
            .withColumn("weight_milli",
                        F.expr(match_weight_expr(specs, w, scale=scale)))
            .withColumn("is_match",
                        (F.col("weight_milli") >= F.lit(threshold_milli))
                        .cast("long")))


def tf_adjusted_weights(
    gammas: DataFrame,
    records: DataFrame,
    *,
    field: str = "city",
    gamma_col: str = "g_city",
    base_weights: dict[str, list[int]] | None = None,
    specs: list[FieldSpec] | None = None,
) -> DataFrame:
    """Term-frequency adjustment for one exact-agreement field (the
    Splink ``tf_adjustments`` idea): agreement on a RARE value is
    stronger evidence than agreement on a common one, because the
    u-probability of coincidental agreement on value v is
    freq(v)^2 / sum_w freq(w)^2 — the within-agreement share of v —
    not the field-average u the base weight assumes.

    Adds ``tf_adj_milli`` (double): the per-pair correction
    1000 * log2(u_field / u_v) applied ONLY on agreeing pairs
    (gamma = 0); 0 elsewhere. ``weight_tf_milli`` = base integer weight
    + correction.

    Scale shape: one groupBy over the records' field values (bounded by
    the value vocabulary) -> broadcast join against the pairs on the
    shared agreeing value. No extra shuffle of the pair table.
    """
    from pyspark.sql.functions import broadcast

    specs = specs or transcript_field_specs()
    w = base_weights or DEFAULT_WEIGHTS
    freqs = (records.groupBy(F.col(field).alias("tf_value"))
             .agg(F.count(F.lit(1)).cast("double").alias("tf_n")))
    # u_v = n_v^2 / sum(n^2); u_field = field-average agreement prob =
    # sum(n^2) / N^2  (both from the same bounded aggregate)
    tot = freqs.agg(
        F.sum("tf_n").alias("tf_total"),
        F.sum(F.col("tf_n") * F.col("tf_n")).alias("tf_sq"))
    uv = (freqs.crossJoin(broadcast(tot))
          .select("tf_value",
                  ((F.col("tf_n") * F.col("tf_n")) / F.col("tf_sq"))
                  .alias("u_v"),
                  (F.col("tf_sq") / (F.col("tf_total") * F.col("tf_total")))
                  .alias("u_field")))
    scored = gammas if "weight_milli" in gammas.columns else score_pairs(
        gammas, specs, weights=w)
    joined = scored.join(
        broadcast(uv),
        (F.col(gamma_col) == 0) & (F.col(f"{field}_l") == F.col("tf_value")),
        "left")
    return (joined
            .withColumn(
                "tf_adj_milli",
                F.when(F.col("u_v").isNotNull(),
                       1000.0 * F.log2(F.col("u_field") / F.col("u_v")))
                .otherwise(F.lit(0.0)))
            .withColumn("weight_tf_milli",
                        F.col("weight_milli") + F.col("tf_adj_milli"))
            .drop("tf_value", "u_v", "u_field"))


def fs_link(
    records: DataFrame,
    *,
    specs: list[FieldSpec] | None = None,
    weights: dict[str, list[int]] | None = None,
    threshold_milli: int = 0,
    em: bool = False,
    em_iters: int = 20,
    blocks: list[str] | None = None,
) -> DataFrame:
    """End-to-end FS linkage over (rec_id, block, name, city, phone[,
    entity]) records: blocked pairs -> gammas -> weights -> threshold ->
    connected components. Returns (rec_id, entity_id) for every record
    (unmatched records label themselves).

    ``blocks``: optional list of blocking-rule key expressions — the
    multi-rule union of ``block_candidate_pairs(blocks=...)``; default is
    the single ``block`` column.

    ``em=True`` replaces the clerical ``weights`` with unsupervised
    EM-estimated milli weights (pattern_counts -> em_fit ->
    em_weights_milli): one extra bounded aggregation pass over the
    gamma table, O(#patterns * em_iters) driver work — the full
    Fellegi-Sunter loop with no labeled data."""
    from liblevenshtein_rust_spark.operators.cluster import (
        connected_components)
    specs = specs or transcript_field_specs()
    pairs = block_candidate_pairs(records, blocks=blocks)
    gv = comparison_vectors(pairs, specs)
    scale = 1000
    if em:
        pat = pattern_counts(gv, specs).collect()
        rows = [(tuple(r[s.gamma] for s in specs), float(r["c"]))
                for r in pat]
        _lam, m, u = em_fit(rows, specs, n_iter=em_iters)
        weights = em_weights_milli(m, u, specs)
        scale = 1
    scored = score_pairs(gv, specs, weights=weights,
                         threshold_milli=threshold_milli, scale=scale)
    edges = scored.where("is_match = 1").select(
        F.col("rec_id_l").alias("id_a"), F.col("rec_id_r").alias("id_b"))
    nodes = records.select(F.col("rec_id").alias("term_id"))
    return (connected_components(edges, nodes)
            .select(F.col("term_id").alias("rec_id"), "entity_id"))
