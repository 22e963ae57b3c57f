"""Transcript sources.

Two deterministic providers of the authoritative input shape
(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp):

1. ``derive_transcripts`` — a pure-SQL-expressible derivation from the
   driver's ``documents`` parquet table, planting near-duplicate turns via
   deterministic single-char deletions so fuzzy operators have non-trivial
   matches. The DuckDB-equivalent SQL lives in ``__spark_entry__.py`` so
   every downstream query is oracle-checkable.
2. ``synth_transcripts`` — a seeded generator with ground-truth entity
   labels (the analog of the reference's TypoGenerator,
   /root/reference/src/corpus/generator.rs:35-194: delete / insert /
   substitute / transpose edits), used for the pairwise-F1 gate and
   benchmarks. Driver-side numpy only at test scale; at real scale the
   input is an existing Iceberg table, not a generator.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

TRANSCRIPT_SCHEMA = StructType([
    StructField("conv_id", StringType()),
    StructField("turn_idx", IntegerType()),
    StructField("role", StringType()),
    StructField("text", StringType()),
    StructField("tool", StringType()),
    StructField("ts", TimestampType()),
])

#: planted-mutation parameters shared with the DuckDB oracle SQL
_MUT_MOD = 7
_MUT_BASE = 3
_EPOCH = 1700000000


def derive_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet -> transcript table with planted near-duplicates.

    Every doc becomes one turn; every even doc_id additionally yields a
    mutated copy (one char deleted at position (doc_id % 7) + 3) in another
    conversation — a deterministic distance-1 pair. Mirrored 1:1 by
    TRANSCRIPTS_SQL in __spark_entry__.py.
    """
    # r6: branches are built with selectExpr strings — the per-Column
    # py4j construction cost of this (widely shared) lineage was pure
    # driver latency (guide §4 boundary note; see dedup signature
    # builders). Expressions are 1:1 with the previous Column forms and
    # with TRANSCRIPTS_SQL in __spark_entry__.py.
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.lower(F.col("text")).alias("text"))
    orig = docs.selectExpr(
        "concat('conv_', cast(doc_id % 50 AS string)) AS conv_id",
        "cast(floor(doc_id / 50) * 2 AS int) AS turn_idx",
        "CASE WHEN doc_id % 4 = 0 THEN 'user' "
        "WHEN doc_id % 4 = 1 THEN 'assistant' "
        "WHEN doc_id % 4 = 2 THEN 'tool' ELSE 'system' END AS role",
        "text",
        "CASE WHEN doc_id % 4 = 2 THEN 'search' "
        "ELSE cast(NULL AS string) END AS tool",
        f"to_timestamp({_EPOCH} + doc_id) AS ts",
    )
    # mutation position p = doc_id % _MUT_MOD + _MUT_BASE, inlined below
    mutated = docs.where(F.col("doc_id") % 2 == 0).selectExpr(
        "concat('conv_', cast((doc_id + 17) % 50 AS string)) AS conv_id",
        "cast(floor(doc_id / 50) * 2 + 1 AS int) AS turn_idx",
        "'assistant' AS role",
        "concat(substring(text, 1, cast(doc_id % 7 + 3 as int) - 1), "
        "substring(text, cast(doc_id % 7 + 3 as int) + 1, length(text))) "
        "AS text",
        "cast(NULL AS string) AS tool",
        f"to_timestamp({_EPOCH + 1000000} + doc_id) AS ts",
    )
    # exact duplicates: every doc_id % 10 == 1 repeats verbatim in another
    # conversation (distance-0 pairs for exact-dup operators)
    dup = docs.where(F.col("doc_id") % 10 == 1).selectExpr(
        "concat('conv_', cast((doc_id + 29) % 50 AS string)) AS conv_id",
        "cast(floor(doc_id / 50) * 2 + 1 AS int) AS turn_idx",
        "'user' AS role",
        "text",
        "cast(NULL AS string) AS tool",
        f"to_timestamp({_EPOCH + 2000000} + doc_id) AS ts",
    )
    return orig.unionByName(mutated).unionByName(dup)


# ---------------------------------------------------------------------------
# seeded synthetic corpus with ground truth
# ---------------------------------------------------------------------------

_VOCAB = (
    "please run the tests again | can you summarize this document | what is the "
    "capital of france | the deployment failed with a timeout | let me check the "
    "logs for errors | here is the stack trace you asked for | thanks that fixed "
    "the issue | open a pull request with the change | the query returns too many "
    "rows | add an index on the user id column | retry the request with backoff | "
    "the cache hit rate dropped overnight | schedule the job for midnight utc | "
    "rotate the api keys before friday | the metrics dashboard shows a spike | "
    "merge the feature branch into main | unit tests pass but integration fails | "
    "profile the slow endpoint please | upgrade the cluster to the new version | "
    "el gato está en la mesa | 日本語のテキストです | café naïve résumé"
).split(" | ")

_ALPHABET = list("abcdefghijklmnopqrstuvwxyz")


def _apply_edit(rng: np.random.Generator, s: str) -> str:
    """One random edit: delete / insert / substitute / transpose —
    the reference TypoGenerator's four edit kinds."""
    if not s:
        return str(rng.choice(_ALPHABET))
    chars = list(s)
    kind = int(rng.integers(0, 4))
    if kind == 0:
        del chars[int(rng.integers(0, len(chars)))]
    elif kind == 1:
        chars.insert(int(rng.integers(0, len(chars) + 1)), str(rng.choice(_ALPHABET)))
    elif kind == 2:
        chars[int(rng.integers(0, len(chars)))] = str(rng.choice(_ALPHABET))
    else:
        if len(chars) >= 2:
            i = int(rng.integers(0, len(chars) - 1))
            chars[i], chars[i + 1] = chars[i + 1], chars[i]
    return "".join(chars)


def synth_transcripts(
    spark: SparkSession,
    n_turns: int = 1000,
    *,
    seed: int = 42,
    dup_frac: float = 0.5,
    max_edits: int = 2,
    n_convs: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Seeded corpus of turns, ``dup_frac`` of which are edited copies of
    earlier turns (0..max_edits random edits).

    Returns (transcripts_df, truth_df) where truth has
    (conv_id, turn_idx, entity_id, n_edits). Two turns share entity_id iff
    one was generated from the other's base utterance.
    """
    rng = np.random.default_rng(seed)
    n_convs = n_convs or max(4, n_turns // 25)
    rows, truth = [], []
    bases: list[tuple[str, str]] = []  # (entity_id, base text)
    roles = ["user", "assistant", "system", "tool"]
    for i in range(n_turns):
        conv = f"conv_{int(rng.integers(0, n_convs)):05d}"
        role = roles[int(rng.integers(0, 4))]
        if bases and rng.random() < dup_frac:
            eid, base = bases[int(rng.integers(0, len(bases)))]
            n_edits = int(rng.integers(0, max_edits + 1))
            text = base
            for _ in range(n_edits):
                text = _apply_edit(rng, text)
        else:
            # distinguish bases sharing a vocab sentence with a random
            # 8-char tag: pairwise distance between tags is ~8 w.h.p., far
            # beyond any threshold we cluster at, so distinct entities are
            # genuinely distinct utterances
            tag = "".join(str(rng.choice(_ALPHABET)) for _ in range(8))
            base = str(rng.choice(_VOCAB)) + " #" + tag
            eid = f"e{len(bases):05d}"
            bases.append((eid, base))
            text, n_edits = base, 0
        rows.append((conv, i, role, text,
                     "search" if role == "tool" else None,
                     pd.Timestamp(_EPOCH + i, unit="s")))
        truth.append((conv, i, eid, n_edits))
    tdf = spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]),
        schema=TRANSCRIPT_SCHEMA,
    )
    truth_df = spark.createDataFrame(
        pd.DataFrame(truth, columns=["conv_id", "turn_idx", "entity_id", "n_edits"]))
    return tdf, truth_df
