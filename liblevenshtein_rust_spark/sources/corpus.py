"""Corpus sources & recall validation.

Ports the reference's corpus tooling semantics
(/root/reference/src/corpus/mod.rs:32-57, parser.rs):

- plain-text word lists (one term per line — big.txt-style dictionaries;
  the CLI's ``--dict /usr/share/dict/words`` source, README.md:485)
- Mitton ``.dat`` error corpora: ``$correct`` header lines followed by
  ``misspelling freq`` lines (Birkbeck/Holbrook/Aspell/Wikipedia format)
- recall@d validation (tests/corpus_validation.rs:38-86 ValidationStats):
  fraction of misspellings whose correct word is found within distance d.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from liblevenshtein_rust_spark.functions.canonicalize import term_id
from liblevenshtein_rust_spark.operators.fuzzy_join import fuzzy_join


def load_wordlist(spark: SparkSession, path: str) -> DataFrame:
    """Newline-delimited term file -> dictionary DataFrame
    (term_id, term). Distributed read (spark.read.text)."""
    df = spark.read.text(path).select(F.trim(F.col("value")).alias("term"))
    df = df.where(F.length("term") > 0).distinct()
    return df.select(term_id("term").alias("term_id"), "term")


def load_bigtxt(spark: SparkSession, path: str) -> DataFrame:
    """big.txt-style word-frequency corpus -> (term, freq).

    The reference's ``BigTxtCorpus::load``
    (/root/reference/src/corpus/parser.rs:37): one token per line,
    trimmed + lowercased, frequencies preserved (duplicate lines count).
    Distributed read + hash aggregate; ``total_tokens`` is
    ``sum(freq)`` and ``unique_words`` is ``count(*)`` downstream.
    """
    return (
        spark.read.text(path)
        .select(F.lower(F.trim(F.col("value"))).alias("term"))
        .where(F.length("term") > 0)
        .groupBy("term").agg(F.count(F.lit(1)).alias("freq"))
    )


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Running text -> (term, freq) word-frequency dictionary — the
    big.txt extraction convention (Norvig's ``words()``: all ``[a-z]+``
    runs of the lowercased text). The running-text generalization of
    ``load_bigtxt`` for corpora that are not pre-tokenized one-per-line."""
    return (
        df.select(F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)")).alias("term"))
        .groupBy("term").agg(F.count(F.lit(1)).alias("freq"))
    )


#: the reference's 123,985-word English dictionary — the corpus its own
#: published recall targets are validated on
#: (/root/reference/tests/corpus_validation.rs:22-28, runner :127-150;
#: dictionary file data/english_words.txt)
EN_WORDS_PATH = "/root/reference/data/english_words.txt"


def planted_error_corpus(words: DataFrame, text_col: str = "term") -> DataFrame:
    """Deterministic Mitton-style error corpus planted over a dictionary:
    (correct, misspelling) pairs with 1..3 edits per word.

    The reference validates recall on Mitton ``.dat`` corpora (Holbrook
    86.6% @ d<=2, 100% @ d<=3, tests/corpus_validation.rs:22-28); those
    files are download-only and absent, so this is the seeded stand-in at
    the same dictionary scale. Unlike the RNG typo generator
    (sources/transcripts.py), every choice here is CHARACTER ARITHMETIC —
    word selection, edit count, and edit positions all derive from
    (length, first char, last char) — so an ANSI-SQL twin regenerates the
    identical corpus bit-for-bit and the driver can oracle the recall
    numbers (the RNG path could never be replayed in SQL).

    Edits per word (nerr+1 of them, so distance <= 3 always; >= 1 since
    every chain starts with a deletion): a char deletion at p1, then for
    nerr >= 1 a substitution at p2 (to 'q', or 'z' if already 'q' — never
    a no-op), then for nerr = 2 a leading-char deletion. Selection keeps
    4..12-char pure-alpha words (DuckDB's levenshtein is byte-level;
    non-ASCII words would diverge from our codepoint-level kernel) with
    sel % 61 == 0 — ~1.3% of the 124k dictionary, ~1.6k pairs.
    """
    return (
        words.select(F.col(text_col).alias("w")).distinct()
        .where(F.expr("length(w) BETWEEN 4 AND 12 AND w rlike '^[A-Za-z]+$'"))
        .withColumn("L", F.length("w"))
        .withColumn("sel", F.expr(
            "ascii(substr(w,1,1))*31 + length(w)*7 "
            "+ ascii(substr(w,length(w),1))"))
        .where(F.expr("sel % 61 = 0"))
        .withColumn("nerr", F.expr("(sel div 61) % 3"))
        .withColumn("p1", F.expr("(L*7 + ascii(substr(w,1,1))) % L + 1"))
        .withColumn("m1", F.expr("substr(w,1,p1-1) || substr(w,p1+1)"))
        .withColumn("p2", F.expr("(ascii(substr(w,L,1))*5) % (L-1) + 1"))
        .withColumn("m2", F.expr(
            "substr(m1,1,p2-1) || (CASE WHEN substr(m1,p2,1) = 'q' "
            "THEN 'z' ELSE 'q' END) || substr(m1,p2+1)"))
        .select(
            F.col("w").alias("correct"),
            F.expr("CASE nerr WHEN 0 THEN m1 WHEN 1 THEN m2 "
                   "ELSE substr(m2,2) END").alias("misspelling"))
    )


def parse_mitton(lines: list[str]) -> list[tuple[str, str, int]]:
    """Mitton .dat format -> (correct, misspelling, frequency) rows.

    Format (corpus/mod.rs:45-57): lines starting with '$' set the current
    correct word; following lines are "misspelling [freq]". Stateful
    line-order parse — corpora are small fixture files, so this runs
    driver-side; the result becomes a distributed DataFrame.
    """
    rows: list[tuple[str, str, int]] = []
    current = None
    for raw in lines:
        line = raw.strip()
        if not line:
            continue
        if line.startswith("$"):
            current = line[1:].strip()
            continue
        if current is None:
            continue
        parts = line.split()
        miss = parts[0]
        freq = int(parts[1]) if len(parts) > 1 and parts[1].isdigit() else 1
        rows.append((current, miss, freq))
    return rows


def mitton_corpus_df(spark: SparkSession, lines: list[str]) -> DataFrame:
    return spark.createDataFrame(
        parse_mitton(lines), ["correct", "misspelling", "frequency"])


def recall_at_d(corpus: DataFrame, dictionary: DataFrame, max_d: int,
                variant: str = "standard", method: str = "deletion",
                persist: bool = False) -> DataFrame:
    """ValidationStats analog: for each distance d in 0..max_d, the
    fraction of misspellings whose correct word is returned by a fuzzy
    query at that threshold. Returns (d, found, total, recall_milli) with
    integer recall in milli-units (float-free). ``persist`` forwards to
    the fuzzy join — set it when the dictionary is a live derivation
    (e.g. the 124k-word file read + distinct), which the join otherwise
    re-runs for each of its two reads."""
    queries = corpus.select(
        F.col("misspelling").alias("q_id"),
        F.col("misspelling").alias("q_text"),
        "correct",
    ).dropDuplicates(["q_id", "correct"])
    matches = fuzzy_join(
        queries.select("q_id", "q_text").dropDuplicates(["q_id"]),
        dictionary, n=max_d, variant=variant, method=method, persist=persist)
    hits = queries.join(
        matches.select(F.col("q_id"), F.col("term"), F.col("distance")),
        (queries["q_id"] == matches["q_id"]) & (queries["correct"] == matches["term"]),
        "left",
    ).select(queries["q_id"], "correct", "distance")
    # one row per (misspelling, correct) pair even when the dictionary
    # carries the same term text under several term_ids — duplicate hit
    # rows would inflate both found and total
    hits = hits.groupBy("q_id", "correct").agg(F.min("distance").alias("distance"))
    # single aggregation over an exploded threshold grid — ONE Spark job
    # for all max_d+1 thresholds (each (misspelling, correct) pair emits a
    # row per d; found counts pairs whose match distance is <= d)
    grid = hits.select(
        F.explode(F.sequence(F.lit(0), F.lit(int(max_d)))).alias("d"),
        "distance",
    )
    return (
        grid.groupBy("d")
        .agg(
            F.sum(F.when(F.col("distance") <= F.col("d"), 1).otherwise(0)).alias("found"),
            F.count(F.lit(1)).alias("total"),
        )
        .select(
            F.col("d").cast("long").alias("d"),
            F.col("found").cast("long").alias("found"),
            "total",
            F.round(F.lit(1000.0) * F.col("found") / F.greatest(F.col("total"), F.lit(1)))
            .cast("long").alias("recall_milli"),
        )
    )


def synthetic_entity_mentions(spark: SparkSession, n_entities: int) -> DataFrame:
    """Deterministic labeled record-linkage corpus: (mention_id, text, entity).

    The north-rule metric is pairwise F1 on labeled pairs at a fixed
    blocking key. Natural vocabularies cannot carry a clean label oracle
    (real words sit within d<=1 of each other, so "truth" and "what a
    d<=1 closure computes" diverge for reasons unrelated to engine
    correctness). This corpus makes the labels provable: each entity is a
    3-digit base-26 code with every digit written as a 6-char run
    (18 chars), so DISTINCT entity codes differ in at least one whole run
    and sit at Levenshtein distance >= 6 from each other. Planted
    mentions stay within 2 edits of their code, hence cross-entity
    mention distance >= 2 > 1: a d<=1 transitive closure that is exactly
    correct scores F1 = 1.000, and ANY deviation (blocking recall miss,
    verify false-positive, clustering bug) moves the metric.

    Per entity i (all positions are index arithmetic — an ANSI-SQL twin
    regenerates the corpus bit-for-bit, same pattern as
    ``planted_error_corpus``):

    - ``#0`` the code itself, and ``#1`` a 1-char deletion at p1 —
      always (so every entity has a true pair to recall);
    - ``#2`` a 1-char substitution at p2 — every 3rd entity;
    - ``#d`` a DECOY at exactly d=2 (substitutions at q1 and q2),
      labeled as its own singleton entity — every 5th entity. Linking a
      decoy is a precision bug; missing a variant is a recall bug.

    The four edit positions are pairwise distinct (offsets 0/5/9/14 mod
    18), and substitutions write the digit ``'1'`` — a character that can
    never appear in a letter-run code. A letter substitution can blend
    into an adjacent run (e.g. 'o'->'q' beside a q-run extends the run,
    which put a decoy at d=1 from the deletion variant on the first build
    of this corpus); a digit cannot, so no mention collides with or sits
    d<=1 from another mention except the planted #0<->#1/#2 pairs.
    """
    if n_entities < 1:
        raise ValueError("n_entities must be >= 1")
    base = (
        spark.range(int(n_entities)).select(F.col("id").cast("int").alias("i"))
        .withColumn("code", F.expr(
            "repeat(char(97 + (i div 676) % 26), 6) || "
            "repeat(char(97 + (i div 26) % 26), 6) || "
            "repeat(char(97 + i % 26), 6)"))
        .withColumn("p1", F.expr("i % 18 + 1"))
        .withColumn("p2", F.expr("(i + 5) % 18 + 1"))
        .withColumn("q1", F.expr("(i + 9) % 18 + 1"))
        .withColumn("q2", F.expr("(i + 14) % 18 + 1"))
    )
    sub = "substr({s},1,{p}-1) || '1' || substr({s},{p}+1)"
    m0 = base.select(F.expr("code || '#0'").alias("mention_id"),
                     F.col("code").alias("text"),
                     F.col("code").alias("entity"))
    m1 = base.select(F.expr("code || '#1'").alias("mention_id"),
                     F.expr("substr(code,1,p1-1) || substr(code,p1+1)")
                     .alias("text"),
                     F.col("code").alias("entity"))
    m2 = base.where("i % 3 = 0").select(
        F.expr("code || '#2'").alias("mention_id"),
        F.expr(sub.format(s="code", p="p2")).alias("text"),
        F.col("code").alias("entity"))
    decoy = (base.where("i % 5 = 0")
             .withColumn("s1", F.expr(sub.format(s="code", p="q1")))
             .select(F.expr("code || '#d'").alias("mention_id"),
                     F.expr(sub.format(s="s1", p="q2")).alias("text"),
                     F.expr("code || '!'").alias("entity")))
    return m0.unionByName(m1).unionByName(m2).unionByName(decoy)


def synthetic_linkage_records(spark: SparkSession, n_entities: int) -> DataFrame:
    """Deterministic multi-field record-linkage corpus for Fellegi-Sunter
    scoring: (rec_id, block, name, city, phone, entity).

    Two records per entity — ``#0`` pristine and ``#1`` with per-field
    corruptions planted by index arithmetic (an ANSI-SQL twin regenerates
    the corpus bit-for-bit, same discipline as
    ``synthetic_entity_mentions``):

    - ``name``: the 18-char three-run base-26 code (distinct entities sit
      at Levenshtein distance >= 6); ``#1`` drops one char when
      ``i % 2 = 0``.
    - ``city``: one of 8 pool values ``c0..c7`` chosen by ``(i*7) % 8``;
      ``#1`` is moved to a different pool value when ``i % 7 = 0`` —
      so matches agree ~6/7 of the time while non-matches agree ~1/8
      (the m/u separation EM has to find).
    - ``phone``: 10 digits of ``(i*2654435761 + 99991) % 1e10``; ``#1``
      bumps one digit (mod 10, so it always changes) when ``i % 3 = 0``,
      and is NULL (an unobserved phone — exercising the FS missing
      gamma level, FieldSpec.null_level) when ``i % 11 = 0``; the null
      takes precedence over the digit bump.
    - ``block``: ``i div 5`` — the fixed blocking key of the north rule;
      candidate pairs are generated within blocks only, giving every
      block 45 record pairs of which 5 are true matches.

    The corruption residues (2, 3, 7, 11) are pairwise coprime so every
    agreement-pattern combination occurs — including the phone MISSING
    patterns — exercising all comparison vectors EM iterates over.
    """
    if n_entities < 1:
        raise ValueError("n_entities must be >= 1")
    base = (
        spark.range(int(n_entities)).select(F.col("id").alias("i"))
        .withColumn("code", F.expr(
            "repeat(char(97 + (i div 676) % 26), 6) || "
            "repeat(char(97 + (i div 26) % 26), 6) || "
            "repeat(char(97 + i % 26), 6)"))
        .withColumn("block", F.expr("cast(i div 5 as int)"))
        .withColumn("city0", F.expr("'c' || cast((i * 7) % 8 as string)"))
        .withColumn("cityc", F.expr("'c' || cast((i * 7 + 3) % 8 as string)"))
        .withColumn("phone0", F.expr(
            "lpad(cast((i * 2654435761 + 99991) % 10000000000 as string), "
            "10, '0')"))
        .withColumn("p1", F.expr("cast(i % 18 + 1 as int)"))
        .withColumn("pp", F.expr("cast(i % 10 + 1 as int)"))
    )
    r0 = base.select(
        F.expr("code || '#0'").alias("rec_id"), "block",
        F.col("code").alias("name"), F.col("city0").alias("city"),
        F.col("phone0").alias("phone"), F.col("code").alias("entity"))
    r1 = base.select(
        F.expr("code || '#1'").alias("rec_id"), "block",
        F.expr("CASE WHEN i % 2 = 0 THEN substr(code,1,p1-1) || "
               "substr(code,p1+1) ELSE code END").alias("name"),
        F.expr("CASE WHEN i % 7 = 0 THEN cityc ELSE city0 END").alias("city"),
        F.expr("CASE WHEN i % 11 = 0 THEN NULL "
               "WHEN i % 3 = 0 THEN substr(phone0,1,pp-1) || "
               "cast((cast(substr(phone0,pp,1) as int) + 1) % 10 as string) "
               "|| substr(phone0,pp+1) ELSE phone0 END").alias("phone"),
        F.col("code").alias("entity"))
    return r0.unionByName(r1)
