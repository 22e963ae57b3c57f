"""spark-submit entry point — the batch/ops path.

Mirrors the reference CLI's dispatch shape (clap parse -> command handler,
/root/reference/src/cli/commands.rs:28-110) as
``spark-submit --py-files pipeline.zip -m liblevenshtein_rust_spark.cli``
style stage dispatch:

    python -m liblevenshtein_rust_spark.cli pipeline \
        --input /path/turns.parquet --checkpoint-dir /ckpt --run-id r1 \
        --max-distance 2 --variant transposition

    python -m liblevenshtein_rust_spark.cli query \
        --dict /usr/share/dict/words --term test --max-distance 2

    python -m liblevenshtein_rust_spark.cli stream \
        --input /landing/turns --state-dir /state --max-distance 2
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="liblevenshtein-rust-spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    pp = sub.add_parser("pipeline", help="run the full linkage pipeline")
    pp.add_argument("--input", required=True, help="transcript parquet/Iceberg path")
    pp.add_argument("--checkpoint-dir", required=True)
    pp.add_argument("--run-id", default="run0")
    pp.add_argument("--max-distance", type=int, default=2)
    pp.add_argument("--variant", default="standard",
                    choices=["standard", "transposition", "merge_and_split"])
    pp.add_argument("--method", default="auto")
    pp.add_argument("--phonetic", action="store_true")
    pp.add_argument("--table-format", default="parquet")
    pp.add_argument("--bucket-by", type=int, default=None,
                    help="bucket keyed checkpoint stages for no-shuffle "
                         "downstream joins (bucket count)")

    qp = sub.add_parser("query", help="fuzzy query a term dictionary")
    qp.add_argument("--dict", required=True, help="newline-delimited term file")
    qp.add_argument("--term", required=True)
    qp.add_argument("--max-distance", type=int, default=2)
    qp.add_argument("--variant", default="standard")
    qp.add_argument("--limit", type=int, default=0)
    qp.add_argument("--prefix", action="store_true",
                    help="autocomplete mode: match term prefixes")
    qp.add_argument("--substring", action="store_true",
                    help="substring mode: match anywhere inside each line "
                         "(prints term\\tdistance\\tposition)")

    sp = sub.add_parser("stream", help="incremental linkage over a landing dir")
    sp.add_argument("--input", required=True)
    sp.add_argument("--state-dir", required=True)
    sp.add_argument("--max-distance", type=int, default=2)
    sp.add_argument("--variant", default="standard")

    ip = sub.add_parser("info", help="dictionary/corpus stats")
    ip.add_argument("--dict", required=True)

    args = p.parse_args(argv)

    from liblevenshtein_rust_spark.session import get_spark
    spark = get_spark("lls-cli")

    if args.cmd == "pipeline":
        from liblevenshtein_rust_spark.plans.pipeline import PipelineConfig, run_pipeline
        turns = spark.read.parquet(args.input)
        cfg = PipelineConfig(
            checkpoint_dir=args.checkpoint_dir, run_id=args.run_id,
            n=args.max_distance, variant=args.variant, method=args.method,
            phonetic=args.phonetic, table_format=args.table_format,
            bucket_by=args.bucket_by)
        res = run_pipeline(spark, turns, cfg)
        print(json.dumps({k: v for k, v in res["info"].items()}, default=str))
        return 0

    if args.cmd == "query":
        from liblevenshtein_rust_spark.operators.fuzzy_join import (
            fuzzy_join, fuzzy_prefix_join, fuzzy_top_k)
        from liblevenshtein_rust_spark.sources.corpus import load_wordlist
        d = load_wordlist(spark, args.dict)
        q = spark.createDataFrame([(args.term, args.term)], ["q_id", "q_text"])
        if args.substring:
            from pyspark.sql import functions as F
            from liblevenshtein_rust_spark.operators.substring import (
                fuzzy_substring_join)
            m = fuzzy_substring_join(
                q, d.select(F.col("term_id").alias("doc_id"),
                            F.col("term").alias("text")),
                n=args.max_distance, variant=args.variant,
                all_positions=True)
            m = m.join(d.select(F.col("term_id").alias("doc_id"), "term"),
                       "doc_id").orderBy("distance", "term", "pos")
            if args.limit:
                m = m.limit(args.limit)
            for r in m.collect():
                print(f"{r.term}\t{r.distance}\t{r.pos}")
            return 0
        if args.prefix:
            m = fuzzy_prefix_join(q, d, n=args.max_distance,
                                  variant=args.variant)
        else:
            m = fuzzy_join(q, d, n=args.max_distance, variant=args.variant)
        m = fuzzy_top_k(m, args.limit) if args.limit else \
            m.orderBy("distance", "term")
        for r in m.collect():
            print(f"{r.term}\t{r.distance}")
        return 0

    if args.cmd == "stream":
        from liblevenshtein_rust_spark.streaming.incremental import (
            run_incremental_stream)
        run_incremental_stream(spark, args.input, args.state_dir,
                               n=args.max_distance, variant=args.variant)
        return 0

    if args.cmd == "info":
        from liblevenshtein_rust_spark.sources.corpus import load_wordlist
        d = load_wordlist(spark, args.dict)
        print(json.dumps({"terms": d.count()}))
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())
