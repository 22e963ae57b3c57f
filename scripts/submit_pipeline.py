#!/usr/bin/env python
"""spark-submit job file for the linkage pipeline.

The north rule requires the pipeline to run via ``spark-submit
--py-files`` on a multi-executor cluster. This is that entry point: the
package ships as a zip on the executors' PYTHONPATH and the driver logic
is exactly the CLI's ``pipeline`` subcommand (same flags), so local runs
(``python -m liblevenshtein_rust_spark.cli pipeline ...``) and cluster
submits share one code path:

    zip -r /tmp/lls.zip liblevenshtein_rust_spark
    spark-submit --master <cluster> --py-files /tmp/lls.zip \
        scripts/submit_pipeline.py \
        --input <turns.parquet> --checkpoint-dir <dir> --run-id r1 \
        --max-distance 2 --variant transposition

Exercised end-to-end (real spark-submit subprocess, zip-only import) by
tests/test_spark_submit.py.
"""

import sys

from liblevenshtein_rust_spark.cli import main

if __name__ == "__main__":
    sys.exit(main(["pipeline", *sys.argv[1:]]))
