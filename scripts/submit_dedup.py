#!/usr/bin/env python
"""spark-submit job file for the document-dedup pipeline.

Same pattern as submit_pipeline.py: the driver logic is exactly the
CLI's ``dedup`` subcommand, so local runs and cluster submits share one
code path:

    zip -r /tmp/lls.zip liblevenshtein_rust_spark
    spark-submit --master <cluster> --py-files /tmp/lls.zip \
        scripts/submit_dedup.py \
        --input <docs.parquet> --output <survivors.parquet> \
        --method jaccard --threshold-milli 900 \
        --checkpoint-dir <dir> --run-id d1
"""

import sys

from liblevenshtein_rust_spark.cli import main

if __name__ == "__main__":
    sys.exit(main(["dedup", *sys.argv[1:]]))
