from liblevenshtein_rust_spark.streaming.incremental import (  # noqa: F401
    incremental_upsert,
    run_incremental_stream,
)
