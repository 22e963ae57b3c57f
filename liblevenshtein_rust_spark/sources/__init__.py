from liblevenshtein_rust_spark.sources.transcripts import (  # noqa: F401
    TRANSCRIPT_SCHEMA,
    derive_transcripts,
    synth_transcripts,
)
