from liblevenshtein_rust_spark.plans.pipeline import PipelineConfig, run_pipeline  # noqa: F401
