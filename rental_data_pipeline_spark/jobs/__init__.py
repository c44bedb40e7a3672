from rental_data_pipeline_spark.jobs.pipeline import (  # noqa: F401
    PipelineConfig,
    SearchConfig,
    construct_search_url,
    run_pipeline,
)
