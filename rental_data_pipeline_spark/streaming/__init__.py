from rental_data_pipeline_spark.streaming.incremental import (  # noqa: F401
    incremental_merge_stream,
    read_snapshot_stream,
    read_state,
    windowed_price_stats,
    windowed_price_stats_stream_exact,
)
