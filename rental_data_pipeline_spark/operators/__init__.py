from rental_data_pipeline_spark.operators.flatten import drop_temp_columns, flatten_listings
from rental_data_pipeline_spark.operators.normalize import normalize_listings
from rental_data_pipeline_spark.operators.merge import merge_listings, merge_snapshots

__all__ = [
    "drop_temp_columns",
    "flatten_listings",
    "merge_listings",
    "merge_snapshots",
    "normalize_listings",
]
