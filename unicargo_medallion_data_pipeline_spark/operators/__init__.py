from unicargo_medallion_data_pipeline_spark.operators.cleaning import (  # noqa: F401
    CleaningConfig,
    clean,
    drop_columns_safe,
    dedup,
    fill_nulls,
)
from unicargo_medallion_data_pipeline_spark.operators.keys import dim_surrogate_key, fact_hash_key  # noqa: F401
from unicargo_medallion_data_pipeline_spark.operators.transforms import with_metadata, with_processed_timestamp  # noqa: F401
