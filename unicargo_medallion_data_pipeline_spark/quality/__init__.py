from unicargo_medallion_data_pipeline_spark.quality.validation import (  # noqa: F401
    DataQualityError,
    null_profile,
    orphan_fk_counts,
    validate_data_quality,
)
