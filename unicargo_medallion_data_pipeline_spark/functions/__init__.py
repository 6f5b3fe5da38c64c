from unicargo_medallion_data_pipeline_spark.functions.exact import davg, dsum, dstddev_samp, rate_pct  # noqa: F401
