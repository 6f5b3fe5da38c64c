from unicargo_medallion_data_pipeline_spark.plans.catalog import CATALOG, Query, register  # noqa: F401
