from unicargo_medallion_data_pipeline_spark.config.tables import TableConfig, get_table_config  # noqa: F401
