from unicargo_medallion_data_pipeline_spark.streaming.readers import read_streaming_path, read_streaming_table  # noqa: F401
from unicargo_medallion_data_pipeline_spark.streaming.writers import write_stream_to_table, write_stream_with_merge  # noqa: F401
