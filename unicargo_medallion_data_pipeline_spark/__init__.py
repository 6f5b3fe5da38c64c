"""unicargo_medallion_data_pipeline_spark — a PySpark-native analytics engine.

A clean-room, Spark-first re-implementation of the capability surface of
``akin11235/unicargo-medallion-data-pipeline`` (medallion ETL: bronze ingest,
silver dimensional modelling, gold analytics, streaming/incremental writes,
data-quality gates), extended with large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns).

Everything is expressed through the public DataFrame / SQL API so Catalyst
and Tungsten choose physical plans; no RDDs, no row-at-a-time Python UDFs in
hot paths.
"""

__version__ = "0.1.0"

from unicargo_medallion_data_pipeline_spark.session import get_spark  # noqa: F401
