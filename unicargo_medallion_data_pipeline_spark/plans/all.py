"""Import every plans module for its registration side effects.

``from unicargo_medallion_data_pipeline_spark.plans.all import CATALOG`` gives the fully
populated catalog.
"""

from unicargo_medallion_data_pipeline_spark.plans.catalog import CATALOG  # noqa: F401
import unicargo_medallion_data_pipeline_spark.plans.tpch_gold  # noqa: F401
import unicargo_medallion_data_pipeline_spark.plans.tpch_gold2  # noqa: F401
import unicargo_medallion_data_pipeline_spark.plans.docs_gold  # noqa: F401
import unicargo_medallion_data_pipeline_spark.plans.similarity_gold  # noqa: F401
import unicargo_medallion_data_pipeline_spark.plans.docs_gold2  # noqa: F401
import unicargo_medallion_data_pipeline_spark.plans.tpch_gold3  # noqa: F401
import unicargo_medallion_data_pipeline_spark.plans.tpch_gold4  # noqa: F401
import unicargo_medallion_data_pipeline_spark.plans.tpch_gold5  # noqa: F401
import unicargo_medallion_data_pipeline_spark.plans.tpch_gold6  # noqa: F401
import unicargo_medallion_data_pipeline_spark.plans.tpch_gold7  # noqa: F401
import unicargo_medallion_data_pipeline_spark.plans.docs_gold3  # noqa: F401
import unicargo_medallion_data_pipeline_spark.plans.tpch_gold8  # noqa: F401
import unicargo_medallion_data_pipeline_spark.plans.flights_gold  # noqa: F401
import unicargo_medallion_data_pipeline_spark.plans.mutation_gold  # noqa: F401
import unicargo_medallion_data_pipeline_spark.plans.docs_gold4  # noqa: F401
import unicargo_medallion_data_pipeline_spark.plans.tpch_gold9  # noqa: F401
import unicargo_medallion_data_pipeline_spark.plans.events_gold  # noqa: F401
import unicargo_medallion_data_pipeline_spark.plans.analytics_gold  # noqa: F401
import unicargo_medallion_data_pipeline_spark.plans.assoc_gold  # noqa: F401
import unicargo_medallion_data_pipeline_spark.plans.analytics_gold2  # noqa: F401
import unicargo_medallion_data_pipeline_spark.plans.analytics_gold3  # noqa: F401
import unicargo_medallion_data_pipeline_spark.plans.sql_gold  # noqa: F401
import unicargo_medallion_data_pipeline_spark.plans.multimodal_gold  # noqa: F401
import unicargo_medallion_data_pipeline_spark.plans.assets_gold  # noqa: F401
