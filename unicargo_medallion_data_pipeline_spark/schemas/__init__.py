from unicargo_medallion_data_pipeline_spark.schemas.flights import (  # noqa: F401
    AIRLINES_SCHEMA,
    AIRPORTS_SCHEMA,
    FLIGHTS_SCHEMA,
)
