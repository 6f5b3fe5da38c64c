"""Source-entity schemas, declared up front (schema-on-read, never inferred).

Reference counterparts (capability parity, not copied code):
  - flights:  ``unicargo_etl/scripts/01_bronze/schemas/flights_schema.py:3-34``
    (31 columns, ints except 5 string codes/reasons)
  - airlines: ``unicargo_etl/scripts/01_bronze/schemas/airlines_schema.py:3-6``
  - airports: ``unicargo_etl/scripts/01_bronze/schemas/airports_schema.py:4-12``
    (the ``airline`` column name for the airport name is reproduced as-is —
    it is part of the reference's public surface)

At 100 TB an explicit schema is not a style choice: inference is a second
full pass over the lake, and a drifting inferred type (int → string) breaks
every downstream cast.
"""

from __future__ import annotations

from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)


def _f(name: str, dtype) -> StructField:
    return StructField(name, dtype, nullable=True)


_INT_MEASURES = (
    "year",
    "month",
    "day",
    "day_of_week",
    "flight_number",
    "scheduled_departure",
    "departure_time",
    "departure_delay",
    "taxi_out",
    "wheels_off",
    "scheduled_time",
    "elapsed_time",
    "air_time",
    "distance",
    "wheels_on",
    "taxi_in",
    "scheduled_arrival",
    "arrival_time",
    "arrival_delay",
    "diverted",
    "cancelled",
    "air_system_delay",
    "security_delay",
    "airline_delay",
    "late_aircraft_delay",
    "weather_delay",
)

_STRING_COLS = {
    "airline",
    "tail_number",
    "origin_airport",
    "destination_airport",
    "cancellation_reason",
}

#: Column order matches the reference's CSV layout.
_FLIGHTS_ORDER = (
    "year",
    "month",
    "day",
    "day_of_week",
    "airline",
    "flight_number",
    "tail_number",
    "origin_airport",
    "destination_airport",
    "scheduled_departure",
    "departure_time",
    "departure_delay",
    "taxi_out",
    "wheels_off",
    "scheduled_time",
    "elapsed_time",
    "air_time",
    "distance",
    "wheels_on",
    "taxi_in",
    "scheduled_arrival",
    "arrival_time",
    "arrival_delay",
    "diverted",
    "cancelled",
    "cancellation_reason",
    "air_system_delay",
    "security_delay",
    "airline_delay",
    "late_aircraft_delay",
    "weather_delay",
)

FLIGHTS_SCHEMA = StructType(
    [
        _f(c, StringType() if c in _STRING_COLS else IntegerType())
        for c in _FLIGHTS_ORDER
    ]
)

AIRLINES_SCHEMA = StructType(
    [_f("iata_code", StringType()), _f("airline", StringType())]
)

AIRPORTS_SCHEMA = StructType(
    [
        _f("iata_code", StringType()),
        _f("airline", StringType()),  # airport name (reference naming, kept)
        _f("city", StringType()),
        _f("state", StringType()),
        _f("country", StringType()),
        _f("latitude", DoubleType()),
        _f("longitude", DoubleType()),
    ]
)
