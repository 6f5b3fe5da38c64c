"""Shared fixtures: one session-scoped SparkSession (local mode) and
deterministic flight-domain CSV fixtures per FIXTURES.md."""

from __future__ import annotations

import csv
import os
import random
import sys
import tempfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from unicargo_medallion_data_pipeline_spark.session import get_spark

    warehouse = tempfile.mkdtemp(prefix="spark_warehouse_")
    derby = tempfile.mkdtemp(prefix="derby_")
    s = get_spark(
        "tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={
            "spark.sql.warehouse.dir": warehouse,
            "spark.driver.extraJavaOptions": f"-Dderby.system.home={derby}",
        },
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


AIRLINE_CODES = ["AA", "DL", "UA", "WN", "B6", "AS", "NK", "F9", "HA", "VX", "OO", "EV", "MQ", "US"]


def _airport_codes(n=50):
    rng = random.Random(7)
    codes = set()
    while len(codes) < n:
        codes.add("".join(rng.choice("ABCDEFGHIJKLMNOPQRSTUVWXYZ") for _ in range(3)))
    return sorted(codes)


AIRPORT_CODES = _airport_codes()


@pytest.fixture(scope="session")
def flight_fixture_dir():
    """Deterministic CSV fixtures per FIXTURES.md §1-3: dups, nulls,
    unknown codes, origin==dest rows, invalid dates, inconsistent DOW."""
    rng = random.Random(42)
    d = tempfile.mkdtemp(prefix="flight_fixtures_")

    # airlines: 14 + 1 duplicate code + 1 null code
    with open(os.path.join(d, "airlines.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["iata_code", "airline"])
        for c in AIRLINE_CODES:
            w.writerow([c, f"{c} Airlines"])
        w.writerow(["AA", "Duplicate AA Airlines"])
        w.writerow(["", "Mystery Air"])

    # airports: 50 + duplicate + null
    with open(os.path.join(d, "airports.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["iata_code", "airline", "city", "state", "country", "latitude", "longitude"])
        for c in AIRPORT_CODES:
            w.writerow(
                [c, f"{c} Intl", f"City {c}", "CA", "USA",
                 round(17 + rng.random() * 55, 4), round(-176 + rng.random() * 112, 4)]
            )
        w.writerow([AIRPORT_CODES[0], "Dup Airport", "Dupville", "TX", "USA", 30.0, -97.0])
        w.writerow(["", "Null Airport", "Nowhere", "NV", "USA", 36.0, -115.0])

    # flights: 3000 rows, Jan-Mar 2015
    rows = []
    for i in range(3000):
        month = rng.randint(1, 3)
        day = rng.randint(1, 28)
        import datetime as dt

        date = dt.date(2015, month, day)
        dow = date.isoweekday()
        if rng.random() < 0.01:
            dow = (dow % 7) + 1  # deliberately inconsistent
        airline = rng.choice(AIRLINE_CODES) if rng.random() > 0.005 else "ZZ"
        # Bias routes so some pass the >=100 floor
        if rng.random() < 0.5:
            origin, dest = AIRPORT_CODES[0], AIRPORT_CODES[1]
        else:
            origin = rng.choice(AIRPORT_CODES)
            dest = rng.choice(AIRPORT_CODES)
        if rng.random() < 0.003:
            dest = origin  # must be filtered
        dep_delay = max(-30, int(rng.gauss(8, 25)))
        cancelled = 1 if rng.random() < 0.015 else 0
        rows.append(
            [
                2015, month, day, date.isoweekday() if rng.random() > 0.01 else dow,
                airline, rng.randint(1, 7999),
                f"N{rng.randint(100, 999)}{rng.choice('ABC')}{rng.choice('XYZ')}"
                if rng.random() > 0.01 else "",
                origin, dest,
                rng.randint(0, 2359), rng.randint(0, 2359), dep_delay,
                rng.randint(3, 60), rng.randint(0, 2359), rng.randint(30, 500),
                rng.randint(25, 550), rng.randint(20, 500), rng.randint(50, 3000),
                rng.randint(0, 2359), rng.randint(2, 40), rng.randint(0, 2359),
                rng.randint(0, 2359), max(-40, int(rng.gauss(5, 30))),
                1 if rng.random() < 0.002 else 0, cancelled,
                rng.choice("ABCD") if cancelled else "",
                "", "", "", "", "",
            ]
        )
    # ~1% exact duplicates
    for i in range(30):
        rows.append(list(rows[rng.randrange(len(rows))]))

    header = [
        "year", "month", "day", "day_of_week", "airline", "flight_number",
        "tail_number", "origin_airport", "destination_airport",
        "scheduled_departure", "departure_time", "departure_delay", "taxi_out",
        "wheels_off", "scheduled_time", "elapsed_time", "air_time", "distance",
        "wheels_on", "taxi_in", "scheduled_arrival", "arrival_time",
        "arrival_delay", "diverted", "cancelled", "cancellation_reason",
        "air_system_delay", "security_delay", "airline_delay",
        "late_aircraft_delay", "weather_delay",
    ]
    with open(os.path.join(d, "flights.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(header)
        w.writerows(rows)
    return d


@pytest.fixture(scope="session")
def test_env_config():
    root = tempfile.mkdtemp(prefix="medallion_warehouse_")
    return {
        "environments": {"test": {"storage_root": root}},
        "tables": {
            "flights": {
                "bronze": {"table": "flights_raw", "source_format": "csv"},
                "silver": {"table": "fact_flight"},
            },
            "airlines": {
                "bronze": {"table": "airlines_raw", "source_format": "csv"},
                "silver": {"table": "dim_airline"},
            },
            "airports": {
                "bronze": {"table": "airports_raw", "source_format": "csv"},
                "silver": {"table": "dim_airport"},
            },
            "dates": {"silver": {"table": "dim_date"}},
        },
    }


# ---------------------------------------------------------------------------
# Deterministic binary-asset fixture (multimodal family, r14): real
# container layouts — PNG signature+IHDR, RIFF/WAVE, ftyp box, %PDF- —
# shared by test_multimodal.py and test_corpus_pipeline.py.
# ---------------------------------------------------------------------------


def real_png(width: int, height: int) -> bytes:
    import struct

    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">II", width, height)
        + b"\x08\x06\x00\x00\x00"  # bit depth / color type / filler
        + b"fake-idat-payload"
    )


def real_wav() -> bytes:
    return b"RIFF" + b"\x24\x00\x00\x00" + b"WAVE" + b"fmt \x10\x00\x00\x00tail"


def real_mp4() -> bytes:
    import struct

    return struct.pack(">I", 24) + b"ftypisom" + b"\x00" * 16


@pytest.fixture(scope="session")
def binary_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("bin_assets")
    (d / "batch0").mkdir()
    (d / "batch1").mkdir()
    (d / "batch0" / "a.png").write_bytes(real_png(7, 9))
    (d / "batch0" / "b.wav").write_bytes(real_wav())
    (d / "batch1" / "c.mp4").write_bytes(real_mp4())
    (d / "batch1" / "d.pdf").write_bytes(b"%PDF-1.4 fake doc")
    (d / "batch1" / "junk.bin").write_bytes(b"\x00\x01\x02no-container-here")
    # duplicate CONTENT at a second path: exact dedup by hash must see it
    (d / "batch1" / "a_copy.png").write_bytes(real_png(7, 9))
    return str(d)
