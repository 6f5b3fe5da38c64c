"""Flight-domain fixtures: the committed parquet must equal regeneration
value-for-value (the determinism contract the oracle queries rely on),
and the FIXTURES.md dirty-data coverage must actually be present."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def paths():
    from unicargo_medallion_data_pipeline_spark.sources.flights_fixture import (
        ensure_flights_fixture,
    )

    return ensure_flights_fixture()


def test_committed_files_match_regeneration(paths):
    from unicargo_medallion_data_pipeline_spark.sources.flights_fixture import (
        gen_airlines,
        gen_airports,
        gen_flights,
    )

    for name, gen in (
        ("flights", gen_flights),
        ("airlines", gen_airlines),
        ("airports", gen_airports),
    ):
        committed = pq.read_table(paths[name])
        fresh = gen()
        assert committed.schema.equals(fresh.schema), name
        assert committed.equals(fresh), f"{name}: committed fixture != regeneration"


def test_dirty_data_coverage(paths):
    import duckdb

    con = duckdb.connect()
    fl = paths["flights"]

    # Calendar-invalid dates present AND nulled by try_strptime.
    invalid = con.execute(
        f"""SELECT COUNT(*) FROM read_parquet('{fl}')
            WHERE try_strptime(printf('%04d-%02d-%02d', year, month, day),
                               '%Y-%m-%d') IS NULL"""
    ).fetchone()[0]
    assert invalid > 0
    # ...but some day-29-31 rows are VALID dates (Jan 29 etc).
    valid_hi = con.execute(
        f"""SELECT COUNT(*) FROM read_parquet('{fl}')
            WHERE day >= 29 AND try_strptime(printf('%04d-%02d-%02d', year, month, day),
                               '%Y-%m-%d') IS NOT NULL"""
    ).fetchone()[0]
    assert valid_hi > 0

    # Exact duplicates and key-duplicates-with-differing-measures exist.
    dup_exact = con.execute(
        f"""SELECT COUNT(*) FROM (
              SELECT COUNT(*) c FROM read_parquet('{fl}')
              GROUP BY ALL HAVING COUNT(*) > 1)"""
    ).fetchone()[0]
    assert dup_exact > 0
    key_dups = con.execute(
        f"""SELECT COUNT(*) FROM (
              SELECT flight_number, year, month, day, origin_airport,
                     destination_airport,
                     COUNT(DISTINCT scheduled_departure) AS n_sched
              FROM read_parquet('{fl}')
              GROUP BY ALL HAVING COUNT(DISTINCT scheduled_departure) > 1)"""
    ).fetchone()[0]
    assert key_dups > 0

    # Delay/distance bucket edges all present.
    edges = con.execute(
        f"""SELECT
              COUNT(DISTINCT CASE WHEN departure_delay IN (0,1,15,16,60,61,180,181) THEN departure_delay END),
              COUNT(DISTINCT CASE WHEN distance IN (500,501,1500,1501) THEN distance END)
            FROM read_parquet('{fl}')"""
    ).fetchone()
    assert edges == (8, 4)

    # Unknown airline/airport codes + origin==destination rows present.
    counts = con.execute(
        f"""SELECT
             SUM(CASE WHEN airline IN ('XX','QQ') THEN 1 ELSE 0 END),
             SUM(CASE WHEN origin_airport = 'ZZZ' THEN 1 ELSE 0 END),
             SUM(CASE WHEN origin_airport = destination_airport THEN 1 ELSE 0 END)
           FROM read_parquet('{fl}')"""
    ).fetchone()
    assert all(c > 0 for c in counts)

    # Dimension dirty rows: duplicate + NULL iata codes.
    for t in ("airlines", "airports"):
        dup, nul = con.execute(
            f"""SELECT
                 (SELECT COUNT(*) FROM (SELECT iata_code FROM read_parquet('{paths[t]}')
                   WHERE iata_code IS NOT NULL GROUP BY 1 HAVING COUNT(*) > 1)),
                 (SELECT COUNT(*) FROM read_parquet('{paths[t]}') WHERE iata_code IS NULL)"""
        ).fetchone()
        assert dup >= 2 and nul == 1, t


def test_significance_floor_split(paths):
    """Some routes clear the reference's ≥100-flight floor, most do not
    (FIXTURES.md §1)."""
    import duckdb

    con = duckdb.connect()
    above, below = con.execute(
        f"""WITH r AS (
              SELECT origin_airport, destination_airport, COUNT(*) c
              FROM read_parquet('{paths["flights"]}')
              WHERE origin_airport <> destination_airport
              GROUP BY 1, 2)
            SELECT SUM(CASE WHEN c >= 100 THEN 1 ELSE 0 END),
                   SUM(CASE WHEN c < 100 THEN 1 ELSE 0 END) FROM r"""
    ).fetchone()
    assert above >= 1 and below > 100


def test_fixture_env_override_requires_prebuilt_files(tmp_path, monkeypatch):
    """SPARK_GRAFT_FLIGHTS_FIXTURE_DIR points at PRE-BUILT (e.g. mutated)
    fixtures; a missing file under an override must raise instead of
    silently regenerating clean data there — that would turn a
    hostile-data sweep into a clean-data false pass."""
    import pytest as _pytest

    from unicargo_medallion_data_pipeline_spark.sources import flights_fixture as ff

    monkeypatch.setenv(ff.FIXTURE_DIR_ENV, str(tmp_path))
    with _pytest.raises(FileNotFoundError, match="does not exist"):
        ff.ensure_flights_fixture(str(tmp_path))
    # no file was created by the failed call
    assert not list(tmp_path.iterdir())
