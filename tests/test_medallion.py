"""End-to-end medallion pipeline test on the deterministic flight fixtures
(FIXTURES.md): bronze ingest → silver star → gold suite, plus the
reference's runtime quality checks as assertions (SURVEY §5)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def medallion(spark, flight_fixture_dir, test_env_config):
    from unicargo_medallion_data_pipeline_spark.pipelines.medallion import run_medallion

    return run_medallion(
        spark,
        {
            "flights": os.path.join(flight_fixture_dir, "flights.csv"),
            "airlines": os.path.join(flight_fixture_dir, "airlines.csv"),
            "airports": os.path.join(flight_fixture_dir, "airports.csv"),
        },
        environment="test",
        config=test_env_config,
        date_range=("2015-01-01", "2015-12-31"),
    )


def test_bronze_tables_written(spark, medallion):
    for entity, name in medallion.bronze.items():
        df = spark.read.table(name)
        assert df.count() > 0
        assert "metadata" in df.columns and "processed_timestamp" in df.columns


def test_dim_airline_dedup_and_keys(spark, medallion):
    dim = spark.read.table(medallion.silver["airlines"])
    rows = dim.collect()
    codes = [r["iata_code"] for r in rows]
    assert len(codes) == len(set(codes)), "dedup on iata_code failed"
    assert None not in codes
    sks = sorted(r["airline_sk"] for r in rows)
    assert sks == list(range(1, len(rows) + 1)), "surrogate keys not dense"


def test_dim_date_reference_conventions(spark, medallion):
    dd = spark.read.table(medallion.silver["dates"]).filter(F.col("year") == 2015)
    assert dd.count() == 365
    jan1 = dd.filter(F.col("full_date") == "2015-01-01").collect()[0]
    # 2015-01-01 was a Thursday; reference convention Monday=1 → 4
    assert jan1["day_of_week"] == 4
    assert jan1["day_name"] == "Thursday"
    assert jan1["quarter"] == 1 and jan1["is_weekend"] == 0
    sat = dd.filter(F.col("day_name") == "Saturday")
    assert sat.filter(F.col("is_weekend") != 1).count() == 0


def test_fact_cleansing_rules(spark, medallion):
    fact = spark.read.table(medallion.silver["flights"])
    assert fact.count() > 0
    assert fact.filter(F.col("origin_airport_sk") == F.col("destination_airport_sk")).count() == 0
    # business-key dedup survived the hash-key derivation
    assert fact.select("flight_sk").distinct().count() == fact.count()


def test_orphan_fk_audit_zero(spark, medallion):
    from unicargo_medallion_data_pipeline_spark.quality.validation import orphan_fk_counts

    fact = spark.read.table(medallion.silver["flights"])
    counts = orphan_fk_counts(
        fact,
        {
            "date_sk": (spark.read.table(medallion.silver["dates"]), "date_sk"),
            "airline_sk": (spark.read.table(medallion.silver["airlines"]), "airline_sk"),
            "origin_airport_sk": (spark.read.table(medallion.silver["airports"]), "airport_sk"),
            "destination_airport_sk": (spark.read.table(medallion.silver["airports"]), "airport_sk"),
        },
    )
    assert all(v == 0 for v in counts.values()), counts


def test_day_of_week_consistency(spark, medallion):
    """Q3 — the fact's carried day_of_week matches the date dim's
    convention (the engine takes DOW from dim_date, so this must be 0)."""
    fact = spark.read.table(medallion.silver["flights"])
    dd = spark.read.table(medallion.silver["dates"])
    mismatches = (
        fact.join(dd.select("date_sk", dd.day_of_week.alias("dim_dow")), "date_sk")
        .filter(F.col("day_of_week") != F.col("dim_dow"))
        .count()
    )
    assert mismatches == 0


def test_gold_suite_written_and_nonempty(spark, medallion):
    assert len(medallion.gold) == 20
    for name, table in medallion.gold.items():
        df = spark.read.table(table)
        assert df.columns, name
        if name not in ("significant_routes", "flight_number_performance"):
            assert df.count() > 0, f"{name} unexpectedly empty"


def test_gold_route_floor(spark, medallion):
    sig = spark.read.table(medallion.gold["significant_routes"])
    assert sig.filter(F.col("total_flights") < 100).count() == 0
    # fixture biases one route to ~50% of flights → it must pass the floor
    assert sig.count() >= 1


def test_gold_rates_bounded(spark, medallion):
    summary = spark.read.table(medallion.gold["airline_operational_summary"])
    bad = summary.filter(
        (F.col("cancellation_rate_pct") < 0)
        | (F.col("cancellation_rate_pct") > 100)
        | (F.col("on_time_rate_pct") < 0)
        | (F.col("on_time_rate_pct") > 100)
    )
    assert bad.count() == 0


def test_gold_delay_distribution_shares_sum_to_100(spark, medallion):
    dist = spark.read.table(medallion.gold["delay_distribution"])
    total = dist.agg(F.sum("pct_of_all_flights")).collect()[0][0]
    assert abs(total - 100.0) < 1e-9


def test_rolling_otp_window_bounded(spark, medallion):
    r = spark.read.table(medallion.gold["rolling_on_time_performance"])
    bad = r.filter((F.col("rolling_7d_otp") < 0) | (F.col("rolling_7d_otp") > 100))
    assert bad.count() == 0


def test_bronze_quarantine_row_conservation(spark):
    """The default bronze path splits malformed lines into a quarantine
    side table, and good + quarantined == raw data lines (the gate
    raises otherwise).  Malformed here = wrong column count."""
    import tempfile

    from unicargo_medallion_data_pipeline_spark.pipelines.medallion import run_bronze

    d = tempfile.mkdtemp(prefix="quarantine_")
    p = os.path.join(d, "airlines.csv")
    with open(p, "w") as f:
        f.write("iata_code,airline\n")
        f.write("AA,American Airlines\n")
        f.write("DL,Delta Air Lines\n")
        f.write("XX,Broken Line,unexpected,extra,columns\n")
    cfg = {
        "environments": {"qtest": {"storage_root": tempfile.mkdtemp(prefix="qwh_")}},
        "tables": {
            "airlines": {"bronze": {"table": "airlines_raw", "source_format": "csv"}}
        },
    }
    out = run_bronze(spark, {"airlines": p}, environment="qtest", config=cfg)
    assert out["airlines"].count() == 2
    q = spark.read.table("qtest_bronze.airlines_raw_quarantine")
    rows = q.collect()
    assert len(rows) == 1
    # The ORIGINAL line is preserved verbatim for replay.
    assert rows[0]["raw_line"] == "XX,Broken Line,unexpected,extra,columns"
    assert rows[0]["entity"] == "airlines"
    # 2 good + 1 quarantined == 3 raw data lines: conservation held
    # (run_bronze would have raised otherwise).


def test_fact_rerun_is_deterministic(spark, flight_fixture_dir, medallion):
    """SURVEY §7.4 hazard: rerunning the silver build must give identical
    flight_sk values (the reference's monotonically_increasing_id does
    not)."""
    from unicargo_medallion_data_pipeline_spark.pipelines import silver
    from unicargo_medallion_data_pipeline_spark.schemas.flights import FLIGHTS_SCHEMA
    from unicargo_medallion_data_pipeline_spark.sources.readers import read_csv

    raw = read_csv(spark, os.path.join(flight_fixture_dir, "flights.csv"), FLIGHTS_SCHEMA)
    clean = silver.clean_flights(raw)
    fact_existing = spark.read.table(medallion.silver["flights"])
    rebuilt_keys = {
        r[0]
        for r in silver.build_fact_flight(
            clean.repartition(16),  # different partitioning on purpose
            spark.read.table(medallion.silver["dates"]),
            spark.read.table(medallion.silver["airlines"]),
            spark.read.table(medallion.silver["airports"]),
        )
        .select("flight_sk")
        .collect()
    }
    existing_keys = {r[0] for r in fact_existing.select("flight_sk").collect()}
    assert rebuilt_keys == existing_keys


def test_gold_parallelism_matches_serial(spark, medallion, flight_fixture_dir, test_env_config):
    """gold_parallelism>1 must produce bitwise-identical gold tables to
    the serial path (distinct targets, shared read-only cached fact) —
    the correctness contract behind the bench's concurrent fan-out."""
    from unicargo_medallion_data_pipeline_spark.pipelines.medallion import run_medallion

    par = run_medallion(
        spark,
        {
            "flights": os.path.join(flight_fixture_dir, "flights.csv"),
            "airlines": os.path.join(flight_fixture_dir, "airlines.csv"),
            "airports": os.path.join(flight_fixture_dir, "airports.csv"),
        },
        environment="testpar",
        config={
            "environments": {
                "testpar": test_env_config["environments"]["test"],
                **{
                    k: v
                    for k, v in test_env_config["environments"].items()
                    if k != "test"
                },
            },
            "tables": test_env_config["tables"],
        },
        date_range=("2015-01-01", "2015-12-31"),
        gold_parallelism=4,
    )
    assert set(par.gold) == set(medallion.gold)
    for name in par.gold:
        a = spark.read.table(medallion.gold[name])
        b = spark.read.table(par.gold[name])
        assert a.schema == b.schema, name
        assert (
            a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
        ), f"gold table {name} differs between serial and parallel"
        assert a.count() == b.count(), name


def test_quarantine_gate_failure_preserves_previous_bronze(spark, monkeypatch):
    """Round-10 ADVICE 2: a lossy quarantine split must abort WITHOUT
    clobbering the previous good bronze + quarantine tables — writes go
    to staging names and only promote after the conservation gate
    passes."""
    import tempfile

    from unicargo_medallion_data_pipeline_spark.pipelines import medallion as med

    d = tempfile.mkdtemp(prefix="quarantine_gate_")
    p = os.path.join(d, "airlines.csv")
    with open(p, "w") as f:
        f.write("iata_code,airline\n")
        f.write("AA,American Airlines\n")
        f.write("DL,Delta Air Lines\n")
        f.write("XX,Broken Line,unexpected,extra,columns\n")
    cfg = {
        "environments": {"qgate": {"storage_root": tempfile.mkdtemp(prefix="qwh_")}},
        "tables": {
            "airlines": {"bronze": {"table": "airlines_raw", "source_format": "csv"}}
        },
    }
    # first run: good split, tables land
    med.run_bronze(spark, {"airlines": p}, environment="qgate", config=cfg)
    assert spark.read.table("qgate_bronze.airlines_raw").count() == 2
    assert spark.read.table("qgate_bronze.airlines_raw_quarantine").count() == 1

    # second run: simulate a LOSSY split (one good row silently dropped)
    real = med.read_csv_with_quarantine

    def lossy(spark_, path_, schema_):
        good, bad = real(spark_, path_, schema_)
        return good.limit(1), bad

    monkeypatch.setattr(med, "read_csv_with_quarantine", lossy)
    with pytest.raises(ValueError, match="lost rows"):
        med.run_bronze(spark, {"airlines": p}, environment="qgate", config=cfg)
    # previous good tables are INTACT (old behavior had already
    # overwritten them before the gate fired)
    assert spark.read.table("qgate_bronze.airlines_raw").count() == 2
    assert spark.read.table("qgate_bronze.airlines_raw_quarantine").count() == 1
    # staging leftovers are cleaned up
    staged = [
        t.name
        for t in spark.catalog.listTables("qgate_bronze")
        if "__staging" in t.name
    ]
    assert staged == []


def test_grain_derived_gold_matches_direct(spark, medallion):
    """Round-10 verdict task 6: every gold table the medallion driver
    derives from the shared (date, airline) grain — and the two
    route-traffic-derived tables — must equal the direct fact builders
    BITWISE (exceptAll both ways, schema equality).  The grain partials
    are exact longs, so even the double avg/rate columns must match
    bit-for-bit (see the derivation note in gold_flights.py)."""
    from unicargo_medallion_data_pipeline_spark.pipelines import gold_flights as g

    fact = spark.read.table(medallion.silver["flights"])
    da = spark.read.table(medallion.silver["airlines"])
    dp = spark.read.table(medallion.silver["airports"])
    dd = spark.read.table(medallion.silver["dates"])
    dims = {"dd": dd, "da": da}
    needs_direct = {
        "airline_operational_summary": (fact, da),
        "daily_flight_summary": (fact, dd, da),
        "monthly_flight_trends": (fact, dd, da),
        "airline_day_of_week": (fact, dd, da),
        "seasonal_flight_summary": (fact, dd),
        "weekend_weekday_split": (fact, dd, da),
        "quarterly_flight_summary": (fact, dd, da),
        "rolling_on_time_performance": (fact, dd, da),
    }
    grain = g.build_date_airline_grain(fact).persist()
    try:
        for name, (fn, needed) in g.GRAIN_SUITE.items():
            direct = g.GOLD_SUITE[name](*needs_direct[name])
            derived = fn(grain, *[dims[d] for d in needed])
            assert derived.schema == direct.schema, name
            assert (
                direct.exceptAll(derived).count() == 0
                and derived.exceptAll(direct).count() == 0
            ), f"grain-derived {name} differs from the direct builder"
    finally:
        grain.unpersist()
    traffic = g.route_traffic(fact, dp).persist()
    try:
        pairs = [
            ("significant_routes", g.significant_routes(fact, dp),
             g.significant_routes_from_traffic(traffic)),
            ("busiest_routes", g.busiest_routes(fact, dp),
             g.top_routes_from_traffic(traffic, 50)),
            # round-11 pipelines hunt: top_routes joined the shared family
            ("top_routes", g.top_routes(fact, dp, 10),
             g.top_routes_from_traffic(traffic, 10)),
        ]
        for name, direct, derived in pairs:
            assert derived.schema == direct.schema, name
            assert (
                direct.exceptAll(derived).count() == 0
                and derived.exceptAll(direct).count() == 0
            ), f"traffic-derived {name} differs from the direct builder"
    finally:
        traffic.unpersist()


def test_bronze_quoted_newline_fragments_are_quarantined(spark):
    """r12 upgrade of the r11 "detects" pin to PREVENTS: a quoted cell
    containing a raw newline is two physical lines — the line parser
    would accept the head fragment as a good row with the cell silently
    TRUNCATED (no univocity mode rejects an unterminated quote at EOL).
    The quote-balance audit is now wired INTO read_csv_with_quarantine:
    both fragments land in quarantine verbatim, the truncated twin never
    reaches the good frame, and conservation still balances."""
    import tempfile

    from unicargo_medallion_data_pipeline_spark.pipelines.medallion import run_bronze
    from unicargo_medallion_data_pipeline_spark.sources.readers import (
        audit_csv_quote_balance,
    )

    d = tempfile.mkdtemp(prefix="quarantine_nl_")
    p = os.path.join(d, "airlines.csv")
    with open(p, "w") as f:
        f.write("iata_code,airline\n")
        f.write("AA,American Airlines\n")
        f.write('QQ,"Line\nBreak Air"\n')  # one record, TWO physical lines
        f.write("DL,Delta Air Lines\n")
    cfg = {
        "environments": {"qtest2": {"storage_root": tempfile.mkdtemp(prefix="qwh2_")}},
        "tables": {
            "airlines": {"bronze": {"table": "airlines_raw", "source_format": "csv"}}
        },
    }
    out = run_bronze(spark, {"airlines": p}, environment="qtest2", config=cfg)
    good = {r["iata_code"]: r["airline"] for r in out["airlines"].collect()}
    q_lines = {
        r["raw_line"]
        for r in spark.read.table("qtest2_bronze.airlines_raw_quarantine").collect()
    }
    # conservation balances (4 raw data lines = 2 good + 2 quarantined)
    # and the truncated head fragment is QUARANTINED, not accepted
    assert len(good) + len(q_lines) == 4
    assert good == {"AA": "American Airlines", "DL": "Delta Air Lines"}
    assert q_lines == {'QQ,"Line', 'Break Air"'}  # both fragments, verbatim
    suspects = {r["raw_line"] for r in audit_csv_quote_balance(spark, p).collect()}
    assert suspects == {'QQ,"Line', 'Break Air"'}


def test_bronze_scrubs_nonfinite_doubles_to_null(spark):
    """r12 (r11 verdict item 3): the finite-or-NULL doubles contract is
    made true BY the default ingest — NaN/±Inf double cells in source
    CSVs arrive in bronze as NULL, not as contract-breaking values."""
    import math
    import tempfile

    from unicargo_medallion_data_pipeline_spark.pipelines.medallion import run_bronze

    d = tempfile.mkdtemp(prefix="nonfinite_")
    p = os.path.join(d, "airports.csv")
    with open(p, "w") as f:
        f.write("iata_code,airline,city,state,country,latitude,longitude\n")
        f.write("AAA,Any Airport,Springfield,IL,USA,39.8,-89.6\n")
        f.write("BBB,Bad Airport,Nowhere,XX,USA,NaN,Inf\n")
        f.write("CCC,Cold Airport,Utqiagvik,AK,USA,-Inf,156.8\n")
    cfg = {
        "environments": {"nfin": {"storage_root": tempfile.mkdtemp(prefix="nfwh_")}},
        "tables": {
            "airports": {"bronze": {"table": "airports_raw", "source_format": "csv"}}
        },
    }
    out = run_bronze(spark, {"airports": p}, environment="nfin", config=cfg)
    rows = {r["iata_code"]: r for r in out["airports"].collect()}
    assert len(rows) == 3  # nothing quarantined — NaN/Inf parse fine
    assert rows["AAA"]["latitude"] == 39.8
    assert rows["BBB"]["latitude"] is None and rows["BBB"]["longitude"] is None
    assert rows["CCC"]["latitude"] is None and rows["CCC"]["longitude"] == 156.8
    for r in rows.values():  # nothing non-finite anywhere in bronze
        for c in ("latitude", "longitude"):
            assert r[c] is None or math.isfinite(r[c])


def test_datagen_nonfinite_injection_and_scrub_roundtrip(spark, tmp_path):
    """r11 ADVICE item 4: datagen can inject NaN/±Inf float edges
    (nonfinite=True), and scrub_nonfinite clears every one of them —
    the unit-level pin for the bronze-boundary contract.  The DEFAULT
    sweep stays nonfinite-free (see datagen._NONFINITE_FLOATS: the
    catalog's oracle comparison reads raw tables below the contract
    boundary, where the engines legitimately disagree on NaN)."""
    import math

    from pyspark.sql import functions as F

    from unicargo_medallion_data_pipeline_spark.operators.cleaning import scrub_nonfinite
    from unicargo_medallion_data_pipeline_spark.testing.datagen import write_mutated_dataset

    out_dir = str(tmp_path / "nonfinite_ds")
    write_mutated_dataset(
        "/root/testdata/sf0.001", out_dir, seed="nf1",
        edge_frac=0.4, null_frac=0.0, nonfinite=True,
    )
    ev = spark.read.parquet(os.path.join(out_dir, "events.parquet"))
    n_bad = ev.filter(F.isnan("value") | F.col("value").isin(
        float("inf"), float("-inf"))).count()
    assert n_bad > 0, "nonfinite=True must actually inject NaN/Inf"
    scrubbed = scrub_nonfinite(ev)
    vals = [r["value"] for r in scrubbed.select("value").collect()]
    assert all(v is None or math.isfinite(v) for v in vals)
    # conservation: scrub nulls cells, never drops rows
    assert scrubbed.count() == ev.count()
