"""Deterministic flight-domain fixtures (FIXTURES.md §1-§3).

Generates the reference's three source tables — ``flights`` (fact
source, ``unicargo_etl/scripts/01_bronze/schemas/flights_schema.py:3-34``),
``airlines`` and ``airports`` (dimension sources, ``airlines_schema.py:3-6``
/ ``airports_schema.py:4-12``) — as parquet the flight-gold catalog
queries and their DuckDB oracles BOTH read, putting the reference's own
domain analytics under the driver's hash gate.

Same determinism contract as ``sources/synthetic.py``: every value is a
pure function of ``(row_index, channel)`` via the stateless splitmix64
finalizer — regeneration on any machine reproduces the committed files
value-for-value (pinned by ``tests/test_flights_fixture.py``).  Channel
salts stride like the synthetic connector's so no two channels share a
hash stream.

Dirty-data coverage baked in (FIXTURES.md):

* ~0.5% flights carry day 29-31 — some real dates (Jan 29), some
  calendar-invalid (Feb 30) exercising ``try_to_date`` null-handling;
* ~1% inconsistent ``day_of_week`` values (the reference's Sunday=1 bug
  surface — the engine takes DOW from dim_date instead);
* ~0.5% airline codes and ~0.5% airport codes unknown to the dims
  (inner-join drops), ~0.3% origin==destination rows (filtered);
* ~1% exact-duplicate rows and ~0.5% duplicates on the fact dedup key
  with differing measures but a decisive ``scheduled_departure``
  tiebreak (canonical_dedup determinism);
* every departure-delay bucket edge (≤0, 1-15, 16-60, 61-180, >180) and
  distance bucket edge (≤500, 501-1500, >1500) is present;
* dimension sources carry duplicate and NULL iata codes (dedup +
  isNotNull coverage).

Route/airport popularity is cubic-skewed so a handful of routes clear
the reference's ≥100-flight significance floor while most do not.
"""

from __future__ import annotations

import os

#: Rows in the base flights table (before the appended duplicates).
N_FLIGHTS = 20_000
N_EXACT_DUPS = 200
N_KEY_DUPS = 100

N_AIRPORTS = 322
N_TAILS = 800

#: (iata_code, carrier) pool — FIXTURES.md §2.
AIRLINES = (
    ("AA", "American Airlines Inc."),
    ("DL", "Delta Air Lines Inc."),
    ("UA", "United Air Lines Inc."),
    ("WN", "Southwest Airlines Co."),
    ("B6", "JetBlue Airways"),
    ("AS", "Alaska Airlines Inc."),
    ("NK", "Spirit Air Lines"),
    ("F9", "Frontier Airlines Inc."),
    ("HA", "Hawaiian Airlines Inc."),
    ("VX", "Virgin America"),
    ("OO", "Skywest Airlines Inc."),
    ("EV", "Atlantic Southeast Airlines"),
    ("MQ", "American Eagle Airlines Inc."),
    ("US", "US Airways Inc."),
)

_STATES = ("CA", "TX", "NY", "FL", "IL", "WA", "GA", "CO", "AZ", "NC")

#: Redirects the whole flight-domain family (Spark loaders AND the
#: DuckDB oracle SQL, which interpolates FIXTURE_DIR at import time) to
#: an alternate fixture directory.  Must be set BEFORE the plans modules
#: import — the robustness sweep sets it in a subprocess to run the
#: flight queries against adversarially mutated fixtures (r11 verdict
#: item 4).  Unset (the driver, tests, benches): the committed fixture.
FIXTURE_DIR_ENV = "SPARK_GRAFT_FLIGHTS_FIXTURE_DIR"

#: Fixture directory: ``<repo>/fixtures/flights`` (files are committed;
#: ensure_flights_fixture regenerates them only if missing).
FIXTURE_DIR = os.environ.get(FIXTURE_DIR_ENV) or os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "fixtures",
    "flights",
)


def _mix(idx, salt: int):
    """splitmix64 finalizer over an index array (sources/synthetic.py)."""
    import numpy as np

    x = idx.astype(np.uint64) + np.uint64((salt * 0x9E3779B97F4A7C15) % (1 << 64))
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def _airport_code(i: int) -> str:
    """Unique 3-letter code per index (base-26)."""
    return (
        chr(65 + (i // 676) % 26) + chr(65 + (i // 26) % 26) + chr(65 + i % 26)
    )


def gen_airlines():
    """14 carriers + 2 duplicate codes + 1 NULL code (dedup coverage).

    Duplicate rows sort AFTER the canonical row under canonical_dedup's
    ``order_by=["airline"]``, so the originals always survive."""
    import pyarrow as pa

    codes = [c for c, _ in AIRLINES] + ["AA", "DL", None]
    names = [n for _, n in AIRLINES] + [
        "Zz Duplicate American Carrier",
        "Zz Duplicate Delta Carrier",
        "Null-Code Carrier",
    ]
    return pa.table({"iata_code": pa.array(codes, pa.string()),
                     "airline": pa.array(names, pa.string())})


def gen_airports():
    """322 airports + 2 duplicate codes + 1 NULL code; lat/long are
    2-decimal doubles (exactly representable scaled ints)."""
    import numpy as np
    import pyarrow as pa

    idx = np.arange(N_AIRPORTS, dtype=np.uint64)
    lat_q = _mix(idx, 101) % np.uint64(5500)   # 17.00 .. 71.99
    lon_q = _mix(idx, 102) % np.uint64(11200)  # -176.00 .. -64.01
    null_city = _mix(idx, 103) % np.uint64(100) < np.uint64(1)
    null_state = _mix(idx, 104) % np.uint64(100) < np.uint64(1)
    null_lat = _mix(idx, 105) % np.uint64(100) < np.uint64(2)
    null_lon = _mix(idx, 106) % np.uint64(100) < np.uint64(2)

    codes = [_airport_code(i) for i in range(N_AIRPORTS)]
    names = [f"{codes[i]} International Airport" for i in range(N_AIRPORTS)]
    cities = [None if null_city[i] else f"City {codes[i]}" for i in range(N_AIRPORTS)]
    states = [
        None if null_state[i] else _STATES[int(_mix(idx[i : i + 1], 107)[0]) % len(_STATES)]
        for i in range(N_AIRPORTS)
    ]
    lats = [None if null_lat[i] else 17.0 + int(lat_q[i]) / 100.0 for i in range(N_AIRPORTS)]
    lons = [None if null_lon[i] else -176.0 + int(lon_q[i]) / 100.0 for i in range(N_AIRPORTS)]

    codes += [codes[0], codes[1], None]
    names += ["Zz Duplicate Airport A", "Zz Duplicate Airport B", "Null-Code Field"]
    cities += ["Dup City", "Dup City", None]
    states += ["CA", "TX", None]
    lats += [17.5, 18.5, None]
    lons += [-100.25, -101.25, None]

    return pa.table(
        {
            "iata_code": pa.array(codes, pa.string()),
            "airline": pa.array(names, pa.string()),  # reference's (sic) name col
            "city": pa.array(cities, pa.string()),
            "state": pa.array(states, pa.string()),
            "country": pa.array(["USA"] * len(codes), pa.string()),
            "latitude": pa.array(lats, pa.float64()),
            "longitude": pa.array(lons, pa.float64()),
        }
    )


def _skewed_airport(h, n: int):
    """Cubic-skewed airport index: heavy traffic on low indices so some
    routes clear the ≥100-flight floor at 20k rows."""
    import numpy as np

    u = (h % np.uint64(1_000_000)).astype(np.float64) / 1_000_000.0
    return np.minimum((u * u * u * n).astype(np.int64), n - 1)


def _hhmm(h):
    import numpy as np

    return ((h % np.uint64(24)) * np.uint64(100) + (_mix_u(h) % np.uint64(60))).astype(
        np.int64
    )


def _mix_u(h):
    """One more splitmix round on an already-mixed stream."""
    import numpy as np

    x = h * np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    return x


def _null_mask(idx, salt: int, per_mille: int):
    import numpy as np

    return _mix(idx, salt) % np.uint64(1000) < np.uint64(per_mille)


def _int_col(vals, mask=None):
    import pyarrow as pa

    return pa.array(
        [None if (mask is not None and mask[i]) else int(vals[i]) for i in range(len(vals))],
        pa.int32(),
    )


def gen_flights(n: int = N_FLIGHTS):
    """Base flights + exact duplicates + key duplicates, FIXTURES.md §1."""
    import numpy as np
    import pyarrow as pa

    idx = np.arange(n, dtype=np.uint64)

    month = (_mix(idx, 1) % np.uint64(12)).astype(np.int64) + 1
    day = (_mix(idx, 2) % np.uint64(28)).astype(np.int64) + 1
    # ~0.5% rows draw day 29-31 (mix of valid and calendar-invalid).
    hi_day = _null_mask(idx, 3, 5)
    day = np.where(hi_day, 29 + (_mix(idx, 4) % np.uint64(3)).astype(np.int64), day)

    # day_of_week consistent with the (valid) date, Monday=1; ~1% rows
    # deliberately inconsistent; invalid dates get an arbitrary value.
    import datetime as dt

    dow = np.empty(n, dtype=np.int64)
    valid = np.empty(n, dtype=bool)
    for i in range(n):
        try:
            d = dt.date(2015, int(month[i]), int(day[i]))
            dow[i] = d.isoweekday()
            valid[i] = True
        except ValueError:
            dow[i] = int(_mix(idx[i : i + 1], 5)[0] % 7) + 1
            valid[i] = False
    inconsistent = _null_mask(idx, 6, 10)
    dow = np.where(inconsistent, (dow % 7) + 1, dow)

    airline_i = (_mix(idx, 7) % np.uint64(len(AIRLINES))).astype(np.int64)
    airline = np.array([c for c, _ in AIRLINES])[airline_i]
    unknown_al = _null_mask(idx, 8, 5)
    airline = np.where(unknown_al, np.array(["XX", "QQ"])[(_mix(idx, 9) % np.uint64(2)).astype(np.int64)], airline)

    flight_number = (_mix(idx, 10) % np.uint64(7999)).astype(np.int64) + 1
    tail_i = (_mix(idx, 11) % np.uint64(N_TAILS)).astype(np.int64)
    tails = np.array(
        [
            "N"
            + f"{int(_mix(np.array([t], dtype=np.uint64), 12)[0] % 1000):03d}"
            + _airport_code(t)[:2]
            for t in range(N_TAILS)
        ]
    )
    tail_number = tails[tail_i]

    origin_i = _skewed_airport(_mix(idx, 13), N_AIRPORTS)
    dest_i = _skewed_airport(_mix(idx, 14), N_AIRPORTS)
    dest_i = np.where(dest_i == origin_i, (dest_i + 1) % N_AIRPORTS, dest_i)
    codes = np.array([_airport_code(i) for i in range(N_AIRPORTS)])
    origin = codes[origin_i]
    dest = codes[dest_i]
    unknown_ap = _null_mask(idx, 15, 5)
    origin = np.where(unknown_ap, "ZZZ", origin)
    same_od = _null_mask(idx, 16, 3)
    dest = np.where(same_od, origin, dest)

    sched_dep = _hhmm(_mix(idx, 17))
    dep_time = _hhmm(_mix(idx, 18))
    # Right-skewed departure delay in -30..600.
    u = (_mix(idx, 19) % np.uint64(1000)).astype(np.float64) / 1000.0
    dep_delay = (-30 + (630 * u * u * u)).astype(np.int64)
    # Force every bucket edge (FIXTURES.md): ≤0 | 1-15 | 16-60 | 61-180 | >180.
    edges = np.array([-30, 0, 1, 15, 16, 60, 61, 180, 181, 600], dtype=np.int64)
    dep_delay[: len(edges)] = edges
    taxi_out = (_mix(idx, 20) % np.uint64(58)).astype(np.int64) + 3
    wheels_off = _hhmm(_mix(idx, 21))
    sched_time = (_mix(idx, 22) % np.uint64(471)).astype(np.int64) + 30
    elapsed = (_mix(idx, 23) % np.uint64(526)).astype(np.int64) + 25
    air_time = (_mix(idx, 24) % np.uint64(481)).astype(np.int64) + 20
    distance = (_mix(idx, 25) % np.uint64(2951)).astype(np.int64) + 50
    dist_edges = np.array([50, 500, 501, 1500, 1501, 3000], dtype=np.int64)
    distance[10 : 10 + len(dist_edges)] = dist_edges
    wheels_on = _hhmm(_mix(idx, 26))
    taxi_in = (_mix(idx, 27) % np.uint64(39)).astype(np.int64) + 2
    sched_arr = _hhmm(_mix(idx, 28))
    arr_time = _hhmm(_mix(idx, 29))
    ua = (_mix(idx, 30) % np.uint64(1000)).astype(np.float64) / 1000.0
    arr_delay = (-40 + (660 * ua * ua * ua)).astype(np.int64)
    diverted = (_null_mask(idx, 31, 2)).astype(np.int64)
    cancelled = (_null_mask(idx, 32, 15)).astype(np.int64)
    cxl_reason = np.array(["A", "B", "C", "D"])[(_mix(idx, 33) % np.uint64(4)).astype(np.int64)]

    big_arr_delay = arr_delay > 15
    cause = lambda salt, hi: (_mix(idx, salt) % np.uint64(hi)).astype(np.int64)

    n_tail = _null_mask(idx, 40, 10)
    n_fn = _null_mask(idx, 41, 2)
    n_o = _null_mask(idx, 42, 3)
    n_d = _null_mask(idx, 43, 3)
    n_dt = _null_mask(idx, 44, 20)
    n_dd = _null_mask(idx, 45, 20)
    n_to = _null_mask(idx, 46, 20)
    n_wo = _null_mask(idx, 47, 20)
    n_st = _null_mask(idx, 48, 1)
    n_el = _null_mask(idx, 49, 20)
    n_at = _null_mask(idx, 50, 20)
    n_wn = _null_mask(idx, 51, 20)
    n_ti = _null_mask(idx, 52, 20)
    n_ar = _null_mask(idx, 53, 20)
    n_ad = _null_mask(idx, 54, 25)
    cause_present = big_arr_delay & ~_null_mask(idx, 55, 200)

    def _str_col(vals, mask=None):
        import pyarrow as pa

        return pa.array(
            [None if (mask is not None and mask[i]) else str(vals[i]) for i in range(n)],
            pa.string(),
        )

    cols = {
        "year": _int_col(np.full(n, 2015, dtype=np.int64)),
        "month": _int_col(month),
        "day": _int_col(day),
        "day_of_week": _int_col(dow),
        "airline": _str_col(airline),
        "flight_number": _int_col(flight_number, n_fn),
        "tail_number": _str_col(tail_number, n_tail),
        "origin_airport": _str_col(origin, n_o),
        "destination_airport": _str_col(dest, n_d),
        "scheduled_departure": _int_col(sched_dep),
        "departure_time": _int_col(dep_time, n_dt),
        "departure_delay": _int_col(dep_delay, n_dd),
        "taxi_out": _int_col(taxi_out, n_to),
        "wheels_off": _int_col(wheels_off, n_wo),
        "scheduled_time": _int_col(sched_time, n_st),
        "elapsed_time": _int_col(elapsed, n_el),
        "air_time": _int_col(air_time, n_at),
        "distance": _int_col(distance),
        "wheels_on": _int_col(wheels_on, n_wn),
        "taxi_in": _int_col(taxi_in, n_ti),
        "scheduled_arrival": _int_col(sched_arr),
        "arrival_time": _int_col(arr_time, n_ar),
        "arrival_delay": _int_col(arr_delay, n_ad),
        "diverted": _int_col(diverted),
        "cancelled": _int_col(cancelled),
        "cancellation_reason": _str_col(cxl_reason, cancelled == 0),
        "air_system_delay": _int_col(cause(56, 200), ~cause_present),
        "security_delay": _int_col(cause(57, 60), ~cause_present),
        "airline_delay": _int_col(cause(58, 300), ~cause_present),
        "late_aircraft_delay": _int_col(cause(59, 300), ~cause_present),
        "weather_delay": _int_col(cause(60, 300), ~cause_present),
    }
    import pyarrow as pa

    base = pa.table(cols)

    # ~1% exact duplicates: whole rows copied verbatim.
    dup_idx = (_mix(np.arange(N_EXACT_DUPS, dtype=np.uint64), 70) % np.uint64(n)).astype(
        np.int64
    )
    exact_dups = base.take(pa.array(dup_idx))

    # ~0.5% duplicates on the dedup business key with DIFFERING measures
    # and a decisive scheduled_departure tiebreak (+7 wraps mod 2360, so
    # it always differs from the source row's value).
    stratum = n // N_KEY_DUPS
    kidx = np.arange(N_KEY_DUPS, dtype=np.uint64)
    ksrc = (
        np.arange(N_KEY_DUPS, dtype=np.int64) * stratum
        + (_mix(kidx, 71) % np.uint64(stratum)).astype(np.int64)
    )
    kd = base.take(pa.array(ksrc)).to_pydict()
    for i in range(N_KEY_DUPS):
        sd = kd["scheduled_departure"][i]
        kd["scheduled_departure"][i] = (sd + 7) % 2360 if sd is not None else 7
        for c in ("departure_delay", "arrival_delay", "taxi_out", "distance"):
            v = kd[c][i]
            kd[c][i] = (v + 11) % 600 if v is not None else 11
    key_dups = pa.table({k: pa.array(v, base.schema.field(k).type) for k, v in kd.items()})

    return pa.concat_tables([base, exact_dups, key_dups])


def ensure_flights_fixture(fixture_dir: str = FIXTURE_DIR) -> dict[str, str]:
    """Write the three fixture parquet files if absent; return paths.

    The committed files ARE the fixture; this regenerates them only when
    missing (fresh clone without fixtures).  Determinism between the
    generator and the committed bytes' VALUES is pinned by
    ``tests/test_flights_fixture.py``."""
    import pyarrow.parquet as pq

    overridden = bool(os.environ.get(FIXTURE_DIR_ENV))
    os.makedirs(fixture_dir, exist_ok=True)
    paths = {}
    for name, gen in (
        ("flights", gen_flights),
        ("airlines", gen_airlines),
        ("airports", gen_airports),
    ):
        p = os.path.join(fixture_dir, f"{name}.parquet")
        if not os.path.exists(p):
            if overridden:
                # An override points at PRE-BUILT (e.g. mutated) files; a
                # missing one means a typo'd path — regenerating CLEAN
                # data there would silently turn a hostile-data sweep
                # into a clean-data false pass.
                raise FileNotFoundError(
                    f"{FIXTURE_DIR_ENV} is set but {p} does not exist"
                )
            pq.write_table(gen(), p)
        paths[name] = p
    return paths


if __name__ == "__main__":
    print(ensure_flights_fixture())
