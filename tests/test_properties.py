"""Property-based tests (hypothesis): the OHLC tie-break contract and
session-window merge semantics against brute-force Python models, on
randomized inputs — the cases the fixed testdata can't be trusted to hit
(intra-second ties, boundary gaps)."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ohlc_spark_streaming_spark.operators.ohlc import ohlc_candles
from ohlc_spark_streaming_spark.operators.sessions import session_aggregate

_BASE = dt.datetime(2024, 1, 1)

# Trades inside a 2-hour span: epoch-second ts (ties likely), price from a
# small grid (ties likely), exercising the lexicographic struct ordering.
_trades = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=7199),  # seconds offset
        st.sampled_from([1.0, 2.0, 2.5, 3.0]),  # price grid
    ),
    min_size=1,
    max_size=40,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_trades)
def test_ohlc_tiebreaks_match_bruteforce(spark, trades):
    rows = [
        (_BASE + dt.timedelta(seconds=s), "SYM", float(p)) for s, p in trades
    ]
    df = spark.createDataFrame(rows, ["ts", "symbol", "price"])
    got = {
        (r.window_start, r.symbol): (r.open, r.high, r.low, r.close, r.n_trades)
        for r in ohlc_candles(
            df, ts_col="ts", symbol_col="symbol", price_col="price",
            qty_col=None, window_duration="1 hour",
        ).collect()
    }

    # Brute-force model: open = price at min ts, ties -> LOWEST price;
    # close = price at max ts, ties -> HIGHEST price (SURVEY §2.4).
    buckets: dict[dt.datetime, list[tuple[dt.datetime, float]]] = {}
    for ts, _, p in rows:
        start = ts.replace(minute=0, second=0, microsecond=0)
        buckets.setdefault(start, []).append((ts, p))
    for start, items in buckets.items():
        o = min(items)[1]
        c = max(items)[1]
        hi = max(p for _, p in items)
        lo = min(p for _, p in items)
        assert got[(start, "SYM")] == (o, hi, lo, c, len(items))
    assert len(got) == len(buckets)


_events = st.lists(
    st.integers(min_value=0, max_value=3600 * 24),  # seconds over a day
    min_size=1,
    max_size=30,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_events)
def test_session_windows_match_bruteforce(spark, offsets):
    gap = dt.timedelta(minutes=30)
    rows = [
        (_BASE + dt.timedelta(seconds=s), 1, 1.0) for s in sorted(offsets)
    ]
    df = spark.createDataFrame(rows, ["ts", "user_id", "value"])
    got = sorted(
        (r.session_start, r.session_end, r.n_events)
        for r in session_aggregate(
            df, ts_col="ts", key_col="user_id", value_col="value",
            gap="30 minutes",
        ).collect()
    )

    # Model: split when diff >= gap; end = last + gap (end-exclusive).
    sessions: list[list[dt.datetime]] = []
    for ts, _, _ in rows:
        if sessions and ts - sessions[-1][-1] < gap:
            sessions[-1].append(ts)
        else:
            sessions.append([ts])
    want = sorted((s[0], s[-1] + gap, len(s)) for s in sessions)
    assert got == want


_asof_rows = st.tuples(
    st.lists(  # left (probe) rows: (ts_offset,)
        st.integers(min_value=0, max_value=100), min_size=1, max_size=15
    ),
    st.lists(  # right (reference) rows: (ts_offset, payload)
        st.tuples(
            st.integers(min_value=0, max_value=100),
            st.integers(min_value=0, max_value=5),
        ),
        min_size=0,
        max_size=15,
    ),
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_asof_rows)
def test_asof_join_matches_bruteforce(spark, data):
    from ohlc_spark_streaming_spark.operators.joins import asof_join

    left_offs, right_rows = data
    left = spark.createDataFrame(
        [("k", _BASE + dt.timedelta(seconds=s), i) for i, s in enumerate(left_offs)],
        ["key", "lts", "row_id"],
    )
    right = spark.createDataFrame(
        [("k", _BASE + dt.timedelta(seconds=s), float(p)) for s, p in right_rows],
        ["key", "rts", "price"],
    ) if right_rows else spark.createDataFrame([], "key string, rts timestamp, price double")

    got = {
        r.row_id: (r.asof_ts, r.asof_price)
        for r in asof_join(
            left, right, on=["key"], left_ts="lts", right_ts="rts",
            right_payload=["price"],
        ).collect()
    }

    # Model: most recent right row with rts <= lts; ties on rts -> the
    # greatest (rts, price) struct, i.e. highest price.
    for i, s in enumerate(left_offs):
        lts = _BASE + dt.timedelta(seconds=s)
        cands = [
            (_BASE + dt.timedelta(seconds=rs), float(p))
            for rs, p in right_rows
            if rs <= s
        ]
        want = max(cands) if cands else (None, None)
        assert got[i] == want, (i, got[i], want)


def test_interval_union_matches_brute_force(spark):
    """interval_union vs direct day-set enumeration on random intervals."""
    import random

    from ohlc_spark_streaming_spark.operators.sessions import interval_union

    rng = random.Random(20260814)
    rows = []
    for k in range(4):
        for _ in range(rng.randrange(1, 15)):
            st = rng.randrange(0, 60)
            rows.append((k, st, st + rng.randrange(0, 12)))
    rows += [(0, 5, 9), (0, 5, 9)]  # exact duplicates must collapse
    df = spark.createDataFrame(rows, "key long, start long, end long")
    got = interval_union(df).collect()

    # Brute force: covered day set per key; islands = maximal runs.
    for k in {r[0] for r in rows}:
        days = set()
        for kk, st, en in rows:
            if kk == k:
                days.update(range(st, en + 1))
        runs = []
        for d in sorted(days):
            if runs and d == runs[-1][1] + 1:
                runs[-1][1] = d
            else:
                runs.append([d, d])
        got_k = sorted(
            (r["island_start"], r["island_end"])
            for r in got
            if r["key"] == k
        )
        assert got_k == [tuple(r) for r in runs], (k, got_k, runs)
        # n_intervals sums to the key's distinct interval count
        n_iv = sum(r["n_intervals"] for r in got if r["key"] == k)
        assert n_iv == len({(st, en) for kk, st, en in rows if kk == k})
