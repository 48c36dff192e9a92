"""As-of join: independent recomputation + hostile-shape unit cases.

The driver-facing oracle is DuckDB's native ASOF LEFT JOIN
(operators/asof.py); here the SPARK result is additionally checked against
pandas.merge_asof — a third, unrelated implementation — on the real driver
table, and against hand-built hostile inputs (duplicate references at one
timestamp, equal-ts tie, no predecessor, NULL reference values) whose
expected outputs are written out by hand.
"""

import datetime as dt

import pandas as pd
import pytest

from pyspark.sql import functions as F

from ch_pdf_parse_spark.operators.asof import asof_join, j_asof_join

SF = "/root/testdata/sf0.001"

_T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ts(minutes):
    return _T0 + dt.timedelta(minutes=minutes)


def _run(spark, left_rows, right_rows):
    left = spark.createDataFrame(
        left_rows, "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        right_rows, "user_id long, ts timestamp, ref_event_id long, "
        "ref_value double")
    out = asof_join(left, right, on="user_id", ts="ts")
    return {r.event_id: (r.ref_event_id, r.ref_value, r.ref_ts)
            for r in out.collect()}


def test_matches_pandas_merge_asof_on_driver_table(spark):
    got = j_asof_join(spark, SF).toPandas().sort_values("event_id")

    ev = pd.read_parquet(SF + "/events.parquet")
    ev = ev[ev.user_id.notna() & ev.ts.notna()]
    l = (ev[ev.event_type == "purchase"][["event_id", "user_id", "ts"]]
         .sort_values("ts", kind="mergesort"))
    r = ev[ev.event_type == "view"].rename(
        columns={"event_id": "ref_event_id", "value": "ref_value"})
    # same keeper the engine designates among duplicate (user_id, ts) refs:
    # row-wise max by (ref_event_id, ref_value) with NULLs losing
    # (na_position="first" + keep="last")
    r = (r.sort_values(["ref_event_id", "ref_value"], na_position="first")
         .drop_duplicates(subset=["user_id", "ts"], keep="last")
         [["user_id", "ts", "ref_event_id", "ref_value"]]
         .sort_values("ts", kind="mergesort"))
    r["ref_ts"] = r["ts"]
    want = pd.merge_asof(l, r, on="ts", by="user_id",
                         direction="backward",
                         allow_exact_matches=True).sort_values("event_id")

    assert len(got) == len(want) > 0
    for g, w in zip(got.itertuples(), want.itertuples()):
        assert g.event_id == w.event_id
        for col in ("ref_event_id", "ref_value", "ref_ts"):
            gv, wv = getattr(g, col), getattr(w, col)
            assert (pd.isna(gv) and pd.isna(wv)) or gv == wv, (
                g.event_id, col, gv, wv)


def test_basic_predecessor_and_equal_ts_tie(spark):
    out = _run(
        spark,
        [(10, 1, _ts(30)), (11, 1, _ts(5)), (12, 2, _ts(30))],
        [(1, _ts(10), 100, 1.5), (1, _ts(30), 101, 2.5),
         (2, _ts(40), 102, 9.9)],
    )
    # at-or-before: the ts(30) purchase takes the ts(30) view, not ts(10)
    assert out[10] == (101, 2.5, _ts(30))
    # no view at-or-before ts(5) -> left-outer NULLs
    assert out[11] == (None, None, None)
    # user 2's only view is AFTER the purchase
    assert out[12] == (None, None, None)


def test_duplicate_reference_keeper_is_max(spark):
    # three views share (user, ts): keeper = max (ref_event_id, ref_value),
    # the contract both engines pin (NULL id sorts below any non-null)
    out = _run(
        spark,
        [(10, 1, _ts(60))],
        [(1, _ts(20), 7, 1.0), (1, _ts(20), 9, 2.0),
         (1, _ts(20), None, 99.0)],
    )
    assert out[10] == (9, 2.0, _ts(20))


def test_null_reference_value_carries_through(spark):
    out = _run(spark, [(10, 1, _ts(60))], [(1, _ts(20), 7, None)])
    assert out[10] == (7, None, _ts(20))


def test_negative_zero_reference_value_canonicalized(spark):
    out = _run(spark, [(10, 1, _ts(60))], [(1, _ts(20), 7, -0.0)])
    import math

    val = out[10][1]
    assert val == 0.0 and math.copysign(1.0, val) == 1.0


def _sorted_rows(df):
    return sorted(map(tuple, df.collect()))


def test_bucketed_asof_equals_plain_on_driver_table(spark):
    """The skew-hardened (key, time-bucket) variant must be row-identical to
    the plain merge on the real driver table, at a bucket width small enough
    (1 h) that carries actually happen across the 30-day span."""
    from ch_pdf_parse_spark.operators.asof import asof_join_bucketed

    ev = (spark.read.parquet(SF + "/events.parquet")
          .where(F.col("user_id").isNotNull() & F.col("ts").isNotNull()))
    left = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts")
    right = ev.where(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("ref_event_id"),
        F.col("value").alias("ref_value"))
    plain = asof_join(left, right, on="user_id", ts="ts")
    bucketed = asof_join_bucketed(left, right, on="user_id", ts="ts",
                                  bucket_seconds=3600)
    a, b = _sorted_rows(plain), _sorted_rows(bucketed)
    assert len(a) == len(b) > 0
    assert a == b


def test_bucketed_asof_equals_plain_on_hot_key(spark):
    """One user owns almost every event (the skew case the variant exists
    for), with views sparse enough that most buckets depend on the carry."""
    from ch_pdf_parse_spark.operators.asof import asof_join_bucketed

    lrows = [(i, 1 if i % 50 else 2, _ts(i * 7)) for i in range(400)]
    rrows = [(1, _ts(j * 97), 1000 + j, float(j)) for j in range(12)]
    left = spark.createDataFrame(
        lrows, "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        rrows, "user_id long, ts timestamp, ref_event_id long, "
        "ref_value double")
    plain = asof_join(left, right, on="user_id", ts="ts")
    bucketed = asof_join_bucketed(left, right, on="user_id", ts="ts",
                                  bucket_seconds=600)
    assert _sorted_rows(plain) == _sorted_rows(bucketed)


def test_sessionize_gap_semantics(spark):
    """Hand-built gap cases: >30 min splits, exactly 30 min does NOT
    (strict >), per-user independence, and session stats."""
    from ch_pdf_parse_spark.operators.asof import a_sessionize_events
    import os
    import tempfile

    rows = [
        # user 1: t0, +10m (same session), +41m (gap 31 -> new session)
        (1, 1, _ts(0), "view", 1.0, None),
        (2, 1, _ts(10), "view", 2.0, None),
        (3, 1, _ts(41), "view", 4.0, None),
        # user 2: exactly 30-minute gap stays ONE session
        (4, 2, _ts(0), "view", 8.0, None),
        (5, 2, _ts(30), "view", 16.0, None),
        # null ts: excluded by contract
        (6, 1, None, "view", 99.0, None),
    ]
    tmp = tempfile.mkdtemp(prefix="sessionize_")
    spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, "
        "event_type string, value double, props string"
    ).write.mode("overwrite").parquet(os.path.join(tmp, "events.parquet"))

    got = {(r.user_id, r.session_id):
           (r.n_events, r.session_start, r.session_end, r.total_value)
           for r in a_sessionize_events(spark, tmp).collect()}
    assert got == {
        (1, 1): (2, _ts(0), _ts(10), 3.0),
        (1, 2): (1, _ts(41), _ts(41), 4.0),
        (2, 1): (2, _ts(0), _ts(30), 24.0),
    }


def test_sessionize_matches_builtin_session_window(spark):
    """Third-implementation check on the real driver table: the window-
    composition sessionizer must agree with Spark's built-in
    F.session_window aggregation. The built-in splits at gap >= G ([start,
    end) windows) while the operator splits at gap > 30min (strict, the
    DuckDB-oracle-friendly contract), so the built-in runs with
    G = 30min + 1µs — identical semantics at the data's microsecond
    granularity."""
    from ch_pdf_parse_spark.operators.asof import a_sessionize_events

    sf = "/root/testdata/sf0.001"
    mine = a_sessionize_events(spark, sf).select(
        "user_id", "n_events", "session_start", "session_end").collect()
    ev = (spark.read.parquet(sf + "/events.parquet")
          .where(F.col("ts").isNotNull()))
    from ch_pdf_parse_spark.operators.asof import SESSION_GAP_STREAM

    ref = (ev.groupBy(F.session_window("ts", SESSION_GAP_STREAM),
                      "user_id")
           .agg(F.count("*").alias("n_events"),
                F.min("ts").alias("session_start"),
                F.max("ts").alias("session_end"))
           .select("user_id", "n_events", "session_start", "session_end")
           .collect())
    key = lambda r: (r.user_id, r.n_events, r.session_start, r.session_end)
    assert sorted(map(key, mine)) == sorted(map(key, ref))
    assert len(mine) > 0


def test_left_duplicates_get_identical_matches(spark):
    out_rows = asof_join(
        spark.createDataFrame(
            [(10, 1, _ts(30)), (10, 1, _ts(30))],
            "event_id long, user_id long, ts timestamp"),
        spark.createDataFrame(
            [(1, _ts(10), 100, 1.5)],
            "user_id long, ts timestamp, ref_event_id long, ref_value double"),
        on="user_id", ts="ts").collect()
    assert len(out_rows) == 2
    assert out_rows[0] == out_rows[1]
    assert out_rows[0].ref_event_id == 100
