"""Randomized property tests for the temporal/CDC operators (the test_fuzz
pattern: seeded hostile generators, MANY random corpora batched into ONE
Spark job via a composite key, outputs compared row-for-row against an
independent pure-Python implementation).

Shapes the generators force that the hand tests don't: duplicate (key, ts)
references with NULL ids, lefts colliding with rights on ts, -0.0 values,
NULL seq/value/event_type changelog rows, keys whose every change is a
delete, and bucket boundaries landing between a left and its reference.
"""

import datetime as dt
import random

from pyspark.sql import functions as F

from ch_pdf_parse_spark.operators.asof import asof_join, asof_join_bucketed
from ch_pdf_parse_spark.operators.cdc import compact_changelog

_T0 = dt.datetime(2024, 3, 1)

N_CORPORA = 25


def _ts(minutes: float):
    return _T0 + dt.timedelta(minutes=minutes)


def _gen_asof(rng: random.Random, corpus: int):
    """One random as-of corpus under composite key = corpus*100 + user."""
    lefts, rights = [], []
    for user in range(rng.randint(1, 3)):
        key = corpus * 100 + user
        for i in range(rng.randint(0, 6)):
            lefts.append((corpus * 10_000 + len(lefts), key,
                          _ts(rng.randint(0, 500))))
        for j in range(rng.randint(0, 5)):
            rights.append((key, _ts(rng.choice([0, 60, 60, 120, 240,
                                                rng.randint(0, 500)])),
                           rng.choice([None, 9000 + j]),
                           rng.choice([1.5, -0.0, None, 2.25])))
    return lefts, rights


def _python_asof(lefts, rights):
    """Independent reference: per-(key, ts) keeper (max by id/value with
    NULLs losing and -0.0 canonicalized), then latest-at-or-before scan."""
    def canon(v):
        return None if v is None else v + 0.0

    keeper = {}
    for key, ts, rid, rv in rights:
        cand = (rid is not None, rid if rid is not None else -1,
                canon(rv) is not None,
                canon(rv) if canon(rv) is not None else float("-inf"))
        prev = keeper.get((key, ts))
        if prev is None or cand > prev[0]:
            keeper[(key, ts)] = (cand, (rid, canon(rv), ts))
    by_key = {}
    for (key, ts), (_, payload) in keeper.items():
        by_key.setdefault(key, []).append((ts, payload))
    for key in by_key:
        by_key[key].sort(key=lambda x: x[0])
    out = {}
    for eid, key, ts in lefts:
        best = None
        for rts, payload in by_key.get(key, []):
            if rts <= ts:
                best = payload
            else:
                break
        out[eid] = (key, ts) + (best if best else (None, None, None))
    return out


def test_asof_plain_and_bucketed_match_python_reference(spark):
    rng = random.Random(97531)
    all_l, all_r = [], []
    for c in range(N_CORPORA):
        ls, rs = _gen_asof(rng, c)
        all_l += ls
        all_r += rs
    left = spark.createDataFrame(
        all_l, "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        all_r, "user_id long, ts timestamp, ref_event_id long, "
        "ref_value double")
    want = _python_asof(all_l, all_r)

    for tag, df in [
        ("plain", asof_join(left, right, on="user_id", ts="ts")),
        ("bucketed", asof_join_bucketed(left, right, on="user_id", ts="ts",
                                        bucket_seconds=3600)),
    ]:
        got = {r.event_id: (r.user_id, r.ts, r.ref_event_id, r.ref_value,
                            r.ref_ts)
               for r in df.collect()}
        assert set(got) == set(want), tag
        bad = [e for e in want if got[e] != want[e]]
        assert not bad, (tag, bad[:3],
                         [(got[e], want[e]) for e in bad[:3]])


def _gen_cdc(rng: random.Random, corpus: int):
    rows = []
    for _ in range(rng.randint(0, 12)):
        key = corpus * 10 + rng.randint(0, 2)
        rows.append((
            key,
            rng.choice([None, -1, 0, rng.randint(1, 50)]),
            rng.choice(["U", "U", "U", "D"]),
            rng.choice([None, 1.0, -0.0, 3.5]),
            rng.choice([None, "", "a", "b"]),
        ))
    return rows


def _python_cdc(rows):
    state = {}
    for key, seq, op, val, et in rows:
        cval = None if val is None else val + 0.0
        ord_ = (seq is not None, seq if seq is not None else -1,
                cval is not None, cval if cval is not None else -1.0e308,
                et is not None, et if et is not None else "", op)
        if key not in state or ord_ > state[key][0]:
            state[key] = (ord_, (op, seq, cval, et))
    return {k: (p[1], p[2], p[3]) for k, (_, p) in state.items()
            if p[0] != "D"}


def test_cdc_compact_matches_python_reference(spark):
    rng = random.Random(86420)
    rows = []
    for c in range(N_CORPORA * 2):
        rows += _gen_cdc(rng, c)
    ch = spark.createDataFrame(
        rows, "key long, seq long, op string, value double, "
        "event_type string")
    got = {r.key: (r.last_seq, r.value, r.event_type)
           for r in compact_changelog(ch).collect()}
    assert got == _python_cdc(rows)
    assert len(got) > 0
