"""Hot-key skew A/B for the as-of join: plain (key-partitioned) merge vs
the bucketed (key, time-bucket) variant on a corpus where ONE key owns ~90%
of both streams — the exact shape `asof_join_bucketed` exists for.

The plain merge puts the hot key's entire timeline into one window
partition (one task sorts it all, 31 cores idle); the bucketed variant
spreads it over its active time-buckets. Equality of the two paths is
pytest-pinned at small scale (tests/test_asof.py); this tool measures the
wall-clock consequence at a size where the skew dominates, and
cross-checks the two outputs with an aggregate fingerprint (count + sums)
so the timed runs are provably computing the same join.

Usage: python tools/bench_asof.py [n_left] [n_right]   (defaults 4M / 400k)
Prints one JSON line; recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

HOT_USER = 1
# cold user id = (id % COLD_USER_MOD) + 2, assigned only on the id%10==0
# subsequence — so the modulus yields COLD_USER_MOD/10 = 1,000 DISTINCT cold
# users (multiples of 10 only), not 10,000; the recorded BENCH numbers were
# measured on exactly this corpus (review finding, round 5: the old
# N_COLD_USERS name overstated the cold-key cardinality 10x)
COLD_USER_MOD = 10_000
SPAN_SECONDS = 30 * 86_400  # 30-day event horizon
BUCKET_SECONDS = 6 * 3600   # hot key spreads over ~120 active buckets


def _stream(spark, n: int, id_base: int):
    """Deterministic skewed stream: ~90% of rows belong to HOT_USER, the
    rest spread over 1,000 cold users; timestamps cover SPAN_SECONDS."""
    return (
        spark.range(n)
        .select(
            (F.col("id") + id_base).alias("event_id"),
            F.when(F.col("id") % 10 == 0,
                   (F.col("id") % COLD_USER_MOD) + 2)
            .otherwise(F.lit(HOT_USER)).alias("user_id"),
            F.timestamp_seconds(
                F.lit(1_700_000_000)
                + (F.col("id") * 1_103_515_245 + 12_345) % SPAN_SECONDS
            ).alias("ts"),
            (F.col("id") % 1000).cast("double").alias("value"),
        )
    )


def _fingerprint(df) -> tuple:
    row = df.agg(
        F.count("*").alias("n"),
        F.count("ref_event_id").alias("n_matched"),
        F.sum("ref_event_id").alias("s_id"),
        F.sum(F.col("ref_value").cast("decimal(38,6)")).alias("s_val"),
    ).collect()[0]
    return (row.n, row.n_matched, row.s_id, str(row.s_val))


def main() -> None:
    n_left = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    n_right = int(sys.argv[2]) if len(sys.argv) > 2 else 400_000

    from ch_pdf_parse_spark.operators.asof import asof_join, asof_join_bucketed
    from ch_pdf_parse_spark.session import get_spark

    spark = get_spark("bench-asof", cores=32, shuffle_partitions=128)
    try:
        left = _stream(spark, n_left, 0).select("event_id", "user_id", "ts")
        right = _stream(spark, n_right, 10_000_000).select(
            "user_id", "ts",
            F.col("event_id").alias("ref_event_id"),
            F.col("value").alias("ref_value"))
        # materialize inputs so generation cost is out of the timed region
        left = left.persist(); right = right.persist()
        left.count(); right.count()

        out = {"n_left": n_left, "n_right": n_right,
               "hot_share": 0.9, "bucket_seconds": BUCKET_SECONDS}
        fps = {}
        for name, fn in (
            ("plain", lambda: asof_join(left, right, on="user_id", ts="ts")),
            ("bucketed", lambda: asof_join_bucketed(
                left, right, on="user_id", ts="ts",
                bucket_seconds=BUCKET_SECONDS)),
        ):
            best = None
            for _ in range(2):
                t0 = time.monotonic()
                fps[name] = _fingerprint(fn())
                wall = time.monotonic() - t0
                best = wall if best is None else min(best, wall)
            out[f"wall_{name}_sec"] = round(best, 2)
        assert fps["plain"] == fps["bucketed"], fps
        out["fingerprints_equal"] = True
        out["speedup"] = round(out["wall_plain_sec"] / out["wall_bucketed_sec"], 2)
        print(json.dumps(out))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
