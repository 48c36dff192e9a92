"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship end-to-end extraction (SURVEY.md §3.1) on
the deterministic synthetic interleaved-documents corpus (BASELINE.json
``input_hint`` schema; synthesized per north rule — no external data) at the
smallest scale. ``queries()`` / ``oracle_sql()`` expose one entry per
implemented SURVEY.md §2 operator; SQL-expressible ones carry a DuckDB oracle
twin over the driver's sf tables.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ch_pdf_parse_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: per-document span extraction + markdown fold at sf0.001."""
    return registry.extract_spans(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
