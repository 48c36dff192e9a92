"""Table-IO routing (sources/catalog.py).

The sandbox ships no Iceberg runtime jar, so the Iceberg arms can never
execute against a real catalog here (round-3 verdict item #4: they were dead
code under test). These tests pin the ROUTING CONTRACT with stub objects —
which arm each ref shape takes, and the exact call chains each arm makes
(format("iceberg").load / writeTo(...).using("iceberg").createOrReplace, and
the bucketed repartition fallback) — so a refactor cannot silently break the
production path even though the jar itself is absent. Execution against a
live Iceberg catalog remains designed-for-but-unexercised-in-sandbox, as the
module docstring states.
"""

from types import SimpleNamespace

from ch_pdf_parse_spark.sources import catalog


class _Recorder:
    def __init__(self, calls):
        self.calls = calls

    def format(self, f):
        self.calls.append(("format", f))
        return self

    def load(self, ref):
        self.calls.append(("load", ref))
        return "ICEBERG_DF"

    def parquet(self, ref):
        self.calls.append(("parquet", ref))
        return "PARQUET_DF"


def test_read_routes_table_name_to_iceberg(monkeypatch):
    monkeypatch.setattr(catalog, "iceberg_available", lambda s: True)
    calls = []
    spark = SimpleNamespace(read=_Recorder(calls))
    out = catalog.read_table(spark, "cat.db.documents")
    assert out == "ICEBERG_DF"
    assert calls == [("format", "iceberg"), ("load", "cat.db.documents")]


def test_read_falls_back_to_parquet_for_paths_and_missing_runtime(monkeypatch):
    calls = []
    spark = SimpleNamespace(read=_Recorder(calls))
    # a path ref never routes to iceberg even when available
    monkeypatch.setattr(catalog, "iceberg_available", lambda s: True)
    assert catalog.read_table(spark, "/data/x.parquet") == "PARQUET_DF"
    # a table name degrades to parquet when the runtime is absent
    monkeypatch.setattr(catalog, "iceberg_available", lambda s: False)
    assert catalog.read_table(spark, "cat.db.documents") == "PARQUET_DF"
    assert calls == [("parquet", "/data/x.parquet"),
                     ("parquet", "cat.db.documents")]


class _FakeWriteDF:
    def __init__(self, calls, columns=("doc_id", "spans")):
        self.calls = calls
        self.columns = list(columns)
        self.sparkSession = SimpleNamespace()

    def writeTo(self, ref):
        self.calls.append(("writeTo", ref))
        return self

    def using(self, fmt):
        self.calls.append(("using", fmt))
        return self

    def createOrReplace(self):
        self.calls.append(("createOrReplace",))

    def repartition(self, n, col):
        self.calls.append(("repartition", n, col))
        return self

    @property
    def write(self):
        return self

    def mode(self, m):
        self.calls.append(("mode", m))
        return self

    def parquet(self, ref):
        self.calls.append(("parquet", ref))


def test_write_routes_table_name_to_iceberg(monkeypatch):
    monkeypatch.setattr(catalog, "iceberg_available", lambda s: True)
    calls = []
    catalog.write_table(_FakeWriteDF(calls), "cat.db.out")
    assert calls == [("writeTo", "cat.db.out"), ("using", "iceberg"),
                     ("createOrReplace",)]


def test_write_parquet_fallback_keeps_bucket_colocation(monkeypatch):
    """The parquet arm must preserve the bucket(doc_id, N) CONTRACT the scale
    story leans on: repartition(N, doc_id) before the write."""
    monkeypatch.setattr(catalog, "iceberg_available", lambda s: False)
    calls = []
    catalog.write_table(_FakeWriteDF(calls), "/out/t", buckets=16)
    assert calls == [("repartition", 16, "doc_id"), ("mode", "overwrite"),
                     ("parquet", "/out/t")]
    # no bucket column present -> plain write, no repartition
    calls2 = []
    catalog.write_table(_FakeWriteDF(calls2, columns=("a",)), "/out/t2")
    assert calls2 == [("mode", "overwrite"), ("parquet", "/out/t2")]


def test_iceberg_available_is_false_in_sandbox(spark):
    assert catalog.iceberg_available(spark) is False
