import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ch_pdf_parse_spark import fixtures  # noqa: E402
from ch_pdf_parse_spark.session import get_spark  # noqa: E402

TEST_SF = 0.003  # ~12 docs, incl. layouts of both column counts


@pytest.fixture(scope="session")
def spark():
    s = get_spark("ch-pdf-parse-tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_dir(tmp_path_factory):
    base = str(tmp_path_factory.mktemp("fixtures"))
    return fixtures.write_corpus(TEST_SF, base=base)


@pytest.fixture(scope="session")
def docs_df(spark, corpus_dir):
    return spark.read.parquet(os.path.join(corpus_dir, "documents.parquet"))
