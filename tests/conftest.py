from __future__ import annotations

import pytest

from zparse_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="zparse_spark_tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"


def make_docs(spark, rows):
    """rows: list of (doc_id, spans, partition); spans: list of
    (kind, text, media_ref, offset) tuples."""
    from zparse_spark.schema import DOCUMENTS_SCHEMA

    data = [
        (doc_id, [tuple(s) for s in spans] if spans is not None else None, part)
        for doc_id, spans, part in rows
    ]
    return spark.createDataFrame(data, DOCUMENTS_SCHEMA)
