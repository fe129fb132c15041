"""Shared fixtures: one session-scoped SparkSession (local[*]), tmp stores,
and deterministic mini-corpora (mirrors the reference's conftest isolation:
tmp-dir store + mock embedder, /root/reference/tests/conftest.py:13-39)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mcpvectordb_spark.config import TEST  # noqa: E402
from mcpvectordb_spark.session import get_spark  # noqa: E402
from mcpvectordb_spark.store import ChunkStore  # noqa: E402

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture()
def store(spark, tmp_path):
    return ChunkStore(spark, str(tmp_path / "chunks"), TEST)


@pytest.fixture(scope="session")
def mini_docs(spark):
    """Five handcrafted docs across 2 libraries, incl. a rare exact token
    (the reference's hybrid test uses 'E-4021', test_store.py:694-708)."""
    rows = [
        ("file:///a.md", "lib_a", "# Alpha\n\n" + "alpha beta gamma delta " * 20, None),
        ("file:///b.md", "lib_a", "# Beta\n\nthe error code E-4021 appears here exactly once\n\n" + "filler words only " * 15, None),
        ("file:///c.txt", "lib_b", "plain short doc", None),
        ("https://x.io/d", "lib_b", "# Delta\n\n" + "delta epsilon zeta " * 30, '{"author":"Alice"}'),
        ("file:///e.md", "lib_a", "totally unrelated content about cooking pasta " * 10, None),
    ]
    return spark.createDataFrame(rows, "source string, library string, content string, metadata string")
