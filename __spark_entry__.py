"""Driver contract for the spark-graft builder (PySpark target).

The implementation lives in ``mcpvectordb_spark`` (see SURVEY.md §2 for the
operator inventory this covers); ``mcpvectordb_spark.catalog`` holds the
(Spark query, DuckDB oracle) pairs — parity-checked locally with
``python tools/check_parity.py``.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from mcpvectordb_spark.catalog import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: hybrid BM25+vector search with RRF fusion — the
    reference's hot read path (SURVEY.md §3.1) — on sf0.001."""
    return QUERIES["hybrid_rrf"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
