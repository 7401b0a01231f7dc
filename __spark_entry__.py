"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship spec-engine query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the registry in
``elevate_data_pipeline_spark.queries`` for the driver's DuckDB
correctness gate at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from elevate_data_pipeline_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    ``pretraining_corpus`` composes the engine's signature operators in
    one plan: corpus boilerplate strip -> language/quality gates ->
    minhash canonical survivors -> deterministic shuffle/shard."""
    return _q.QUERIES["pretraining_corpus"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(_q.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted => rows-only check)."""
    return dict(_q.ORACLES)
