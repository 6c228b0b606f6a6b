"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship BM25 disjunctive top-10 at sf0.001;
``queries``/``oracle_sql`` expose every implemented operator from
SURVEY.md §2 plus the training-data pipeline operators (dedup family,
ANN, text analysis), each paired with a DuckDB-equivalent ANSI-SQL
oracle (see search_engine_spark/contract.py for the cross-engine
determinism rules).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from search_engine_spark import contract  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return contract.queries()["bm25_disjunctive"](
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return contract.queries()


def oracle_sql() -> dict[str, str]:
    return contract.oracle_sql()
