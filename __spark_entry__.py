"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG query (constructed pages →
extract → normalize → mill) at sf0.001; ``queries()``/``oracle_sql()``
expose every implemented operator from SURVEY.md §2 plus the
training-data operators, each paired with a DuckDB oracle where the
semantics are SQL-expressible (see gleaner_spark/plans/queries.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gleaner_spark.plans.queries import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full extract→fix→normalize→mill KG path over pages
    built from the sf0.001 documents table."""
    fn, _ = QUERIES["kg_extract_mill"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _oracle) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: oracle
        for name, (_fn, oracle) in QUERIES.items()
        if oracle is not None
    }
