"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship point-in-time training join (SURVEY.md
OP-16) at sf0.001.  ``queries()``/``oracle_sql()`` expose the engine's
query catalog (feature_store_healthcare_spark/queries.py) — one entry per
implemented operator family from SURVEY.md §2, each with a DuckDB-equivalent
ANSI-SQL oracle.
"""

from __future__ import annotations

import pathlib
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = pathlib.Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from feature_store_healthcare_spark import queries as _catalog  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: leak-free per-row as-of
    (point-in-time) join of a purchase spine against click feature values."""
    return _catalog.pit_training_join(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _catalog.queries()


def oracle_sql() -> dict[str, str]:
    return _catalog.oracle_sql()
