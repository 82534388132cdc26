"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship convert pipeline (SURVEY.md §3) on the
sf0.001 tables; ``queries()``/``oracle_sql()`` expose every
oracle-checked operator implemented so far (see
modern_document_converter_for_ai_library_spark/queries.py for the
implementations and the cross-engine determinism rules).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full convert/clean pipeline over sf0.001 documents.

    Adapts the flat table to the interleaved span shape, runs the single
    Arrow-kernel convert stage, and returns per-document conversion stats
    (stable schema, no nested spans, >0 rows).
    """
    from modern_document_converter_for_ai_library_spark.queries import (
        spark_convert_pipeline,
    )

    return spark_convert_pipeline(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from modern_document_converter_for_ai_library_spark.queries import SPARK_QUERIES

    return dict(SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    from modern_document_converter_for_ai_library_spark.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
