"""Distributed rename flow (SURVEY.md §3.2): classify -> extract metadata ->
discover-or-allocate code -> canonical filename.

Plan shape:

    scan (doc_id, source_file, spans)
      -> ArrowEvalPython: rename kernel (classification + metadata regexes +
         filename template with a {code} placeholder + legacy-code discovery)
      -> split: discovered codes pass through; docs needing a code get the
         two-phase sequential allocation (operators/codes.py)
      -> unionByName + placeholder substitution (pure column exprs)

Codes are allocated only to docs that (a) produced a valid filename and
(b) carry no preserved legacy code — mirroring the reference's
discover-or-generate contract (code_generator.py:392-436) and its atomic
"skip downstream on failure" rule (orchestrator.py:150-157).
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..reference_semantics.convert import rename_doc
from .codes import assign_codes
from .convert import _as_span_dicts

RENAME_KERNEL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("source_file", T.StringType()),
        T.StructField("document_type", T.StringType()),
        T.StructField("confidence", T.DoubleType()),
        T.StructField("case_name", T.StringType()),
        T.StructField("year", T.StringType()),
        T.StructField("court", T.StringType()),
        T.StructField("citation", T.StringType()),
        T.StructField("discovered_code", T.StringType()),
        T.StructField("filename_template", T.StringType()),
        T.StructField("rename_success", T.BooleanType()),
    ]
)


def _rename_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for doc_id, spans, source_file in zip(
            pdf["doc_id"], pdf["spans"], pdf["source_file"]
        ):
            res = rename_doc(str(doc_id), _as_span_dicts(spans), str(source_file))
            res["source_file"] = str(source_file)
            rows.append(res)
        yield pd.DataFrame(
            rows, columns=[f.name for f in RENAME_KERNEL_SCHEMA.fields]
        )


def rename_documents(
    df: DataFrame,
    start_index: int = 0,
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """Run the rename flow; adds unique_code + new_filename columns.

    Output: kernel columns + ``unique_code`` (nullable: only successfully
    renamed or legacy-coded docs get one) + ``new_filename`` (nullable).
    """
    base = df.select("doc_id", "source_file", "spans").mapInPandas(
        _rename_batches, schema=RENAME_KERNEL_SCHEMA
    )

    # Uniqueness guard for preserved legacy codes: the registry's codes
    # table is unique per code (registrar.py:96-101), so when several input
    # files carry the SAME ----XXXXX suffix only the first claimant
    # (min doc_id — the reference's alphabetical processing order) may keep
    # it; the rest fall through to fresh allocation exactly like an invalid
    # code. The window shuffles only the discovered-code subset.
    w_claim = Window.partitionBy("discovered_code").orderBy("doc_id")
    base = base.withColumn(
        "_claim",
        F.when(
            F.col("discovered_code").isNotNull(), F.row_number().over(w_claim)
        ),
    ).withColumn(
        "discovered_code",
        F.when(F.col("_claim") == 1, F.col("discovered_code")),
    ).drop("_claim")

    has_code = base.filter(F.col("discovered_code").isNotNull()).withColumn(
        "code_index", F.lit(None).cast("long")
    ).withColumn("unique_code", F.col("discovered_code"))

    needs_code = base.filter(
        F.col("discovered_code").isNull() & F.col("rename_success")
    )
    allocated = assign_codes(
        needs_code,
        order_col="doc_id",
        start_index=start_index,
        num_partitions=num_partitions,
    )

    no_code = (
        base.filter(F.col("discovered_code").isNull() & ~F.col("rename_success"))
        .withColumn("code_index", F.lit(None).cast("long"))
        .withColumn("unique_code", F.lit(None).cast("string"))
    )

    merged = has_code.unionByName(allocated).unionByName(no_code)
    new_filename = F.when(
        F.col("filename_template").isNotNull() & F.col("unique_code").isNotNull(),
        F.replace(
            F.col("filename_template"), F.lit("{code}"), F.col("unique_code")
        ),
    )
    return merged.withColumn("new_filename", new_filename)
