"""Distributed rename flow (SURVEY.md §3.2): classify -> extract metadata ->
discover-or-allocate code -> canonical filename.

Plan shape:

    scan (doc_id, source_file, spans)
      -> ArrowEvalPython: rename kernel (classification + metadata regexes +
         filename template with a {code} placeholder + legacy-code discovery,
         plus the reference's STEP-3 metadata gate)
      -> split: metadata-eligible docs with a discovered code vs docs that
         need the two-phase sequential allocation (operators/codes.py) vs
         ineligible docs (no code consumed — rename_step.py:183-196)
      -> code-uniqueness resolution on the CONTESTED subset only (broadcast)
      -> unionByName + placeholder substitution (pure column exprs)

Code-uniqueness semantics are bug-for-bug with the reference registry
(differentially tested against the actual Registrar/CodeGenerator in
tests/test_codes_rename.py):

- ``codes.code`` is a PRIMARY KEY and ``documents.unique_code`` is UNIQUE
  (registrar.py:49-112), and processing is sequential in alphabetical file
  order (orchestrator.py:96). Net effect: for every code value, the holder
  earliest in processing order (min doc_id) keeps it; every later holder
  FAILS its rename — a later duplicate-``----XXXXX`` claimant fails at
  commit_code_to_document (STEP-5 handler, rename_step.py:207-243 ->
  ``unique_code=None``), and a fresh sequential allocation that lands on an
  already-inserted code raises IntegrityError inside allocate_code
  (code_generator.py:364-390). The reference would crash the whole batch on
  the latter (no try/except in the orchestrator loop); we record a per-row
  failure instead — documented divergence, same winner either way.
- The code INDEX is consumed even by failed fresh allocations
  (increment_code_index commits before allocate_code raises), so dense
  ranks over the needs-code subset reproduce the reference's numbering.

Scale notes: the kernel output (slim metadata rows, no spans) is persisted
once and read by the three branches; claim resolution touches only docs
that carry a discovered code plus fresh allocations colliding with one —
both rare — so every resolution join is a broadcast and the only data-wide
shuffle is assign_codes' range partition.
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.storagelevel import StorageLevel

from ..reference_semantics.codes import DUP_ALLOC_ERR, DUP_CLAIM_ERR
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
        T.StructField("metadata_ok", T.BooleanType()),
        T.StructField("filename_template", T.StringType()),
        T.StructField("rename_success", T.BooleanType()),
        T.StructField("error_message", T.StringType()),
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
    cache_scope=None,
) -> DataFrame:
    """Run the rename flow; adds ``code_index``, ``unique_code`` and
    ``new_filename`` columns (all nullable) plus ``error_message``.

    Deterministic: output equals ``reference_semantics.convert.
    rename_corpus_sequential`` over the same (doc_id, spans, source_file)
    rows, for any partitioning. The kernel output is persisted (read by
    three branches + winner resolution); pass a ``plans.caching.CacheScope``
    to own its lifetime — release it after materializing the result
    (tests/test_cache_hygiene.py). Recompute is safe either way (the kernel
    is pure per row); the persist is a performance choice only.
    """
    from ..plans.caching import scoped_persist

    base = scoped_persist(
        df.select("doc_id", "source_file", "spans").mapInPandas(
            _rename_batches, schema=RENAME_KERNEL_SCHEMA
        ),
        cache_scope,
        StorageLevel.MEMORY_AND_DISK,
    )

    claimants = base.filter(F.col("discovered_code").isNotNull())
    needs_code = base.filter(F.col("metadata_ok") & F.col("discovered_code").isNull())
    ineligible = base.filter(~F.col("metadata_ok"))

    allocated = assign_codes(
        needs_code,
        order_col="doc_id",
        start_index=start_index,
        num_partitions=num_partitions,
    )

    # --- contested-code resolution (small data only) ---------------------
    # holders of each discovered code: its claimants + any fresh allocation
    # that landed on it. Per code, min(doc_id) (the reference's sequential
    # processing order) wins; all later holders fail.
    disc_codes = claimants.select("doc_id", F.col("discovered_code").alias("_code"))
    fresh_hits = allocated.join(
        F.broadcast(disc_codes.select("_code").distinct()),
        allocated["unique_code"] == F.col("_code"),
    ).select("doc_id", F.col("unique_code").alias("_code"))
    winners = (
        disc_codes.unionByName(fresh_hits)
        .groupBy("_code")
        .agg(F.min("doc_id").alias("_winner"))
    )

    is_winner = F.col("doc_id") == F.col("_winner")
    disc_out = (
        claimants.join(
            F.broadcast(winners),
            claimants["discovered_code"] == winners["_code"],
            "left",
        )
        .withColumn("code_index", F.lit(None).cast("long"))
        .withColumn("unique_code", F.when(is_winner, F.col("discovered_code")))
        .withColumn(
            "error_message",
            F.when(is_winner, F.col("error_message")).otherwise(
                F.lit(DUP_CLAIM_ERR)
            ),
        )
        .drop("_code", "_winner")
    )

    lost = F.col("_winner").isNotNull() & (F.col("_winner") != F.col("doc_id"))
    fresh_out = (
        allocated.join(
            F.broadcast(winners),
            allocated["unique_code"] == winners["_code"],
            "left",
        )
        # the losing fresh allocation burned its index but holds no code
        .withColumn("unique_code", F.when(~lost, F.col("unique_code")))
        .withColumn(
            "error_message",
            F.when(~lost, F.col("error_message")).otherwise(F.lit(DUP_ALLOC_ERR)),
        )
        .drop("_code", "_winner")
    )

    no_meta = ineligible.withColumn(
        "code_index", F.lit(None).cast("long")
    ).withColumn("unique_code", F.lit(None).cast("string"))

    merged = (
        disc_out.unionByName(fresh_out)
        .unionByName(no_meta)
        .withColumn(
            "rename_success",
            F.col("rename_success") & F.col("unique_code").isNotNull(),
        )
    )
    new_filename = F.when(
        F.col("filename_template").isNotNull() & F.col("unique_code").isNotNull(),
        F.replace(
            F.col("filename_template"), F.lit("{code}"), F.col("unique_code")
        ),
    )
    return merged.withColumn("new_filename", new_filename)
