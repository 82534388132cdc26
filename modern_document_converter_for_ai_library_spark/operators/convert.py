"""The flagship operator: distributed convert/clean over interleaved docs.

Spark plan shape (SURVEY.md §3 re-expression):

    scan (column-pruned: doc_id, source_file, spans)
      -> [optional] size-balanced repartition        (plans/salting.py)
      -> ArrowEvalPython: convert kernel             (this module)
      -> downstream writes / aggregations

Exactly ONE Python stage. The kernel body is
``reference_semantics.convert.convert_spans_doc`` — the same function that
generates the golden fixtures, so the span-equality gate holds by
construction. Data crosses the JVM/Python boundary as Arrow record batches
(mapInPandas); there is no row-at-a-time Python UDF anywhere in the plan
(north-rule vectorization constraint, BASELINE.md).
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..reference_semantics.convert import convert_spans_doc

_SPAN_STRUCT = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("offset", T.IntegerType()),
    ]
)

CONVERT_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("source_file", T.StringType()),
        T.StructField("spans", T.ArrayType(_SPAN_STRUCT)),
        T.StructField("document_type", T.StringType()),
        T.StructField("confidence", T.DoubleType()),
        T.StructField("lines_removed", T.IntegerType()),
        T.StructField("headings_added", T.IntegerType()),
        T.StructField("character_count", T.IntegerType()),
        T.StructField("success", T.BooleanType()),
        T.StructField("error_message", T.StringType()),
    ]
)


def _as_span_dicts(spans) -> list[dict]:
    """Arrow hands list<struct> to pandas as an ndarray/list of dicts."""
    if spans is None:
        return []
    return [
        s if isinstance(s, dict) else dict(zip(("kind", "text", "media_ref", "offset"), s))
        for s in spans
    ]


def _convert_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        has_source = "source_file" in pdf.columns
        has_hash = "input_hash" in pdf.columns
        out_rows = []
        for i, (doc_id, spans, source_file) in enumerate(
            zip(
                pdf["doc_id"],
                pdf["spans"],
                pdf["source_file"] if has_source else pdf["doc_id"],
            )
        ):
            res = convert_spans_doc(
                str(doc_id),
                _as_span_dicts(spans),
                source_file=str(source_file) if has_source else None,
            )
            res["source_file"] = str(source_file) if has_source else f"{doc_id}.pdf"
            if has_hash:
                res["input_hash"] = pdf["input_hash"].iloc[i]
            out_rows.append(res)
        cols = [f.name for f in CONVERT_OUTPUT_SCHEMA.fields]
        if has_hash:
            cols = cols + ["input_hash"]
        yield pd.DataFrame(out_rows, columns=cols)


def _arrow_schema(with_hash: bool):
    import pyarrow as pa

    span_type = pa.list_(
        pa.struct(
            [
                ("kind", pa.string()),
                ("text", pa.string()),
                ("media_ref", pa.string()),
                ("offset", pa.int32()),
            ]
        )
    )
    fields = [
        ("doc_id", pa.string()),
        ("source_file", pa.string()),
        ("spans", span_type),
        ("document_type", pa.string()),
        ("confidence", pa.float64()),
        ("lines_removed", pa.int32()),
        ("headings_added", pa.int32()),
        ("character_count", pa.int32()),
        ("success", pa.bool_()),
        ("error_message", pa.string()),
    ]
    if with_hash:
        fields.append(("input_hash", pa.string()))
    return pa.schema(fields)


def _convert_arrow_batches(batches):
    """Arrow-native kernel wrapper (mapInArrow).

    Skips the pandas block-manager round trip: ``to_pylist`` on the
    list<struct> column hands the kernel plain span dicts, and the output
    columns are built as Arrow arrays directly. MEASURED SLOWER than the
    mapInPandas path on the 1M-doc corpus at local[32] (25-32 s vs 16.4 s):
    ``pa.array`` re-inferring nested list<struct> values from Python dicts
    per 256-row batch dominates, where Spark's pandas serializer amortizes
    the same conversion in C. Kept as an A/B-tested alternative path
    (``use_arrow=True``) and as the template for a future flat-offsets
    builder; the default stays pandas.
    """
    import pyarrow as pa

    out_schema = None
    for rb in batches:
        names = rb.schema.names
        has_source = "source_file" in names
        has_hash = "input_hash" in names
        if out_schema is None:
            out_schema = _arrow_schema(has_hash)
        doc_ids = rb.column(names.index("doc_id")).to_pylist()
        spans_in = rb.column(names.index("spans")).to_pylist()
        sources = (
            rb.column(names.index("source_file")).to_pylist() if has_source else doc_ids
        )
        hashes = rb.column(names.index("input_hash")).to_pylist() if has_hash else None
        cols: dict[str, list] = {f.name: [] for f in CONVERT_OUTPUT_SCHEMA.fields}
        if has_hash:
            cols["input_hash"] = hashes
        for i, (doc_id, spans) in enumerate(zip(doc_ids, spans_in)):
            src = str(sources[i]) if has_source else None
            res = convert_spans_doc(str(doc_id), spans or [], source_file=src)
            res["source_file"] = src if has_source else f"{doc_id}.pdf"
            for f in CONVERT_OUTPUT_SCHEMA.fields:
                cols[f.name].append(res[f.name])
        yield pa.RecordBatch.from_arrays(
            [pa.array(cols[f.name], type=f.type) for f in out_schema],
            schema=out_schema,
        )


def convert_documents(
    df: DataFrame,
    balance_partitions: Optional[int] = None,
    use_arrow: bool = False,
) -> DataFrame:
    """Convert a span-shaped documents DataFrame.

    Input columns: ``doc_id`` (string), ``spans`` (array<struct>), and
    optionally ``source_file``. Set ``balance_partitions`` to apply the
    size-aware placement from plans/salting before the kernel stage (worth it
    when the corpus has a heavy size tail; costs one shuffle).
    ``use_arrow=True`` runs the kernel under ``mapInArrow`` (same kernel
    body, no pandas detour) — measured slower, see _convert_arrow_batches;
    the default ``mapInPandas`` wrapper wins. Both are single
    ArrowEvalPython-family stages — the vectorization constraint holds
    either way.
    """
    cols = ["doc_id", "spans"] + [
        c for c in ("source_file", "input_hash") if c in df.columns
    ]
    pruned = df.select(*cols)  # explicit projection -> parquet reads few cols
    if balance_partitions:
        from ..plans.salting import balance_by_size

        pruned = balance_by_size(pruned, balance_partitions)
    schema = CONVERT_OUTPUT_SCHEMA
    if "input_hash" in df.columns:
        schema = T.StructType(
            schema.fields + [T.StructField("input_hash", T.StringType())]
        )
    if use_arrow:
        return pruned.mapInArrow(_convert_arrow_batches, schema=schema)
    return pruned.mapInPandas(_convert_batches, schema=schema)
