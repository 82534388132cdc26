"""Generate golden outputs for the two flagship pipeline queries.

Pure-Python path (NO Spark): reads the driver testdata parquet with pyarrow,
replicates the ``flat_to_spans`` adapter in plain Python, and runs the same
``reference_semantics`` kernels the Spark pipelines use — sequentially. The
results are committed as parquet under
``modern_document_converter_for_ai_library_spark/data/goldens/`` and become
the DuckDB oracle for q_convert_pipeline / q_rename_pipeline (queries.py
inlines them as VALUES), closing the round-1 "no_oracle" gap: the driver's
per-round hash check now compares the DISTRIBUTED execution against this
independent sequential execution, including a span-sequence hash (the north
rule's (kind, text, media_ref, order) invariant).

Usage: python scripts/gen_goldens.py
"""

from __future__ import annotations

import hashlib
import math
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from modern_document_converter_for_ai_library_spark.queries import (  # noqa: E402
    rename_input_py,
)
from modern_document_converter_for_ai_library_spark.reference_semantics.convert import (  # noqa: E402
    convert_spans_doc,
    rename_corpus_sequential,
)

SFS = {"sf0_001": "/root/testdata/sf0.001", "sf0_01": "/root/testdata/sf0.01"}
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "modern_document_converter_for_ai_library_spark",
    "data",
    "goldens",
)


def flat_to_spans_py(text: str) -> list[dict]:
    """Mirror sources/io.py:flat_to_spans: one text span per '\\n' line."""
    return [
        {"kind": "text", "text": ln, "media_ref": "", "offset": i}
        for i, ln in enumerate((text or "").split("\n"))
    ]


def spans_hash(spans: list[dict]) -> str:
    """Canonical span-sequence hash: md5 over (kind, text, media_ref, offset)
    rows joined with \\x1e/\\x1f — the Spark side computes the identical
    expression JVM-side (queries.py:_SPANS_HASH_EXPR)."""
    payload = "\x1f".join(
        "\x1e".join([s["kind"], s["text"], s["media_ref"], str(s["offset"])])
        for s in spans
    )
    return hashlib.md5(payload.encode("utf-8")).hexdigest()


def micros(x: float) -> int:
    return math.floor(x * 1_000_000)


def gen_convert(docs: list[tuple[int, str]]) -> pa.Table:
    rows = []
    for doc_id, text in docs:
        spans = flat_to_spans_py(text)
        r = convert_spans_doc(str(doc_id), spans, source_file=f"{doc_id}.txt")
        rows.append(
            {
                "doc_id": int(doc_id),
                "document_type": r["document_type"],
                "confidence_micros": micros(r["confidence"]),
                "lines_removed": r["lines_removed"],
                "headings_added": r["headings_added"],
                "character_count": r["character_count"],
                "success": r["success"],
                "spans_hash": spans_hash(r["spans"]),
            }
        )
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("doc_id", pa.int64()),
                ("document_type", pa.string()),
                ("confidence_micros", pa.int64()),
                ("lines_removed", pa.int64()),
                ("headings_added", pa.int64()),
                ("character_count", pa.int64()),
                ("success", pa.bool_()),
                ("spans_hash", pa.string()),
            ]
        ),
    )


def gen_rename(docs: list[tuple[int, str]]) -> pa.Table:
    seq_in = []
    for doc_id, text in docs:
        source_file, full = rename_input_py(int(doc_id), text)
        seq_in.append((str(doc_id), flat_to_spans_py(full), source_file))
    rows = []
    for r in rename_corpus_sequential(seq_in, start_index=0):
        rows.append(
            {
                "doc_id": int(r["doc_id"]),
                "document_type": r["document_type"],
                "confidence_micros": micros(r["confidence"]),
                "case_name": r["case_name"],
                "year": r["year"],
                "metadata_ok": r["metadata_ok"],
                "code_index": r["code_index"],
                "unique_code": r["unique_code"],
                "new_filename": r["new_filename"],
                "rename_success": r["rename_success"],
                "error_message": r["error_message"],
            }
        )
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("doc_id", pa.int64()),
                ("document_type", pa.string()),
                ("confidence_micros", pa.int64()),
                ("case_name", pa.string()),
                ("year", pa.string()),
                ("metadata_ok", pa.bool_()),
                ("code_index", pa.int64()),
                ("unique_code", pa.string()),
                ("new_filename", pa.string()),
                ("rename_success", pa.bool_()),
                ("error_message", pa.string()),
            ]
        ),
    )


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    for tag, sf_dir in SFS.items():
        t = pq.read_table(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        )
        docs = list(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
        conv = gen_convert(docs)
        ren = gen_rename(docs)
        pq.write_table(conv, os.path.join(OUT_DIR, f"convert_{tag}.parquet"))
        pq.write_table(ren, os.path.join(OUT_DIR, f"rename_{tag}.parquet"))
        n_ok = sum(1 for v in ren["rename_success"].to_pylist() if v)
        print(
            f"{tag}: {conv.num_rows} convert rows, {ren.num_rows} rename rows "
            f"({n_ok} successful renames)"
        )


if __name__ == "__main__":
    main()
