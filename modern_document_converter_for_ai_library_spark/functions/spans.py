"""Columnar span-array operations (SURVEY.md §2.1 S8/S9/S10).

The reference implements multizone extraction and page limits imperatively
per file (text_extractor.py:475-553, 78-82); over the span model these are
pure higher-order array expressions — no Python, fully codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def doc_text_col(spans_col: str = "spans") -> Column:
    """Reassembled document text: '\\n'-join of text spans in offset order."""
    texts = F.transform(
        F.filter(F.col(spans_col), lambda s: s["kind"] == F.lit("text")),
        lambda s: F.coalesce(s["text"], F.lit("")),
    )
    return F.array_join(texts, "\n")


def limit_spans(spans_col: str = "spans", max_spans: int = 0) -> Column:
    """First-N prefix (the reference's max_pages=3 rename optimization,
    rename_step.py:104/127 — read less before heavy work)."""
    return F.slice(F.col(spans_col), 1, max_spans)


def multizone_spans(
    spans_col: str = "spans", first: int = 5, last: int = 2
) -> Column:
    """First ``first`` + last ``last`` spans with an omission marker span in
    between (text_extractor.py:508-535). Short documents pass through whole.

    The marker text mirrors the reference's
    ``...[DOCUMENT MIDDLE OMITTED: N pages]...`` with N = spans omitted.
    """
    spans = F.col(spans_col)
    n = F.size(spans)
    omitted = n - first - last
    marker = F.struct(
        F.lit("text").alias("kind"),
        F.concat(
            F.lit("...[DOCUMENT MIDDLE OMITTED: "),
            omitted.cast("string"),
            F.lit(" pages]..."),
        ).alias("text"),
        F.lit("").alias("media_ref"),
        F.lit(-1).cast("int").alias("offset"),
    )
    sliced = F.concat(
        F.slice(spans, 1, first),
        F.array(marker),
        F.slice(spans, -last, last),
    )
    # recompute dense offsets on the sliced sequence
    reindexed = F.transform(
        sliced,
        lambda s, i: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )
    return F.when(n > first + last, reindexed).otherwise(spans)


def is_probably_image_doc(spans_col: str = "spans", probe_spans: int = 3) -> Column:
    """Image-based-document probe (text_extractor.py:560-588): under 50 chars
    of text in the first ``probe_spans`` spans -> needs OCR."""
    head = F.slice(F.col(spans_col), 1, probe_spans)
    text_len = F.aggregate(
        F.filter(head, lambda s: s["kind"] == F.lit("text")),
        F.lit(0),
        lambda acc, s: acc + F.length(F.coalesce(s["text"], F.lit(""))),
    )
    return text_len < 50
