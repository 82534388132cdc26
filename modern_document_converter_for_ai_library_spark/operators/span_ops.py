"""Interleaved-span structural operators — reflow (merge adjacent text
runs), media/caption pairing, and corpus-level media dedup over the
``spans array<struct<kind,text,media_ref,offset>>`` payload shape
(BASELINE.json input_hint; the reference emits this shape per document,
src/steps/convert_step.py writes one text blob + media side-files).

Scale shape: every operator here is RELATIONAL over the exploded span
rows, not an array fold. A fold (``F.aggregate`` building an array)
re-copies the accumulator per element — O(n^2) per document, which dies
on the long tail of 10^5-span documents at 10^12-doc scale. The
relational form is linear: one ``posexplode``, windows partitioned by
``doc_id`` (bounded by document size, never corpus size), and one
hash shuffle on ``doc_id`` that AQE can coalesce. The plan audit
(tests/test_plan_audit.py) enforces that every window stays partitioned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def explode_spans(df: DataFrame, spans_col: str = "spans") -> DataFrame:
    """Flatten span arrays to rows: (doc_id, pos, kind, text, media_ref,
    offset). ``pos`` is the 0-based array position (document order)."""
    return df.select(
        "doc_id", F.posexplode(spans_col).alias("pos", "_s")
    ).select(
        "doc_id",
        "pos",
        F.col("_s.kind").alias("kind"),
        F.col("_s.text").alias("text"),
        F.col("_s.media_ref").alias("media_ref"),
        F.col("_s.offset").alias("offset"),
    )


def reflow_spans(df: DataFrame, spans_col: str = "spans") -> DataFrame:
    """Merge each run of ADJACENT text spans into one span (texts joined
    by '\\n'), keep media spans as-is, and renumber offsets densely.

    This is the span-level analogue of the reference's paragraph-merge
    cleaning (zOld pdf cleaner joins wrapped lines before markup): after
    extraction a document often carries one span per line; downstream
    stages want one span per block bounded by media.

    Run identity is the running count of non-text spans at-or-before each
    position — every media span starts a new group, and (group, kind)
    separates a media span from the text run that follows it. Returns
    flat rows (doc_id, offset, kind, text, media_ref, n_merged) ordered
    by the new dense offset; ``reassemble_spans`` re-nests if the array
    shape is needed.
    """
    ex = explode_spans(df, spans_col)
    w = Window.partitionBy("doc_id").orderBy("pos")
    g = ex.withColumn(
        "grp",
        F.sum(F.when(F.col("kind") != "text", 1).otherwise(0)).over(w),
    )
    merged = g.groupBy("doc_id", "grp", "kind").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "text"))),
                lambda s: s["text"],
            ),
            "\n",
        ).alias("_mtext"),
        F.max("media_ref").alias("_mref"),
        F.min("pos").alias("_min_pos"),
        F.count("*").cast("bigint").alias("n_merged"),
    )
    w2 = Window.partitionBy("doc_id").orderBy("_min_pos")
    return merged.select(
        "doc_id",
        (F.row_number().over(w2) - 1).cast("bigint").alias("offset"),
        "kind",
        F.when(F.col("kind") == "text", F.col("_mtext"))
        .otherwise(F.lit(""))
        .alias("text"),
        F.when(F.col("kind") == "text", F.lit(""))
        .otherwise(F.col("_mref"))
        .alias("media_ref"),
        "n_merged",
    )


def reassemble_spans(flat: DataFrame, out_col: str = "spans") -> DataFrame:
    """Re-nest flat (doc_id, offset, kind, text, media_ref) rows into the
    span-array shape, ordered by offset. One groupBy on doc_id."""
    return flat.groupBy("doc_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("offset", "kind", "text", "media_ref"))
            ),
            lambda s: F.struct(
                s["kind"].alias("kind"),
                s["text"].alias("text"),
                s["media_ref"].alias("media_ref"),
                s["offset"].cast("int").alias("offset"),
            ),
        ).alias(out_col)
    )


def caption_pairs(df: DataFrame, spans_col: str = "spans") -> DataFrame:
    """Pair every media span with its caption candidate: the text span
    immediately AFTER it in document order, falling back to the one
    immediately BEFORE, else ''. The classic figure-caption heuristic
    (captions follow the figure; leading images caption backwards).

    Returns (doc_id, media_ref, media_line, caption, caption_src) with
    caption_src in {'after','before','none'}. ``media_line`` is the media
    span's own offset field (engine-independent, unlike array position).
    lead() and lag() share one window spec — a single per-doc sort.
    """
    ex = explode_spans(df, spans_col)
    w = Window.partitionBy("doc_id").orderBy("pos")
    nxt_kind = F.lead("kind").over(w)
    nxt_text = F.lead("text").over(w)
    prv_kind = F.lag("kind").over(w)
    prv_text = F.lag("text").over(w)
    return (
        ex.select(
            "doc_id",
            "kind",
            "media_ref",
            F.col("offset").cast("bigint").alias("media_line"),
            nxt_kind.alias("_nk"),
            nxt_text.alias("_nt"),
            prv_kind.alias("_pk"),
            prv_text.alias("_pt"),
        )
        .filter(F.col("kind") != "text")
        .select(
            "doc_id",
            "media_ref",
            "media_line",
            F.when(F.col("_nk") == "text", F.col("_nt"))
            .when(F.col("_pk") == "text", F.col("_pt"))
            .otherwise(F.lit(""))
            .alias("caption"),
            F.when(F.col("_nk") == "text", F.lit("after"))
            .when(F.col("_pk") == "text", F.lit("before"))
            .otherwise(F.lit("none"))
            .alias("caption_src"),
        )
    )


def media_dedup(
    media: DataFrame,
    key_col: str = "content_key",
    ref_col: str = "media_ref",
    doc_col: str = "doc_id",
) -> DataFrame:
    """Corpus-level media dedup: group media occurrences by CONTENT key
    (in production the md5 of the binary payload; callers derive it) and
    emit one catalog row per distinct asset — the canonical ref is the
    lexicographic minimum, the stable choice under recompute.

    One partial-aggregated groupBy on the content key; output cardinality
    = number of distinct assets, never corpus size. Skewed keys (a logo
    on every page) are exactly what map-side partial aggregation absorbs.
    """
    return media.groupBy(key_col).agg(
        F.min(ref_col).alias("canonical_ref"),
        F.count("*").cast("bigint").alias("n_refs"),
        F.countDistinct(doc_col).cast("bigint").alias("n_docs"),
    )
