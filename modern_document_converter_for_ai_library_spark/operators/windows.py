"""Window-function re-expressions of the reference's ordered line operators
(SURVEY.md §2.5 W1/W4) plus batch statistics (§2.4 A6).

The convert kernel handles these per document in Python because they feed the
byte-exact gate; these DataFrame variants exist for pipelines that want the
same signals columnar (e.g. caption mining over a corpus) — explode to lines,
window by (doc_id, line order), lag/lead for adjacency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

CAPTION_PATTERN = r"^[A-Z][A-Za-z\s,\.&'\-\(\)]+\s+v\.?\s+[A-Za-z\s,\.&'\-\(\)]+$"
HEADING_SHAPE = r"^[A-Z0-9 ,.'-]+$"


def explode_lines(df: DataFrame, spans_col: str = "spans") -> DataFrame:
    """(doc_id, line_no, line) rows from a span table's text spans."""
    texts = F.filter(F.col(spans_col), lambda s: s["kind"] == F.lit("text"))
    lines = F.split(F.array_join(F.transform(texts, lambda s: s["text"]), "\n"), "\n")
    return df.select(
        "doc_id", F.posexplode(lines).alias("line_no", "line")
    )


def find_captions(df: DataFrame, first_lines: int = 40) -> DataFrame:
    """Caption candidates in the first N lines with +-1 line of context
    (the legacy caption finder, zOld-Code pdf_extractor.py:216-252, W4).

    Window is per-document: lag/lead never cross doc boundaries, and the
    shuffle key is doc_id — safe at corpus scale.
    """
    lines = explode_lines(df).filter(F.col("line_no") < first_lines)
    w = Window.partitionBy("doc_id").orderBy("line_no")
    ctx = lines.withColumn("prev_line", F.lag("line").over(w)).withColumn(
        "next_line", F.lead("line").over(w)
    )
    hits = ctx.filter(F.col("line").rlike(CAPTION_PATTERN))
    # first hit per doc wins (the reference's first-match rule)
    w_first = Window.partitionBy("doc_id").orderBy("line_no")
    return (
        hits.withColumn("rn", F.row_number().over(w_first))
        .filter(F.col("rn") == 1)
        .select("doc_id", "line_no", F.col("line").alias("caption"),
                "prev_line", "next_line")
    )


def heading_candidates(df: DataFrame) -> DataFrame:
    """W1 columnar: <=10 words, caps/numbered shape, blank-adjacent
    (clean_txt.py:233-255) via lag/lead instead of the in-kernel scan."""
    lines = explode_lines(df)
    w = Window.partitionBy("doc_id").orderBy("line_no")
    ctx = lines.withColumn("prev_line", F.lag("line").over(w)).withColumn(
        "next_line", F.lead("line").over(w)
    )
    stripped = F.trim(F.col("line"))
    shape_ok = stripped.rlike(HEADING_SHAPE) | stripped.rlike(
        r"^(?:[IVXLCDM]+\.\s+.+|\d+\.\s+.+)$"
    )
    short_ok = F.size(F.split(stripped, r"\s+")) <= 10
    prev_blank = F.col("prev_line").isNull() | (F.trim(F.col("prev_line")) == "")
    next_blank = F.col("next_line").isNull() | (F.trim(F.col("next_line")) == "")
    return ctx.filter(
        (stripped != "") & shape_ok & short_ok & (prev_blank | next_blank)
    ).select("doc_id", "line_no", F.col("line").alias("heading"))


def batch_stats(out_df: DataFrame) -> DataFrame:
    """BatchResult aggregate (models.py:544-577, A6): one summary row."""
    return out_df.agg(
        F.count("*").cast("bigint").alias("total_files"),
        F.sum(F.when(F.col("success"), 1).otherwise(0)).cast("bigint").alias("successful"),
        F.sum(F.when(F.col("success"), 0).otherwise(1)).cast("bigint").alias("failed"),
        F.floor(
            F.sum(F.when(F.col("success"), 1).otherwise(0))
            * 1_000_000
            / F.count("*")
        ).cast("bigint").alias("success_rate_micros"),
        F.sum(F.col("lines_removed").cast("bigint")).alias("total_lines_removed"),
        F.sum(F.col("headings_added").cast("bigint")).alias("total_headings_added"),
    )
