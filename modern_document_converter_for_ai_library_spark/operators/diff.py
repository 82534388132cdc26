"""Cross-snapshot table diff (CDC for incremental curation).

The resume machinery (operators/manifest.py) answers "what is not yet
converted"; a recurring-crawl pipeline also needs the full change
classification between two corpus snapshots — which documents were
added, removed, or changed content — so downstream incremental stages
(dedup membership, mixing budgets, shard rebuilds) can process deltas
instead of the whole corpus.

Scale shape: both sides reduce to a slim (id, content-hash) projection
before the single full-outer equi-join on the id — the join payload is
two 2-column frames regardless of document width, and the md5 hashes
are computed map-side in codegen. No windows, no skew surface beyond
the id join itself (ids are unique on each side by contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: change_type values, in severity order
ADDED = "added"
REMOVED = "removed"
CHANGED = "changed"
UNCHANGED = "unchanged"


def _content_hash(cols: list[str]):
    """md5 over the compare columns, null-safe and unambiguous: each value
    is length-prefixed (null -> the literal token ``\\0``), so ("a", "bc")
    never collides with ("ab", "c") and null never collides with ''."""
    parts = []
    for c in cols:
        s = F.col(c).cast("string")
        parts.append(
            F.when(s.isNull(), F.lit("\0")).otherwise(
                F.concat(F.length(s).cast("string"), F.lit(":"), s)
            )
        )
    return F.md5(F.concat_ws("|", *parts))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    compare_cols: list[str] | None = None,
    keep_unchanged: bool = True,
) -> DataFrame:
    """Classify every id across two snapshots.

    Returns (id, change_type, old_hash, new_hash); ``compare_cols``
    defaults to all non-id columns the two snapshots share (schema
    drift: a column present on only one side never silently enters the
    hash). ``keep_unchanged=False`` drops the unchanged rows — the
    delta-only frame downstream incremental stages want.
    """
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c != id_col]
        if not compare_cols:
            raise ValueError("no shared non-id columns to compare")
    o = old.select(
        F.col(id_col), _content_hash(compare_cols).alias("old_hash")
    )
    n = new.select(
        F.col(id_col), _content_hash(compare_cols).alias("new_hash")
    )
    joined = o.join(n, id_col, "full_outer")
    change = (
        F.when(F.col("old_hash").isNull(), F.lit(ADDED))
        .when(F.col("new_hash").isNull(), F.lit(REMOVED))
        .when(F.col("old_hash") != F.col("new_hash"), F.lit(CHANGED))
        .otherwise(F.lit(UNCHANGED))
    )
    out = joined.select(id_col, change.alias("change_type"), "old_hash", "new_hash")
    if not keep_unchanged:
        out = out.filter(F.col("change_type") != UNCHANGED)
    return out
