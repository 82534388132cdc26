"""Deterministic hashing column builders shared by dedup/similarity
operators and the oracle-checked queries.

Everything here is engine-portable by construction: md5 hex strings and
integer arithmetic only (no engine-native hash functions, no floats), so a
DuckDB translation produces identical bytes.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens_col(text_col: str = "text") -> Column:
    """Whitespace tokens, empty strings dropped (single-space split so the
    same expression is portable to DuckDB's string_split)."""
    return F.filter(F.split(F.col(text_col), " "), lambda x: x != "")


def shingle_hashes_col(tokens: Column, width: int = 3) -> Column:
    """md5 of each ``width``-word shingle. One digest per shingle — the
    minhash permutations slice this digest rather than re-hashing."""
    n = F.size(tokens)
    shingles = F.transform(
        F.sequence(F.lit(1), n - (width - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(tokens, i + j) for j in range(width)]
        ),
    )
    return F.transform(shingles, lambda s: F.md5(s))


def minhash_col(hashes: Column, k: int) -> Column:
    """k-th minhash: min over the k-th disjoint 8-hex-char slice of the
    per-shingle digests (md5 bits are independent => valid permutations)."""

    def _slice(h: Column) -> Column:
        return F.substring(h, 1 + 8 * k, 8)

    return F.array_min(F.transform(hashes, _slice))


def lsh_plane_signs(n_planes: int, dim: int) -> list[list[int]]:
    """Deterministic ±1 sign matrix for random-hyperplane (SimHash) LSH over
    embeddings. Derived from md5 so any engine/driver recomputes the same
    planes; inlined as literals into both Spark exprs and oracle SQL."""
    planes = []
    for p in range(n_planes):
        row = []
        for j in range(dim):
            digest = hashlib.md5(f"plane{p}|dim{j}".encode()).hexdigest()
            row.append(1 if int(digest[0], 16) % 2 == 1 else -1)
        planes.append(row)
    return planes
