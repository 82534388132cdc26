"""Markdown -> plain-text strip chain (SURVEY.md §2.7 N6).

Columnar re-expression of the reference's 12-regex strip
(src/services/text_extractor.py:204-251, used after deep extraction).
Multiline anchors use the explicit ``(?m)`` flag so Java regex matches the
reference's ``re.MULTILINE`` semantics; the DOTALL code-block rule uses
``(?s)``. Replacement groups use Java's ``$1`` — the semantics (not the
replacement syntax) are what must match.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (pattern, replacement) in the reference's exact order; ``$1`` refs become
# ``\\1`` in an RE2 oracle translation.
MARKDOWN_STRIP_RULES: list[tuple[str, str]] = [
    (r"(?m)^#{1,6}\s+", ""),
    (r"\*\*([^*]+)\*\*", "$1"),
    (r"__([^_]+)__", "$1"),
    (r"\*([^*]+)\*", "$1"),
    (r"_([^_]+)_", "$1"),
    (r"\[([^\]]+)\]\([^\)]+\)", "$1"),
    (r"`([^`]+)`", "$1"),
    (r"(?s)```[^\n]*\n(.*?)\n```", "$1"),
    (r"(?m)^(\*\*\*|---|___)\s*$", ""),
    (r"(?m)^>\s+", ""),
    (r"(?m)^[\*\-\+]\s+", ""),
    (r"(?m)^\d+\.\s+", ""),
]


def strip_markdown(col: Column | str) -> Column:
    out = F.col(col) if isinstance(col, str) else col
    for pat, rep in MARKDOWN_STRIP_RULES:
        out = F.regexp_replace(out, pat, rep)
    return out
