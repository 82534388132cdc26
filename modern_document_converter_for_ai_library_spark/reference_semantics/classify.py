"""Document-type classification kernel (SURVEY.md §2.4 A1–A3, ⚖).

Scoring: per type, sum the weights of every pattern that ``re.search``-matches
the text (src/services/classifier.py:161-193). Arg-max with a strictly-greater
tie-break in rule-set order (classifier.py:282-291); thresholds map the score
to a confidence level, below ``low`` the type collapses to ``unknown``
(classifier.py:196-225, 294-311). Confidence float = min(score/100, 1.0).
"""

from __future__ import annotations

import re
from typing import NamedTuple

from .rules import CLASSIFICATION_RULESETS, CONFIDENCE_THRESHOLDS


class ClassifyResult(NamedTuple):
    document_type: str
    confidence: float
    indicators: tuple[str, ...]
    score: float
    confidence_level: str | None  # HIGH / MEDIUM / LOW / None


# Pre-compile every scoring pattern once per process.
_COMPILED: list[tuple[str, list[tuple[re.Pattern, float, str]]]] = [
    (
        name,
        [
            (re.compile(pat, 0 if cs else re.IGNORECASE), weight, desc)
            for (pat, weight, cs), desc in zip(patterns, descriptions)
        ],
    )
    for name, patterns, descriptions in CLASSIFICATION_RULESETS
]


def score_type(text: str, type_name: str) -> tuple[float, list[str]]:
    """Score one document type; returns (score, matched indicator texts)."""
    for name, compiled in _COMPILED:
        if name == type_name:
            score = 0.0
            hits: list[str] = []
            for rx, weight, desc in compiled:
                if rx.search(text):
                    score += weight
                    hits.append(desc)
            return score, hits
    raise KeyError(type_name)


def classify_text(text: str) -> ClassifyResult:
    """Classify raw (pre-normalization) document text.

    Mirrors ``classify()`` at classifier.py:232-339 with
    ``min_confidence=None``.
    """
    if not text or not text.strip():
        return ClassifyResult("unknown", 0.0, ("No text to classify",), 0.0, None)

    best_name: str | None = None
    best_score = 0.0
    best_hits: list[str] = []
    for name, _ in _COMPILED:
        score, hits = score_type(text, name)
        if score > best_score:  # strictly greater: earlier rule set wins ties
            best_name, best_score, best_hits = name, score, hits

    if best_name is None or best_score == 0:
        return ClassifyResult("unknown", 0.0, ("No patterns matched",), 0.0, None)

    conf = min(best_score / 100.0, 1.0)
    if best_score >= CONFIDENCE_THRESHOLDS["high"]:
        level = "HIGH"
    elif best_score >= CONFIDENCE_THRESHOLDS["medium"]:
        level = "MEDIUM"
    elif best_score >= CONFIDENCE_THRESHOLDS["low"]:
        level = "LOW"
    else:
        # Below the low threshold the type collapses to unknown but the
        # normalized confidence is still reported (classifier.py:306-311).
        return ClassifyResult(
            "unknown",
            conf,
            tuple(best_hits) + (f"Score {best_score} below minimum threshold",),
            best_score,
            None,
        )

    return ClassifyResult(best_name, conf, tuple(best_hits), best_score, level)
