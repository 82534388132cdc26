"""Filename-quality evaluation + replacement decision matrix — parity
with the articles-variant legacy evaluator
(zOld-Code/step1--Base_FILENAME--b-articles/src/filename_evaluator.py:1-162).

Semantics captured bug-for-bug:

- GARBAGE patterns short-circuit to ("LOW", -5) at the FIRST match in
  list order (reasons name that pattern only), case-insensitively.
- BAD indicators use re.findall COUNTS (non-overlapping, case-SENSITIVE)
  times their penalty; GOOD indicators are boolean re.search bonuses.
- "meaningful words" = capitalized [A-Z][a-z]+ runs of length >= 3;
  >= 3 of them +1, <= 1 of them -1 (exactly 2 is neutral).
- stem length < 10 is -1; 15..80 inclusive is +1 (10..14 and > 80
  neutral — the reference's gap, preserved).
- quality: score >= 3 HIGH, >= 1 MEDIUM, else LOW.
- should_replace: the 9-cell decision matrix; UNKNOWN extraction never
  replaces; force always replaces.

The pattern lists transcribe the reference's rule DATA (required for
byte-exact parity — same adjudication as the YAML rule tables).
"""

from __future__ import annotations

import re

GARBAGE_PATTERNS = [
    r"^download",
    r"^document",
    r"^untitled",
    r"^article",
    r"^paper",
    r"^file",
    r"^new",
    r"^ssrn[-_]",
    r"^jstor[-_]",
    r"^doi[-_]",
    r"^westlaw[-_]",
    r"^lexis[-_]",
    r"^\d+$",
    r"^[a-f0-9]{8,}",
]

BAD_INDICATORS = [
    (r"\(\d+\)", -2),
    (r"\s+\(\d+\)", -2),
    (r"\.tmp", -3),
    (r"^.{1,5}\.", -2),
    (r"^.{150,}\.", -1),
    (r"\s{2,}", -1),
    (r"[^\w\s\-_\.]", -1),
]

GOOD_INDICATORS = [
    (r"[A-Z][a-z]{2,}", 1),
    (r"\d{4}", 1),
    (r"[_\-]", 1),
    (r"[A-Z][a-z]+(?:[_\s][A-Z][a-z]+){2,}", 1),
]

_MATRIX = {
    ("HIGH", "HIGH"): (True, "Both high quality - extracted version likely better"),
    ("HIGH", "MEDIUM"): (True, "High confidence extraction"),
    ("HIGH", "LOW"): (True, "High confidence extraction, existing filename is garbage"),
    ("MEDIUM", "HIGH"): (False, "Keeping good manual filename (extraction only MEDIUM confidence)"),
    ("MEDIUM", "MEDIUM"): (True, "Probable improvement"),
    ("MEDIUM", "LOW"): (True, "Any improvement over garbage filename"),
    ("LOW", "HIGH"): (False, "Keeping good manual filename (extraction only LOW confidence)"),
    ("LOW", "MEDIUM"): (False, "Too risky to replace decent filename"),
    ("LOW", "LOW"): (True, "Existing filename is garbage, can't be worse"),
}


def evaluate_quality(filename: str) -> tuple[str, int, list[str]]:
    """(quality, score, reasons) — filename_evaluator.py:52-122."""
    name_stem = re.sub(r"\.(pdf|docx?)$", "", filename, flags=re.IGNORECASE)
    score = 0
    reasons: list[str] = []
    for pattern in GARBAGE_PATTERNS:
        if re.search(pattern, name_stem, re.IGNORECASE):
            reasons.append(f"Garbage pattern: {pattern}")
            return ("LOW", -5, reasons)
    for pattern, penalty in BAD_INDICATORS:
        matches = re.findall(pattern, name_stem)
        if matches:
            count = len(matches)
            score += penalty * count
            reasons.append(f"Bad: {pattern} (×{count}, {penalty * count} points)")
    for pattern, bonus in GOOD_INDICATORS:
        if re.search(pattern, name_stem):
            score += bonus
            reasons.append(f"Good: {pattern} (+{bonus} points)")
    words = re.findall(r"[A-Z][a-z]+", name_stem)
    meaningful = [w for w in words if len(w) >= 3]
    if len(meaningful) >= 3:
        score += 1
        reasons.append(f"Good: {len(meaningful)} meaningful words (+1)")
    elif len(meaningful) <= 1:
        score -= 1
        reasons.append(f"Bad: Only {len(meaningful)} meaningful words (-1)")
    if len(name_stem) < 10:
        score -= 1
        reasons.append(f"Bad: Very short filename ({len(name_stem)} chars, -1)")
    elif 15 <= len(name_stem) <= 80:
        score += 1
        reasons.append(f"Good: Reasonable length ({len(name_stem)} chars, +1)")
    if score >= 3:
        quality = "HIGH"
    elif score >= 1:
        quality = "MEDIUM"
    else:
        quality = "LOW"
    return (quality, score, reasons)


def should_replace(
    extraction_confidence: str, filename_quality: str, force: bool = False
) -> tuple[bool, str]:
    """Decision matrix — filename_evaluator.py:124-162."""
    if force:
        return (True, "Forced replacement (--force flag)")
    if extraction_confidence == "UNKNOWN":
        return (False, "Extraction failed")
    key = (extraction_confidence, filename_quality)
    if key in _MATRIX:
        return _MATRIX[key]
    return (
        False,
        f"Unknown combination: {extraction_confidence} extraction, "
        f"{filename_quality} quality",
    )
