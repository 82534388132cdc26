"""Legacy caselaw decision-year extraction + composed rename record
(SURVEY.md §2 round-3 addendum DY1-DY3, ⚖).

Pure-Python, deterministic re-implementation of the a-caselaw variant's
``DateExtractor`` (reference: zOld-Code/step1--Base_FILENAME--a-caselaw/
src/extractors/date_extractor.py:1-130) — DISTINCT from the b-articles
publication-year chain (AR3): a labeled-date priority walk
(Decided: > Filed: > Dated:, each trying colon-labeled, space-labeled and
date-before-label shapes) with 1700..2025 validation, and a filename
fallback chain (parenthetical > U.S. Dist. LEXIS > WL > first 4-digit
run) — plus the renamer's composed finish (renamer.py:113-260): source
tracking with its note strings, the 4-source confidence grade, the
``c.{court}__{year}__{case_name}__{reporter}{ext}`` template, and the
legacy sanitize/truncate pair (renamer.py:37-85).

Pattern DATA is transcribed verbatim (provenance in-line) — required for
byte-exact semantics, same adjudication as rules.py. Control flow is
re-derived and pinned by tests/test_legacy_rename_differential.py, which
drives the ACTUAL DateExtractor and the ACTUAL CaselawRenamer.process_file
(text extraction stubbed, court/reporter injected — those extractors have
their own differential in tests/test_dims.py) side-by-side.

Bug-for-bug behaviors preserved (differential-pinned):
  - the labeled patterns compile IGNORECASE, so ``[A-Z][a-z]+`` month
    words match any case and ``decided:`` lowercase labels hit;
  - a label match with an out-of-range year does NOT fall through to the
    next label — it falls through to the next PATTERN of the same label
    first, and only a full miss advances the label walk;
  - ``case_name`` "Unknown" is truthy, so a caption-less document still
    renames when court/year/reporter resolved;
  - extraction fallbacks run on the filename STEM (``Path(...).stem``,
    renamer.py:98), so the formatter's own ``.pdf``-stripping filename
    pattern is dead code in the composed flow.
"""

from __future__ import annotations

import os
import re

MIN_YEAR, MAX_YEAR = 1700, 2025  # date_extractor.py:14-16

MAX_FILENAME_LENGTH = 255  # renamer.py:19
ILLEGAL_FILENAME_CHARS = r'[<>:"/\\|?*\x00-\x1f]'  # renamer.py:20

_LABELS = ("Decided", "Filed", "Dated")  # priority order, date_extractor.py:30-44


def _validate_year(year_str) -> bool:
    try:
        year = int(year_str)
        return MIN_YEAR <= year <= MAX_YEAR
    except (ValueError, TypeError):
        return False


def _find_labeled_date(text: str, label: str) -> str | None:
    """date_extractor.py:47-74 — colon-labeled, space-labeled,
    date-before-label; first pattern whose year validates wins."""
    patterns = [
        rf"{label}:\s*([A-Z][a-z]+\s+\d{{1,2}},\s+(\d{{4}}))",
        rf"{label}\s+([A-Z][a-z]+\s+\d{{1,2}},\s+(\d{{4}}))",
        rf"([A-Z][a-z]+\s+\d{{1,2}},\s+(\d{{4}})),?\s+{label}",
    ]
    for pattern in patterns:
        match = re.search(pattern, text, re.IGNORECASE)
        if match:
            year = match.group(2)
            if _validate_year(year):
                return year
    return None


def extract_year_from_pdf(pdf_text: str) -> str | None:
    """Decision year via the Decided > Filed > Dated label walk
    (date_extractor.py:18-45)."""
    if not pdf_text:
        return None
    for label in _LABELS:
        year = _find_labeled_date(pdf_text, label)
        if year:
            return year
    return None


def extract_year_from_filename(filename: str) -> str | None:
    """Filename fallback chain (date_extractor.py:93-130)."""
    paren_match = re.search(r"\(.*?(\d{4})\)", filename)
    if paren_match and _validate_year(paren_match.group(1)):
        return paren_match.group(1)
    lexis_match = re.search(r"(\d{4})\s+U\.S\.\s+Dist\.\s+LEXIS", filename)
    if lexis_match and _validate_year(lexis_match.group(1)):
        return lexis_match.group(1)
    wl_match = re.search(r"(\d{4})\s+WL", filename)
    if wl_match and _validate_year(wl_match.group(1)):
        return wl_match.group(1)
    year_match = re.search(r"(\d{4})", filename)
    if year_match and _validate_year(year_match.group(1)):
        return year_match.group(1)
    return None


def legacy_sanitize_filename(filename: str) -> str:
    """renamer.py:37-53."""
    sanitized = re.sub(ILLEGAL_FILENAME_CHARS, "", filename)
    sanitized = "".join(char for char in sanitized if ord(char) >= 32)
    return sanitized.strip(". ")


def legacy_validate_and_truncate(filename: str, max_length: int = MAX_FILENAME_LENGTH):
    """renamer.py:56-85 — returns (filename, was_truncated, warning)."""
    if len(filename) <= max_length:
        return (filename, False, None)
    parts = filename.rsplit(".", 1)
    if len(parts) == 2:
        stem, ext = parts
        max_stem_length = max_length - len(ext) - 1
        if max_stem_length > 0:
            truncated = f"{stem[:max_stem_length]}.{ext}"
            return (
                truncated,
                True,
                f"Filename truncated from {len(filename)} to {len(truncated)} characters",
            )
    truncated = filename[:max_length]
    return (
        truncated,
        True,
        f"Filename truncated from {len(filename)} to {max_length} characters",
    )


def legacy_rename_confidence(result: dict) -> str:
    """renamer.py:262-283 — count of 'document' sources over the four
    extraction source keys."""
    document_sources = sum(
        1
        for key in ("court_source", "year_source", "case_name_source", "reporter_source")
        if result.get(key) == "document"
    )
    if document_sources >= 3:
        return "HIGH"
    if document_sources >= 2:
        return "MEDIUM"
    return "LOW"


def legacy_rename_for_doc(
    document_text: str,
    file_name: str,
    court: str | None,
    court_source: str | None,
    reporter: str | None,
    reporter_source: str | None,
) -> dict:
    """The renamer's composed flow from extracted text to the final
    record (renamer.py:87-260), with court/reporter resolution injected
    (those extractors are covered by the dims path, tests/test_dims.py).

    ``file_name`` is the on-disk name; fallback extraction runs on its
    STEM like the reference (renamer.py:98).
    """
    from .case_name_legacy import (
        expand_abbreviations,
        extract_case_name_from_filename,
        extract_case_name_from_pdf,
        format_case_name_legacy,
    )

    stem, extension = os.path.splitext(file_name)
    extension = extension.lower()
    if extension not in (".pdf", ".docx"):
        return {
            "original_filename": file_name,
            "error": f"Unsupported file type: {extension}",
            "new_filename": None,
        }

    result = {
        "original_filename": file_name,
        "court": None,
        "court_source": None,
        "year": None,
        "year_source": None,
        "case_name": None,
        "case_name_source": None,
        "reporter": None,
        "reporter_source": None,
        "new_filename": None,
        "confidence": "UNKNOWN",
        "notes": [],
    }

    # 1. court (injected; note string per renamer.py:141-143)
    if court:
        result["court"] = court
        result["court_source"] = court_source
        if court_source == "filename":
            result["notes"].append("Court from filename (document extraction failed)")

    # 2. year (renamer.py:145-155)
    year = extract_year_from_pdf(document_text)
    if year:
        result["year"] = year
        result["year_source"] = "document"
    else:
        year = extract_year_from_filename(stem)
        if year:
            result["year"] = year
            result["year_source"] = "filename"
            result["notes"].append("Year from filename (document extraction failed)")

    # 3. case name (renamer.py:157-172)
    raw_case_name = extract_case_name_from_pdf(document_text)
    if raw_case_name:
        result["case_name_source"] = "document"
    else:
        raw_case_name = extract_case_name_from_filename(stem)
        result["case_name_source"] = "filename"
    if raw_case_name:
        result["case_name"] = format_case_name_legacy(expand_abbreviations(raw_case_name))
    else:
        result["case_name"] = "Unknown"
        result["notes"].append("Case name could not be extracted")

    # 4. reporter (injected; Unpub note per renamer.py:221-224)
    if reporter:
        result["reporter"] = reporter
        result["reporter_source"] = reporter_source
        if reporter_source == "fallback":
            result["notes"].append("No reporter citation found - marked as Unpub")

    # 5. confidence
    result["confidence"] = legacy_rename_confidence(result)

    # 6. filename (renamer.py:231-259)
    if result["court"] and result["year"] and result["case_name"] and result["reporter"]:
        new_filename = (
            f"c.{result['court']}__{result['year']}__"
            f"{result['case_name']}__{result['reporter']}{extension}"
        )
        new_filename = legacy_sanitize_filename(new_filename)
        new_filename, was_truncated, warning = legacy_validate_and_truncate(new_filename)
        if was_truncated:
            result["notes"].append(warning)
        result["new_filename"] = new_filename
    else:
        missing = []
        if not result["court"]:
            missing.append("court")
        if not result["year"]:
            missing.append("year")
        if not result["case_name"]:
            missing.append("case name")
        if not result["reporter"]:
            missing.append("reporter")
        result["notes"].append(
            "Could not generate filename - missing: " + ", ".join(missing)
        )

    return result
