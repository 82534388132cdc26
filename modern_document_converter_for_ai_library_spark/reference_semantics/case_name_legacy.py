"""Legacy caselaw case-name caption extraction + filename formatting
kernel (SURVEY.md §2 round-3 addendum CN1-CN4, ⚖).

Pure-Python, deterministic re-implementation of the a-caselaw variant's
``CaseNameFormatter`` (reference: zOld-Code/step1--Base_FILENAME--
a-caselaw/src/formatters/case_name_formatter.py:1-251) — DISTINCT from the
modern filename formatter's ``format_case_name`` (N9): this is the older
caption-mining flow (own-line "v" strategy, context-window regex), the
"smart" one-word party selection (surname for 3+-word person names,
two-word geographic names kept whole), and the abbreviation expander the
legacy renamer applies before formatting (renamer.py:158-172).

Pattern/choice-list DATA is transcribed verbatim (provenance:
case_name_formatter.py:41-251) — required for byte-exact semantics, same
adjudication as rules.py. Control flow is re-derived and pinned by
tests/test_case_name_legacy_differential.py, which runs the ACTUAL
reference class side-by-side on fuzzed caption text.

Bug-for-bug behaviors preserved (differential-pinned):
  - strategy 2's context regex only knows ``v\\.?`` — a same-line "vs."
    caption found by the line scan yields no match and the scan moves on
    (case_name_formatter.py:66-88);
  - with IGNORECASE the ``[A-Z]`` anchor of the context regex matches any
    case, so lowercase captions extract too;
  - suffix cleanup applies Petitioner/Plaintiff/Appellant only to the
    LEFT party and Respondent/Defendant/Appellee only to the RIGHT;
  - ``_format_party_name`` keeps hyphens (the special-char class lacks
    ``-``), so pre-hyphenated tokens survive verbatim;
  - the person-name test fires on ANY 3+-word party whose last word is
    not in the corporate/geographic stop list — "John H Alden" and
    "Bank of Georgia Trust" alike take the last word.
"""

from __future__ import annotations

import re

_V_LINE = {"v", "v.", "vs", "vs."}

_LEFT_SUFFIXES = [
    r",?\s*Petitioners?$",
    r",?\s*Plaintiffs?$",
    r",?\s*Appellants?$",
    r",?\s*et al\.?$",
]

_RIGHT_SUFFIXES = [
    r",?\s*Respondents?$",
    r",?\s*Defendants?$",
    r",?\s*Appellees?$",
]

_CONTEXT_RX = re.compile(
    r"([A-Z][A-Za-z\s,\.&\'\-\(\)]+?)\s+v\.?\s+([A-Za-z\s,\.&\'\-\(\)]+?)(?:\n|$)",
    re.IGNORECASE,
)

_V_SPLIT_RX = re.compile(r"\s+v\.?\s+|\s+vs\.?\s+", re.IGNORECASE)

_SPECIAL_RX = re.compile(r"[.,\'\"&();:]")

_CORPORATE_LAST_WORDS = ["States", "America", "LLC", "Inc", "Corp", "Ltd"]
_GEO_FIRST_WORDS = ["United", "New", "North", "South", "East", "West"]

_EXPANSIONS = [
    (r"\bU\.?S\.?\b", "United States"),
    (r"\bMe\.?\b", "Maine"),
    (r"\bMd\.?\b", "Maryland"),
    (r"\bMass\.?\b", "Massachusetts"),
    (r"\bCal\.?\b", "California"),
    (r"\bFla\.?\b", "Florida"),
]


def extract_case_name_from_pdf(pdf_text: str) -> str | None:
    """Caption mining over the first 40 non-empty lines
    (case_name_formatter.py:24-89)."""
    if not pdf_text:
        return None
    lines = [l.strip() for l in pdf_text.split("\n") if l.strip()]
    lines = [l for l in lines if not re.match(r"^(AM|PM)\s+Z$", l, re.IGNORECASE)]

    # Strategy 1: "v" on its own line (multi-line caption)
    for i, line in enumerate(lines[:40]):
        if line.lower() in _V_LINE:
            if i > 0 and i < len(lines) - 1:
                left_party = lines[i - 1].strip()
                right_party = lines[i + 1].strip()
                for pat in _LEFT_SUFFIXES:
                    left_party = re.sub(pat, "", left_party, flags=re.IGNORECASE)
                for pat in _RIGHT_SUFFIXES:
                    right_party = re.sub(pat, "", right_party, flags=re.IGNORECASE)
                if left_party and right_party:
                    return f"{left_party} v. {right_party}"

    # Strategy 2: "v." on the same line, extracted from a context window
    for i, line in enumerate(lines[:40]):
        if re.search(r"\s+v\.?\s+|\s+vs\.?\s+", line, re.IGNORECASE):
            start = max(0, i - 2)
            end = min(len(lines), i + 3)
            context = "\n".join(lines[start:end])
            match = _CONTEXT_RX.search(context)
            if match:
                return f"{match.group(1).strip()} v. {match.group(2).strip()}"

    return None


def extract_case_name_from_filename(filename: str) -> str | None:
    """Filename fallback (case_name_formatter.py:91-123)."""
    filename = re.sub(r"^law\s*-\s*[A-Z\s]+-\s*", "", filename, flags=re.IGNORECASE)
    filename = re.sub(r"_Attachment\d*", "", filename)
    match = re.search(r"^(.+?)\s*\(", filename)
    if match:
        return match.group(1).strip()
    match = re.search(r"^(.+?)_\s*\d{4}\s+", filename)
    if match:
        return match.group(1).strip()
    match = re.search(r"^(.+?)\.(?:pdf|docx?)$", filename, re.IGNORECASE)
    if match:
        return match.group(1).strip()
    return None


def _format_party_name(party_name: str, max_words: int) -> str:
    party_name = re.sub(r"\b(AM|PM)\s+Z\s*", "", party_name, flags=re.IGNORECASE)
    party_name = re.sub(r"\s*et\s+al\.?\s*", "", party_name, flags=re.IGNORECASE)
    party_name = _SPECIAL_RX.sub("", party_name)
    words = party_name.split()
    if not words:
        return "Unknown"
    if max_words == 1:
        is_persons_name = len(words) >= 3 and words[-1] not in _CORPORATE_LAST_WORDS
        if is_persons_name:
            selected_words = [words[-1]]
        elif len(words) == 2 and words[0] in _GEO_FIRST_WORDS:
            selected_words = words
        else:
            selected_words = words[:1]
    else:
        selected_words = words[:max_words]
    return "-".join(selected_words) if selected_words else "Unknown"


def _sanitize_party_name(name: str, max_words: int) -> str:
    name = _SPECIAL_RX.sub("", name)
    words = name.split()[: max_words * 2]
    return "-".join(words) if words else "Unknown"


def format_case_name_legacy(raw_case_name: str, max_words: int = 1) -> str:
    """Filename-safe case-name formatting
    (case_name_formatter.py:125-161). The legacy renamer instantiates
    ``max_words_per_party=1`` (renamer.py:33)."""
    if not raw_case_name:
        return "Unknown"
    parts = _V_SPLIT_RX.split(raw_case_name, maxsplit=1)
    if len(parts) != 2:
        return _sanitize_party_name(raw_case_name, max_words)
    left_party, right_party = parts
    left_party = left_party.split(",")[0].strip()
    right_party = right_party.split(",")[0].strip()
    return "%s-v-%s" % (
        _format_party_name(left_party, max_words),
        _format_party_name(right_party, max_words),
    )


def expand_abbreviations(case_name: str) -> str:
    """Pre-format abbreviation expansion (case_name_formatter.py:228-251)."""
    for pattern, replacement in _EXPANSIONS:
        case_name = re.sub(pattern, replacement, case_name, flags=re.IGNORECASE)
    return case_name


def legacy_case_name_for_doc(document_text: str, file_name: str) -> dict:
    """The renamer's composed case-name flow (renamer.py:157-172):
    document caption first, filename fallback, expand, format.

    ``file_name`` is the on-disk name; the fallback runs on its STEM like
    the reference (renamer.py:98 ``original_filename = file_path.stem``),
    which makes the formatter's own extension-stripping filename pattern
    dead code in this composition — same note as caselaw_dates.py."""
    import os

    stem = os.path.splitext(file_name)[0]
    raw = extract_case_name_from_pdf(document_text)
    source = "document" if raw else "filename"
    if not raw:
        raw = extract_case_name_from_filename(stem)
    if raw:
        raw = expand_abbreviations(raw)
        return {"case_name": format_case_name_legacy(raw), "case_name_source": source}
    return {"case_name": "Unknown", "case_name_source": source}
