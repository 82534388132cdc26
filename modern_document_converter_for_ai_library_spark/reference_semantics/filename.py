"""Filename formatting kernel (SURVEY.md §2.7 N9–N11, ⚖).

Field formatters + template render + sanitize + truncate, mirroring
src/formatters/filename_formatter.py:91-383 and the template config
(config/filename_templates/caselaw.yaml:26,115-128).
"""

from __future__ import annotations

import re

from .rules import FILENAME_FALLBACKS, FILENAME_TEMPLATE, MAX_FILENAME_LENGTH

_ILLEGAL = re.compile(r'[<>:"/\\|?*\x00-\x1f]')
_NON_CASE = re.compile(r"[^a-zA-Z0-9\-]")
_HYPHEN_RUN = re.compile(r"-+")
_NON_CITE = re.compile(r"[^a-zA-Z0-9_]")
_UNDERSCORE_RUN = re.compile(r"_+")


def format_court(court: str) -> str:
    """``Ga. Ct. App.`` -> ``Ga_Ct_App`` (formatter.py:149-177)."""
    if not court:
        return FILENAME_FALLBACKS["court"][0]
    return court.replace(".", "").replace(" ", "_")


def format_year(year: str) -> str:
    return year if year else FILENAME_FALLBACKS["year"][0]


def format_case_name(case_name: str) -> str:
    """``Abbott Labs. v. Sandoz, Inc`` -> ``Abbott-Labs-v-Sandoz-Inc``."""
    if not case_name:
        return FILENAME_FALLBACKS["case_name"][0]
    s = case_name.replace("&", "and").replace(".", "").replace(",", "")
    s = s.replace(" ", "-")
    s = _NON_CASE.sub("", s)
    s = _HYPHEN_RUN.sub("-", s)
    return s.strip("-")


def format_citation(citation: str) -> str:
    """``759 S.E.2d 654`` -> ``759_SE2d_654``."""
    if not citation:
        return FILENAME_FALLBACKS["citation"][0]
    s = citation.replace(".", "").replace(" ", "_")
    s = _NON_CITE.sub("", s)
    s = _UNDERSCORE_RUN.sub("_", s)
    return s.strip("_")


def sanitize_filename(filename: str) -> str:
    """Strip OS-illegal chars + control chars, trim ``. `` (formatter.py:294-322)."""
    s = _ILLEGAL.sub("", filename)
    s = "".join(ch for ch in s if ord(ch) >= 32)
    return s.strip(". ")


def truncate_if_needed(filename: str, max_length: int = MAX_FILENAME_LENGTH) -> str:
    """Trim the stem to fit ``max_length``, preserving the extension."""
    if len(filename) <= max_length:
        return filename
    parts = filename.rsplit(".", 1)
    if len(parts) != 2:
        return filename[:max_length]
    stem, ext = parts
    max_stem = max_length - len(ext) - 1
    if max_stem <= 0:
        return filename[:max_length]
    return f"{stem[:max_stem]}.{ext}"


def validate_required_fields(fields: dict[str, str]) -> bool:
    for name, (_fallback, required) in FILENAME_FALLBACKS.items():
        if required and not fields.get(name):
            return False
    return True


def format_filename(
    fields: dict[str, str], code: str, extension: str
) -> str | None:
    """Render the canonical caselaw filename, or None when required fields
    are missing (formatter.py:91-142)."""
    if not validate_required_fields(fields):
        return None
    stem = FILENAME_TEMPLATE.format(
        court=format_court(fields.get("court", "")),
        year=format_year(fields.get("year", "")),
        case_name=format_case_name(fields.get("case_name", "")),
        citation=format_citation(fields.get("citation", "")),
        code=code,
    )
    return truncate_if_needed(sanitize_filename(f"{stem}{extension}"))
