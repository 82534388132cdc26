"""Caselaw metadata extraction kernel (SURVEY.md §2.5 W3, §2.3 J1–J2, ⚖).

Priority-ordered first-match regex extraction of case_name / year / court /
citation, mirroring src/plugins/caselaw.py:105-466. Notable bug-for-bug
behaviors preserved:

  - the courts-DB scan inside ``_get_state_abbreviation`` (caselaw.py:373-379)
    never matches because the nested JSON has no top-level ``name`` keys, so
    only the literal six-state fallback map is live — we implement exactly
    that map (rules.STATE_ABBREVIATIONS);
  - the federal-district pattern ends in a lazy ``([A-Za-z\\s]+?)`` with
    nothing after it, so the captured "state" is a single character (e.g.
    ``I`` for Illinois); it then misses the fallback map and passes through
    verbatim, yielding courts like ``ND I``.
"""

from __future__ import annotations

import re
from functools import lru_cache

from .rules import (
    CASE_NAME_RULES,
    CITATION_RULES,
    COURT_RULES,
    DATE_RULES,
    DISTRICT_ABBREVIATIONS,
    STATE_ABBREVIATIONS,
)


@lru_cache(maxsize=64)
def _rx(pattern: str, flags: int = 0) -> re.Pattern:
    return re.compile(pattern, flags)


def _cleanup_party(party: str, cleanup_patterns: list[str]) -> str:
    """Strip procedural designations from a party name (caselaw.py:205-224)."""
    party = party.strip()
    for pat in cleanup_patterns:
        party = re.sub(pat, "", party, flags=re.IGNORECASE)
    return party.strip().strip(",").strip()


def extract_case_name(text: str) -> str | None:
    for rule in CASE_NAME_RULES:
        m = _rx(rule["pattern"], re.MULTILINE).search(text)
        if m:
            plaintiff = _cleanup_party(
                m.group(1) if (m.lastindex or 0) >= 1 else "",
                rule["plaintiff_cleanup"],
            )
            defendant = _cleanup_party(
                m.group(2) if (m.lastindex or 0) >= 2 else "",
                rule["defendant_cleanup"],
            )
            if plaintiff and defendant:
                return f"{plaintiff} v. {defendant}"
    return None


def extract_year(text: str) -> str | None:
    for pattern, year_group, _conf in DATE_RULES:
        m = _rx(pattern).search(text)
        if m and len(m.groups()) >= year_group:
            return m.group(year_group)
    return None


def _state_abbrev(state: str) -> str:
    return STATE_ABBREVIATIONS.get(state.lower(), state)


def _district_abbrev(district: str) -> str:
    for full, abbrev in DISTRICT_ABBREVIATIONS.items():
        if full in district.lower():
            return abbrev
    return district


def extract_court(text: str) -> str | None:
    for rule in COURT_RULES:
        m = _rx(rule["pattern"]).search(text)
        if not m:
            continue
        kind = rule["kind"]
        if kind == "state_appeals" and (m.lastindex or 0) >= 1:
            return f"{_state_abbrev(m.group(1).strip())} Ct. App."
        if kind == "state_supreme" and (m.lastindex or 0) >= 1:
            return f"{_state_abbrev(m.group(1).strip())} Sup. Ct."
        if kind == "federal_circuit" and (m.lastindex or 0) >= 1:
            return m.group(1).strip()
        if kind == "federal_district" and (m.lastindex or 0) >= 2:
            district = _district_abbrev(m.group(1).strip())
            return f"{district} {_state_abbrev(m.group(2).strip())}"
        return m.group(0)  # fallback: whole match (caselaw.py:359)
    return None


def extract_citation(text: str) -> str | None:
    for reporter, pattern, _conf in CITATION_RULES:
        m = _rx(pattern).search(text)
        if m and len(m.groups()) >= 2:
            return f"{m.group(1)} {reporter} {m.group(2)}"
    return None


def extract_caselaw_metadata(text: str) -> dict[str, str]:
    """All four fields; keys absent when nothing matched (caselaw.py:105-146)."""
    fields: dict[str, str] = {}
    v = extract_case_name(text)
    if v:
        fields["case_name"] = v
    v = extract_year(text)
    if v:
        fields["year"] = v
    v = extract_court(text)
    if v:
        fields["court"] = v
    v = extract_citation(text)
    if v:
        fields["citation"] = v
    return fields
