"""Legacy caselaw DEEP-metadata extraction kernel (SURVEY.md §2 round-3
addendum CM1–CM9, ⚖).

Pure-Python, deterministic re-implementation of the a-caselaw variant's
comprehensive metadata pass (reference: zOld-Code/step1--Base_FILENAME--
a-caselaw/src/extractors/metadata_extractor.py:1-550) — the fields the
MODERN plugin (reference_semantics/metadata.py, W3) does NOT extract:
disposition, opinion author/type, lower-court judge, appellate panel,
concurring/dissenting judges, counsel, docket number, full decision date,
the compact-reporter → legal-citation formatter, and the weighted overall
confidence score.

The regex tables below transcribe the reference's pattern DATA verbatim
(provenance: metadata_extractor.py:18-105) — required for byte-exact
semantics, same adjudication as rules.py. Control flow is re-derived from
the documented semantics and pinned by
tests/test_caselaw_metadata_differential.py, which runs the ACTUAL
reference module side-by-side on fuzzed court-opinion text.

Bug-for-bug behaviors preserved (each differential-pinned):
  - every pattern family except the full-date one is searched with
    re.IGNORECASE, so character classes like ``[A-Z][a-z]+`` match any
    case (metadata_extractor.py:173+);
  - the disposition HIGH-confidence test checks the LITERAL substring
    ``Disposition:`` case-sensitively against a match produced by a
    case-insensitive search (:278);
  - the concur/dissent section-header pattern (``([A-Z][A-Za-z]+),.*?
    (?:CONCURRING|DISSENTING)``) lazily stops at the first keyword, so a
    "concurring in part" vote is ALSO appended to the plain concurring
    list by the 5th pattern after the 1st pattern filed it under
    concurring_in_part (:371-387);
  - greedy optional second-name groups can swallow a following
    capitalized word ("District Judge Smith Heard ...") (:46-53);
  - extraction_timestamp is EXCLUDED here (datetime.now() at :141 —
    nondeterministic); callers stamp wall-clock provenance themselves.
"""

from __future__ import annotations

import re
from functools import lru_cache

# --- pattern data transcribed from metadata_extractor.py:18-105 -----------

DISPOSITION_PATTERNS = [
    r'(?:judgment|decision|order)\s+(?:is\s+)?(AFFIRMED|REVERSED|VACATED|REMANDED|DISMISSED)',
    r'(?:AFFIRM|REVERSE|VACATE|REMAND|DISMISS)(?:ED|ING)?(?:\s+in\s+part)?(?:\s+and\s+\w+ed)?',
    r'Disposition:\s*(.+?)(?:\n|\.)',
]

OPINION_AUTHOR_PATTERNS = [
    r'([A-Z][A-Za-z]+),\s+(?:C\.)?J\.,\s+delivered the opinion',
    r'(?:Justice|Judge)\s+([A-Z][A-Za-z]+)\s+delivered the opinion',
    r'OPINION BY (?:JUSTICE|JUDGE)\s+([A-Z][A-Z]+)',
    r'([A-Z][A-Za-z]+),\s+J\.,\s+delivered',
]

OPINION_TYPE_PATTERNS = [
    r'(MAJORITY|PLURALITY|PER CURIAM) OPINION',
    r'OPINION (?:OF|BY) THE COURT',
    r'\bPER CURIAM\b',
]

LOWER_COURT_JUDGE_PATTERNS = [
    r'District Judge\s+([A-Z][A-Za-z]+(?:\s+[A-Z][A-Za-z]+)?)',
    r'Judge\s+([A-Z][A-Za-z]+(?:\s+[A-Z][A-Za-z]+)?)\s+presiding',
    r'before\s+(?:District\s+)?Judge\s+([A-Z][A-Za-z]+)',
]

PANEL_PATTERNS = [
    r'Before\s+((?:[A-Z][A-Za-z]+(?:,\s+)?(?:and\s+)?)+),\s+(?:Circuit|District)?\s*Judges',
    r'Panel:\s+((?:[A-Z][A-Za-z]+(?:,\s+)?(?:and\s+)?)+)',
]

CONCUR_DISSENT_PATTERNS = [
    r'(?:Justice|Judge)\s+([A-Z][A-Za-z]+)(?:,|\s+)(?:with whom[^,]+,\s+)?concurring(?:\s+in\s+part)?',
    r'([A-Z][A-Za-z]+),\s+J\.,\s+concurring(?:\s+in\s+part)?',
    r'(?:Justice|Judge)\s+([A-Z][A-Za-z]+)(?:,|\s+)(?:with whom[^,]+,\s+)?dissenting(?:\s+in\s+part)?',
    r'([A-Z][A-Za-z]+),\s+J\.,\s+dissenting(?:\s+in\s+part)?',
    r'([A-Z][A-Za-z]+),.*?(?:CONCURRING|DISSENTING)',
]

ATTORNEY_PATTERNS = [
    r'([A-Z][a-z]+(?:\s+[A-Z]\.)?(?:\s+[A-Z][a-z]+)+)\s+argued the cause for\s+(petitioner|respondent|appellant|appellee)',
    r'Attorney for\s+(petitioner|respondent|appellant|appellee):\s+([A-Z][a-z]+(?:\s+[A-Z][a-z]+)+)',
    r'([A-Z][a-z]+(?:\s+[A-Z][a-z]+)+),\s+\w+,\s+\w+,\s+for\s+(petitioner|respondent|appellant|appellee)',
]

DOCKET_PATTERNS = [
    r'(?:Case|Civil\s+Action)?\s*No\.\s+(\d+:\d{2}-[a-z]{2,3}-\d+)',
    r'(?:Case|Docket|Civil\s+Action)?\s*No\.\s+(\d{2,4}-\d{3,5})',
    r'No\.\s+(\d{2,3}-\d{3,4})',
]

FULL_DATE_PATTERNS = [
    r'(?:Decided|Filed|Argued|Submitted):\s*([A-Z][a-z]+\s+\d{1,2},\s+\d{4})',
    r'([A-Z][a-z]+\s+\d{1,2},\s+\d{4})',
]

# compact-reporter -> legal-citation table (metadata_extractor.py:500-524)
REPORTER_LEGAL_FORMS = {
    'US': 'U.S.',
    'SCt': 'S. Ct.',
    'LEd2d': 'L. Ed. 2d',
    'FSupp3d': 'F. Supp. 3d',
    'FSupp2d': 'F. Supp. 2d',
    'FSupp': 'F. Supp.',
    'F4th': 'F.4th',
    'F3d': 'F.3d',
    'F2d': 'F.2d',
    'SE2d': 'S.E.2d',
    'NE3d': 'N.E.3d',
    'P3d': 'P.3d',
    'A3d': 'A.3d',
    'SW3d': 'S.W.3d',
    'NW2d': 'N.W.2d',
    'So3d': 'So.3d',
    'GaApp': 'Ga. App.',
    'Ga': 'Ga.',
    'USDistLEXIS': 'U.S. Dist. LEXIS',
    'GaStateLEXIS': 'Ga. State LEXIS',
    'WL': 'WL',
}

_SECTION_MARK = '[LAST_PAGES_SECTION]'


@lru_cache(maxsize=128)
def _rx(pattern: str, flags: int = 0) -> re.Pattern:
    return re.compile(pattern, flags)


def extract_disposition(text: str) -> dict:
    """Judgment outcome over header[:2000] + conclusion footer (:252-281)."""
    if not text:
        return {'value': '', 'confidence': ''}
    header = text[:2000]
    if _SECTION_MARK in text:
        footer = text.split(_SECTION_MARK)[1][:2000]
    else:
        footer = text[-2000:]
    search_text = header + '\n' + footer
    # guard: every pattern requires a disposition verb stem or the literal
    # label — skipping the scans is observationally identical (pure
    # optimization; differential-pinned)
    low = search_text.lower()
    if not any(
        k in low
        for k in ('affirm', 'revers', 'vacat', 'remand', 'dismiss', 'disposition:')
    ):
        return {'value': '', 'confidence': ''}
    for pattern in DISPOSITION_PATTERNS:
        match = _rx(pattern, re.IGNORECASE).search(search_text)
        if match:
            disposition = match.group(1) if match.lastindex else match.group(0)
            disposition = disposition.strip().capitalize()
            if 'judgment' in match.group(0).lower() or 'Disposition:' in match.group(0):
                return {'value': disposition, 'confidence': 'HIGH'}
            return {'value': disposition, 'confidence': 'MEDIUM'}
    return {'value': '', 'confidence': ''}


def extract_opinion_author(text: str) -> dict:
    """Authoring judge; Per Curiam short-circuits on text[:3000] (:283-301)."""
    if not text:
        return {'value': '', 'confidence': ''}
    if _rx(r'\bPER CURIAM\b', re.IGNORECASE).search(text[:3000]):
        return {'value': 'Per Curiam', 'confidence': 'HIGH'}
    header = text[:5000]
    low = header.lower()
    if 'delivered' not in low and 'opinion by' not in low:
        return {'value': '', 'confidence': ''}
    for pattern in OPINION_AUTHOR_PATTERNS:
        match = _rx(pattern, re.IGNORECASE).search(header)
        if match:
            return {'value': match.group(1).strip().title(), 'confidence': 'HIGH'}
    return {'value': '', 'confidence': ''}


def extract_opinion_type(text: str) -> dict:
    """Majority / plurality / per-curiam tag over text[:3000] (:299-315)."""
    if not text:
        return {'value': '', 'confidence': ''}
    low = text[:3000].lower()
    if 'opinion' not in low and 'per curiam' not in low:
        return {'value': '', 'confidence': ''}
    for pattern in OPINION_TYPE_PATTERNS:
        match = _rx(pattern, re.IGNORECASE).search(text[:3000])
        if match:
            if 'PER CURIAM' in match.group(0).upper():
                return {'value': 'Per Curiam', 'confidence': 'HIGH'}
            if match.lastindex:
                return {'value': match.group(1).strip().title(), 'confidence': 'HIGH'}
            return {'value': 'Majority', 'confidence': 'MEDIUM'}
    return {'value': '', 'confidence': ''}


def extract_lower_court_judge(text: str) -> dict:
    """Originating-court judge over text[:8000] (:317-331)."""
    if not text:
        return {'value': '', 'confidence': ''}
    header = text[:8000]
    if 'judge' not in header.lower():
        return {'value': '', 'confidence': ''}
    for pattern in LOWER_COURT_JUDGE_PATTERNS:
        match = _rx(pattern, re.IGNORECASE).search(header)
        if match:
            return {'value': match.group(1).strip().title(), 'confidence': 'MEDIUM'}
    return {'value': '', 'confidence': ''}


def extract_panel_members(text: str) -> dict:
    """Appellate panel roster over text[:5000] (:333-352)."""
    if not text:
        return {'value': [], 'confidence': ''}
    header = text[:5000]
    low = header.lower()
    if 'before' not in low and 'panel:' not in low:
        return {'value': [], 'confidence': ''}
    for pattern in PANEL_PATTERNS:
        match = _rx(pattern, re.IGNORECASE).search(header)
        if match:
            judges = re.split(r',\s+(?:and\s+)?', match.group(1))
            judges = [j.strip().title() for j in judges if j.strip()]
            if judges:
                return {'value': judges, 'confidence': 'HIGH'}
    return {'value': [], 'confidence': ''}


def extract_concurring_dissenting(text: str) -> dict:
    """Separate-opinion votes, footer-scoped when the marker exists
    (:354-393). ALL five patterns contribute matches (finditer), dedup is
    per-category keep-order."""
    empty = {'concurring': [], 'dissenting': [], 'concurring_in_part': []}
    if not text:
        return {'value': dict(empty), 'confidence': ''}
    result = {'concurring': [], 'dissenting': [], 'concurring_in_part': []}
    if _SECTION_MARK in text:
        search_text = text.split(_SECTION_MARK)[1]
    else:
        search_text = text
    low = search_text.lower()
    if 'concurring' not in low and 'dissenting' not in low:
        return {'value': result, 'confidence': ''}
    for pattern in CONCUR_DISSENT_PATTERNS:
        for match in _rx(pattern, re.IGNORECASE).finditer(search_text):
            judge = match.group(1).strip().title()
            full_text = match.group(0).lower()
            if 'concurring in part' in full_text:
                if judge not in result['concurring_in_part']:
                    result['concurring_in_part'].append(judge)
            elif 'concurring' in full_text:
                if judge not in result['concurring']:
                    result['concurring'].append(judge)
            elif 'dissenting' in full_text:
                if judge not in result['dissenting']:
                    result['dissenting'].append(judge)
    if result['concurring'] or result['dissenting'] or result['concurring_in_part']:
        return {'value': result, 'confidence': 'MEDIUM'}
    return {'value': result, 'confidence': ''}


def extract_attorneys(text: str) -> dict:
    """Counsel-of-record best effort over text[:5000]; always LOW (:395-427).

    Group roles are resolved by introspection: the group that string-equals
    a party designation is the party, any other group longer than 3 chars
    becomes the name (later qualifying groups overwrite earlier ones)."""
    empty = {'petitioner': [], 'respondent': [], 'appellant': [], 'appellee': []}
    if not text:
        return {'value': dict(empty), 'confidence': ''}
    result = {'petitioner': [], 'respondent': [], 'appellant': [], 'appellee': []}
    header = text[:5000]
    low = header.lower()
    if not any(k in low for k in ('petitioner', 'respondent', 'appellant', 'appellee')):
        return {'value': result, 'confidence': ''}
    for pattern in ATTORNEY_PATTERNS:
        for match in _rx(pattern, re.IGNORECASE).finditer(header):
            party = None
            name = None
            for g in match.groups():
                if g and g.lower() in ['petitioner', 'respondent', 'appellant', 'appellee']:
                    party = g.lower()
                elif g and len(g) > 3:
                    name = g.strip().title()
            if party and name and name not in result[party]:
                result[party].append(name)
    if any(result.values()):
        return {'value': result, 'confidence': 'LOW'}
    return {'value': result, 'confidence': ''}


def extract_docket_number(text: str) -> dict:
    """Docket / case number over text[:2000] (:429-443)."""
    if not text:
        return {'value': '', 'confidence': ''}
    header = text[:2000]
    if 'no.' not in header.lower():
        return {'value': '', 'confidence': ''}
    for pattern in DOCKET_PATTERNS:
        match = _rx(pattern, re.IGNORECASE).search(header)
        if match:
            return {'value': match.group(1).strip(), 'confidence': 'HIGH'}
    return {'value': '', 'confidence': ''}


def extract_full_date(text: str) -> dict:
    """Decision date over text[:2000]; the ONLY case-sensitive family
    (:445-462). HIGH only for Decided:/Filed: labels — Argued:/Submitted:
    match the labeled pattern but grade MEDIUM."""
    if not text:
        return {'value': '', 'confidence': ''}
    header = text[:2000]
    if not any(c.isdigit() for c in header):
        return {'value': '', 'confidence': ''}
    for pattern in FULL_DATE_PATTERNS:
        match = _rx(pattern).search(header)
        if match:
            date_str = match.group(1).strip()
            if 'Decided:' in match.group(0) or 'Filed:' in match.group(0):
                return {'value': date_str, 'confidence': 'HIGH'}
            return {'value': date_str, 'confidence': 'MEDIUM'}
    return {'value': '', 'confidence': ''}


def format_legal_citation(renamer_result: dict) -> str:
    """Compact renamer reporter -> legal citation (:466-498).
    '743_FSupp2d_762' -> '743 F. Supp. 2d 762'; 2-part forms keep
    '<legal> <number>'; unknown shapes pass through verbatim."""
    reporter = renamer_result.get('reporter', '')
    if not reporter or reporter == 'Unpub':
        return ''
    parts = reporter.split('_')
    if len(parts) == 3:
        volume, reporter_abbr, page = parts
        return f"{volume} {REPORTER_LEGAL_FORMS.get(reporter_abbr, reporter_abbr)} {page}"
    if len(parts) == 2:
        reporter_abbr, number = parts
        return f"{REPORTER_LEGAL_FORMS.get(reporter_abbr, reporter_abbr)} {number}"
    return reporter


def calculate_confidence(metadata: dict) -> str:
    """Weighted field-presence score -> HIGH/MEDIUM/LOW (:526-550).
    Core renamer fields weigh 3, date/docket/disposition 2,
    author/panel 1; thresholds 16 and 10 of a 20-point max."""
    score = 0
    for f in ('court', 'year', 'case_name', 'citation'):
        if metadata.get(f):
            score += 3
    for f in ('date_decided', 'docket_number', 'disposition'):
        if metadata.get(f):
            score += 2
    for f in ('opinion_author', 'panel_members'):
        if metadata.get(f):
            score += 1
    if score >= 16:
        return 'HIGH'
    if score >= 10:
        return 'MEDIUM'
    return 'LOW'


def extract_case_metadata(renamer_result: dict, pdf_text: str) -> dict:
    """Full deep-metadata record (:120-248) minus extraction_timestamp
    (nondeterministic, see module docstring). Per-field confidences are
    set ONLY when the field extracted non-empty, like the reference."""
    if not pdf_text:
        pdf_text = ""
    metadata = {
        'case_name': renamer_result.get('case_name', ''),
        'court': renamer_result.get('court', ''),
        'year': renamer_result.get('year', ''),
        'citation': format_legal_citation(renamer_result),
        'date_decided': '',
        'docket_number': '',
        'source_file': renamer_result.get('original_filename', ''),
    }

    r = extract_disposition(pdf_text)
    metadata['disposition'] = r['value']
    if r['value']:
        metadata['disposition_confidence'] = r['confidence']

    r = extract_opinion_author(pdf_text)
    metadata['opinion_author'] = r['value']
    if r['value']:
        metadata['opinion_author_confidence'] = r['confidence']

    r = extract_opinion_type(pdf_text)
    metadata['opinion_type'] = r['value']
    if r['value']:
        metadata['opinion_type_confidence'] = r['confidence']

    r = extract_lower_court_judge(pdf_text)
    metadata['lower_court_judge'] = r['value']
    if r['value']:
        metadata['lower_court_judge_confidence'] = r['confidence']

    r = extract_panel_members(pdf_text)
    metadata['panel_members'] = r['value']
    if r['value']:
        metadata['panel_members_confidence'] = r['confidence']

    r = extract_concurring_dissenting(pdf_text)
    metadata['concurring_dissenting'] = r['value']
    if r['value'] and (r['value'].get('concurring') or r['value'].get('dissenting')):
        metadata['concurring_dissenting_confidence'] = r['confidence']

    r = extract_attorneys(pdf_text)
    metadata['attorneys'] = r['value']
    if r['value'] and any(r['value'].values()):
        metadata['attorneys_confidence'] = r['confidence']

    r = extract_docket_number(pdf_text)
    metadata['docket_number'] = r['value']
    if r['value']:
        metadata['docket_number_confidence'] = r['confidence']

    r = extract_full_date(pdf_text)
    metadata['date_decided'] = r['value']
    if r['value']:
        metadata['date_decided_confidence'] = r['confidence']

    metadata['extraction_confidence'] = calculate_confidence(metadata)
    return metadata
