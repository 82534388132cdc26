"""Rule data transcribed from the reference's YAML configs.

The reference interprets these rules at runtime from
``config/document_types/*.yaml`` and ``config/filename_templates/caselaw.yaml``
(/root/reference). We carry them as plain Python data so they can be compiled
either into Spark column expressions (driver side) or into the pandas-UDF
kernels (executor side) without any file I/O on executors.

Citations (all into /root/reference):
  - classification patterns/weights: config/document_types/caselaw.yaml:18-100,
    config/document_types/statutes.yaml:20-139
  - thresholds: caselaw.yaml:104-108, statutes.yaml:142-146
  - cleaning rules: caselaw.yaml:386-431, apply order caselaw.yaml:435-437
  - extraction rules: caselaw.yaml:121-360
  - filename template/fallbacks: config/filename_templates/caselaw.yaml:26,115-128
  - rule-set iteration order: src/services/classifier.py:79 (glob over the
    config dir; `article` is disabled via ``enabled: false`` so the effective
    order is caselaw, then statute)
  - statute-vs-statutes.yaml filename mismatch: src/steps/convert_step.py:227-231
    (DocumentType.STATUTE.value == "statute" has no matching YAML file, so
    statutes — and every non-caselaw type — get EMPTY cleaning rules;
    reproduced bug-for-bug here)
"""

from __future__ import annotations

# --------------------------------------------------------------------------
# Classification scoring patterns: (regex, weight, case_sensitive)
# --------------------------------------------------------------------------

CASELAW_PATTERNS: list[tuple[str, float, bool]] = [
    (r"\b\w+\s+v\.\s+\w+|\b\w+\s+versus\s+\w+", 40, False),
    (r"\d+\s+[A-Z][a-z]+\.?\s+(?:App\.\s+)?(?:2d|3d)?\s*\d+", 35, False),
    (
        r"Court of Appeals|Supreme Court|District Court|Circuit Court"
        r"|Superior Court|Appellate Court",
        20,
        False,
    ),
    (r"\b(?:LEXIS|Westlaw|WL\s+\d+|West\s+Law)\b", 15, False),
    (r"\b(?:Plaintiff|Defendant|Appellant|Appellee|Petitioner|Respondent)\b", 10, False),
    (r"(?:Decided|Filed|Argued).*\d{4}", 10, False),
    (r"\b(?:Opinion|Judgment|ORDER|MOTION|Memorandum|Per Curiam)\b", 5, True),
    (r"\b(?:affirm|reverse|remand|vacate|dismiss)(?:ed|ing)?\b", 5, False),
    (r"Case\s+No\.|Docket\s+No\.|Civil\s+Action\s+No\.", 5, False),
    (r"\bJ\.,\s+(?:concurring|dissenting|delivering the opinion)", 5, False),
    (r"This case comes before (the court|us)", 3, False),
    (r"\b(?:Section|§)\s+\d+|\bU\.S\.C\.|United States Code", -10, False),
]

# Human-readable descriptions, same order (classifier collects these as
# "indicators"; src/services/classifier.py:189-191).
CASELAW_DESCRIPTIONS: list[str] = [
    "Case caption with 'v.' or 'versus'",
    "Reporter citation format (e.g., '328 Ga. App. 524', '759 S.E.2d 654')",
    "Court name",
    "Legal database citation",
    "Party designation",
    "Decision date notation",
    "Legal procedural terms",
    "Judicial action verbs",
    "Case/docket number",
    "Judge attribution",
    "Procedural history opening",
    "Statutory citation (suggests statute, not case)",
]

STATUTE_PATTERNS: list[tuple[str, float, bool]] = [
    (r"Official Code of", 100, False),
    ("§", 35, False),
    (r"O\.\s*C\.\s*G\.\s*A\.", 30, False),
    (r"U\.\s*S\.\s*C\.", 30, False),
    (r"C\.\s*F\.\s*R\.", 30, False),
    (r"TITLE\s+\d+", 50, False),
    (r"Chapter\s+\d+", 15, False),
    (r"\bCode of\b", 10, False),
    (r"(?:Section|Sec\.)\s+\d+", 10, False),
    ("§" + r"\s*\d+", 10, False),
    (r"\b(?:enacted|codified|amended)\b", 5, False),
    (r"Public Law|Pub\.\s*L\.", 5, False),
    (r"\b(?:subsection|subdivision|paragraph)\s*\([a-z0-9]+\)", 5, False),
    (r"\b\w+\s+v\.\s+\w+|\b\w+\s+versus\s+\w+", -5, False),
    (r"Court of Appeals|Supreme Court|District Court|Circuit Court", -5, False),
    (r"\b(?:Plaintiff|Defendant|Appellant|Appellee|Petitioner)\b", -5, False),
    (r"(?:Decided|Filed|Argued).*\d{4}", -5, False),
    (r"\b(?:Opinion|affirm|reverse|remand)\b", -5, False),
]

STATUTE_DESCRIPTIONS: list[str] = [
    "Official Code designation",
    "Section symbol",
    "O.C.G.A. (Official Code of Georgia Annotated) - spaced acronym",
    "U.S.C. (United States Code) - spaced acronym",
    "C.F.R. (Code of Federal Regulations) - spaced acronym",
    "Title number (e.g., 'TITLE 42')",
    "Chapter number",
    "Code reference",
    "Section number notation",
    "Section symbol with number (e.g., '§ 1234')",
    "Legislative action verbs",
    "Public law citation",
    "Statutory subdivision notation",
    "Case caption with 'v.' or 'versus' (indicates case, not statute)",
    "Court name (indicates case, not statute)",
    "Party designation (indicates case, not statute)",
    "Decision date notation (indicates case, not statute)",
    "Judicial language (indicates case, not statute)",
]

CONFIDENCE_THRESHOLDS = {"high": 60, "medium": 30, "low": 10}

# Iteration order matters for the argmax tie-break (first strictly-greater
# score wins; classifier.py:287-291). The reference iterates its rules dict
# in ``Path.glob("*.yaml")`` order, which is RAW FILESYSTEM ORDER — not
# alphabetical. Observed in this deployment: ['statutes.yaml',
# 'article.yaml', 'caselaw.yaml'] (article disabled), so on a tied score
# STATUTE wins. Found by differential fuzzing
# (tests/test_reference_differential.py::test_classify_diff_property with
# 'Page 3 of 17\nOpinion by: LAGRUA\n§ 16-3-1' — 40.0 vs 40.0); an earlier
# revision assumed alphabetical caselaw-first and diverged on exactly such
# ties. Bug-for-bug: this order is itself environment-dependent in the
# reference; we pin the observed order of the gate environment.
CLASSIFICATION_RULESETS: list[tuple[str, list[tuple[str, float, bool]], list[str]]] = [
    ("statute", STATUTE_PATTERNS, STATUTE_DESCRIPTIONS),
    ("caselaw", CASELAW_PATTERNS, CASELAW_DESCRIPTIONS),
]

# --------------------------------------------------------------------------
# Cleaning rules (convert step). Only caselaw has any; every other document
# type resolves to the empty rule set (convert_step.py:227-231).
# --------------------------------------------------------------------------

CASELAW_NOISE_PATTERNS: list[str] = [
    r"^As of:\s+[A-Za-z]+\s+\d{1,2},\s+\d{4}.*$",
    r"^Page\s+\d+\s+of\s+\d+\s*$",
    r"^Load Date:.*$",
    r"^End of Document\s*$",
    r"^\|\s*$",
    r"^\s*\*+\s*$",
]

# (regex, markdown prefix) — first match wins per line, order preserved.
CASELAW_HEADING_PATTERNS: list[tuple[str, str]] = [
    (r"^Opinion by:\s*(.+)$", "## "),
    (r"^([A-Z][A-Z0-9\s\W]{3,100})$", "## "),
    (r"^\d+\.\s+(.+)$", "### "),
    (r"^[IVX]+\.\s+(.+)$", "### "),
]

CASELAW_CLEANING_RULES = {
    "noise_patterns": CASELAW_NOISE_PATTERNS,
    "heading_patterns": CASELAW_HEADING_PATTERNS,
}

EMPTY_CLEANING_RULES = {"noise_patterns": [], "heading_patterns": []}


def cleaning_rules_for(document_type: str) -> dict:
    """Cleaning rules lookup keyed by DocumentType.value.

    Only ``caselaw`` resolves to a real rule set; ``statute`` misses because
    the reference's config file is named ``statutes.yaml`` while the enum
    value is ``statute`` (convert_step.py:227-231) — reproduced faithfully.
    """
    if document_type == "caselaw":
        return CASELAW_CLEANING_RULES
    return EMPTY_CLEANING_RULES


# --------------------------------------------------------------------------
# Metadata extraction rules (caselaw.yaml:121-360). Each entry is already in
# priority order after the stable sort the reference applies
# (caselaw.py:167, 245, 293, 436 — sorted() is stable, so same-priority rules
# keep YAML order).
# --------------------------------------------------------------------------

CASE_NAME_RULES = [
    {
        "pattern": (
            r"([A-Z][A-Za-z\s,\.&'\-\(\)]+?)\s+v\.?\s+"
            r"([A-Za-z\s,\.&'\-\(\)]+?)(?:\n|$)"
        ),
        "confidence": "HIGH",
        "plaintiff_cleanup": [
            r",?\s*Petitioners?",
            r",?\s*Plaintiffs?",
            r",?\s*Appellants?",
            r",?\s*et\s+al\.?",
        ],
        "defendant_cleanup": [
            r",?\s*Respondents?",
            r",?\s*Defendants?",
            r",?\s*Appellees?",
            r",?\s*et\s+al\.?",
        ],
    },
]

# (pattern, year_group, confidence)
DATE_RULES = [
    (r"([A-Z][a-z]+\s+\d{1,2},\s+(\d{4})),?\s+Decided", 2, "HIGH"),
    (r"Decided:\s*([A-Z][a-z]+\s+\d{1,2},\s+(\d{4}))", 2, "HIGH"),
    (r"Filed:\s*([A-Z][a-z]+\s+\d{1,2},\s+(\d{4}))", 2, "HIGH"),
    (r"Argued:\s*([A-Z][a-z]+\s+\d{1,2},\s+(\d{4}))", 2, "MEDIUM"),
    (r"([A-Z][a-z]+\s+\d{1,2},\s+(\d{4}))", 2, "MEDIUM"),
]

# Court rules after the stable priority sort (priorities 1,1,1,2):
# kind selects the _build_court_name branch (caselaw.py:317-359).
COURT_RULES = [
    {
        "pattern": r"Court of Appeals of ([A-Za-z]+)(?:\s|$)",
        "kind": "state_appeals",  # -> "{abbrev} Ct. App."
        "confidence": "HIGH",
    },
    {
        "pattern": r"Supreme Court of ([A-Za-z\s]+)",
        "kind": "state_supreme",  # -> "{abbrev} Sup. Ct."
        "confidence": "HIGH",
    },
    {
        "pattern": (
            r"United States Court of Appeals(?:,?\s+|\s+for\s+the\s+)"
            r"((?:First|Second|Third|Fourth|Fifth|Sixth|Seventh|Eighth|Ninth"
            r"|Tenth|Eleventh|D\.?C\.|Federal)\s+Circuit)"
        ),
        "kind": "federal_circuit",  # -> circuit text verbatim
        "confidence": "HIGH",
    },
    {
        "pattern": (
            r"United States District Court.*?for the\s+"
            r"((?:Northern|Southern|Eastern|Western)\s+District\s+of)\s+"
            r"([A-Za-z\s]+?)"
        ),
        "kind": "federal_district",  # -> "{ND|SD|ED|WD} {abbrev}"
        "confidence": "HIGH",
    },
]

# Citation rules after the stable priority sort. Priorities in YAML order are
# 1,1,1,1,1,1,2,2,1,1 — so F. Supp. entries sink below U.S./S. Ct.
# (reporter label, pattern, confidence)
CITATION_RULES = [
    ("Ga. App.", r"(\d+)\s+Ga\.\s*App\.\s+(\d+)", "HIGH"),
    ("Ga.", r"(\d+)\s+Ga\.\s+(\d+)", "HIGH"),
    ("S.E.2d", r"(\d+)\s+S\.E\.\s*2d\s+(\d+)", "HIGH"),
    ("S.E.3d", r"(\d+)\s+S\.E\.\s*3d\s+(\d+)", "HIGH"),
    ("F.3d", r"(\d+)\s+F\.\s*3d\s+(\d+)", "HIGH"),
    ("F.2d", r"(\d+)\s+F\.\s*2d\s+(\d+)", "HIGH"),
    ("U.S.", r"(\d+)\s+U\.S\.\s+(\d+)", "HIGH"),
    ("S. Ct.", r"(\d+)\s+S\.\s*Ct\.\s+(\d+)", "HIGH"),
    ("F. Supp. 2d", r"(\d+)\s+F\.\s*Supp\.\s*2d\s+(\d+)", "HIGH"),
    ("F. Supp. 3d", r"(\d+)\s+F\.\s*Supp\.\s*3d\s+(\d+)", "HIGH"),
]

# --------------------------------------------------------------------------
# Filename template (config/filename_templates/caselaw.yaml)
# --------------------------------------------------------------------------

FILENAME_TEMPLATE = "c.{court}__{year}__{case_name}__{citation}----{code}"

FILENAME_FALLBACKS = {
    # field -> (fallback value, required)
    "court": ("Unknown_Court", True),
    "year": ("XXXX", True),
    "case_name": ("Unnamed_Case", True),
    "citation": ("Unpub", False),
}

MAX_FILENAME_LENGTH = 255

# State-abbreviation fallback actually exercised by the reference
# (caselaw.py:382-391; the courts-DB scan above it never matches because the
# nested JSON carries no top-level "name" keys — dead code, reproduced by
# simply not consulting the DB here).
STATE_ABBREVIATIONS = {
    "georgia": "Ga.",
    "illinois": "Ill.",
    "california": "Cal.",
    "new york": "N.Y.",
    "texas": "Tex.",
    "florida": "Fla.",
}

DISTRICT_ABBREVIATIONS = {
    "northern": "ND",
    "southern": "SD",
    "eastern": "ED",
    "western": "WD",
}
