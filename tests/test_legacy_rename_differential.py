"""Differential tests for the legacy caselaw decision-year extractor and
the composed rename record: load the actual a-caselaw ``date_extractor.py``
and ``renamer.py`` (with text extraction stubbed and court/reporter
injected — those extractors have their own differential in test_dims.py)
and require identical outputs from reference_semantics/caselaw_dates.py
(SURVEY §2 round-3 addendum DY1-DY3).
"""

import importlib.util
import os as _os
import sys

import pytest
from hypothesis import given, settings, strategies as st

_EX = int(_os.environ.get("DIFF_FUZZ_EXAMPLES", "150"))

sys.dont_write_bytecode = True

_SRC = "/root/reference/zOld-Code/step1--Base_FILENAME--a-caselaw/src"


def _load(name: str, path: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


try:
    ref_date = _load("ref_date_caselaw", f"{_SRC}/extractors/date_extractor.py")
    if _SRC not in sys.path:
        sys.path.insert(0, _SRC)
    import renamer as ref_renamer_mod  # noqa: E402

    _REF_OK = True
except Exception:  # pragma: no cover
    _REF_OK = False

pytestmark = pytest.mark.skipif(not _REF_OK, reason="caselaw reference unavailable")

from modern_document_converter_for_ai_library_spark.reference_semantics import (
    caselaw_dates as ours,
)

# ---------------------------------------------------------------------------
# fuzz pools
# ---------------------------------------------------------------------------

_DATE_LINES = [
    "Decided: March 5, 1999",
    "decided: march 5, 1999",
    "Filed October 1, 2001",
    "Dated: July 30, 1888",
    "August 12, 2014, Decided",
    "August 12, 2014 Decided",
    "Decided: Foobar 3, 3025",  # invalid year: label must NOT fall through
    "Filed: January 1, 1699",  # below min
    "Submitted: May 5, 2000",  # unknown label
    "No dates here at all",
    "",
]

_FILENAME_STEMS = [
    "Smith v Jones (ND Ill 2010)",
    "Case_ 2019 U.S. Dist. LEXIS 1234",
    "Matter 2018 WL 99",
    "Four digits 1776 inline",
    "Too old (1492) parenthetical then 1801",
    "No year at all",
    "year 9999 invalid then 2020 ok",
]

_CAPTIONS = [
    "Kmart Holdings, Petitioner\nv.\nJohn Henry Alden, Respondent",
    "U.S. v. Kmart",
    "Syllabus only, no caption",
    "",
]

_COURTS = [(None, None), ("Ga_Ct_App", "document"), ("Eleventh_Circuit", "filename")]
_REPORTERS = [
    ("743_FSupp2d_762", "document"),
    ("328_GaApp_524", "filename"),
    ("Unpub", "fallback"),
]


@settings(max_examples=_EX, deadline=None)
@given(st.lists(st.sampled_from(_DATE_LINES), max_size=4).map("\n".join))
def test_year_from_pdf_differential(text):
    ref = ref_date.DateExtractor()
    assert ours.extract_year_from_pdf(text) == ref.extract_from_pdf(text)


@settings(max_examples=_EX, deadline=None)
@given(st.sampled_from(_FILENAME_STEMS))
def test_year_from_filename_differential(stem):
    ref = ref_date.DateExtractor()
    assert ours.extract_year_from_filename(stem) == ref.extract_from_filename(stem)


def test_sanitize_truncate_differential():
    cases = [
        'a<b>:c"/\\|?*.pdf',
        "  . leading.trailing . ",
        "x" * 300 + ".pdf",
        "y" * 300,
        "ctrl\x01char\x1fhere.pdf",
        "c.Ga_Ct_App__2014__Indian-Trail-v-State-Bank__328_GaApp_524.pdf",
    ]
    R = ref_renamer_mod.CaselawRenamer
    for c in cases:
        assert ours.legacy_sanitize_filename(c) == R.sanitize_filename(c), c
        assert ours.legacy_validate_and_truncate(c) == R.validate_and_truncate_filename(
            c
        ), c


class _Stub:
    def __init__(self, pdf_value, filename_value=None, formatted=None):
        self._pdf = pdf_value
        self._file = filename_value
        self._formatted = formatted

    def extract_from_pdf(self, text):
        return self._pdf

    def extract_from_filename(self, name):
        return self._file

    def extract_text(self, path):  # pdf/docx extractor stub
        return self._pdf

    def format_citation(self, volume, reporter, page):
        return self._formatted


def _ref_process(text, file_name, court, court_source, reporter, reporter_source):
    """Drive the ACTUAL CaselawRenamer.process_file with extraction
    stubbed to `text` and court/reporter injection matching the kernel's
    contract (renamer.py:87-260)."""
    r = ref_renamer_mod.CaselawRenamer.__new__(ref_renamer_mod.CaselawRenamer)
    r.pdf_extractor = _Stub(text)
    r.docx_extractor = _Stub(text)
    r.date_extractor = ref_date.DateExtractor()
    r.case_formatter = _load(
        "ref_cnf_for_renamer", f"{_SRC}/formatters/case_name_formatter.py"
    ).CaseNameFormatter(max_words_per_party=1)
    # court: document value or filename fallback value
    if court_source == "document":
        r.court_extractor = _Stub(court)
    else:
        r.court_extractor = _Stub(None, filename_value=court)
    # reporter: process_file formats the (volume, reporter, page) tuple
    if reporter == "Unpub":
        r.reporter_extractor = _Stub(None, filename_value=None)
    elif reporter_source == "document":
        r.reporter_extractor = _Stub(("v", "r", "p"), formatted=reporter)
    else:
        r.reporter_extractor = _Stub(
            None, filename_value=("v", "r", "p"), formatted=reporter
        )
    out = r.process_file("/tmp/" + file_name)
    out.pop("document_text", None)
    out.pop("file_path", None)
    return out


@settings(max_examples=_EX, deadline=None)
@given(
    st.sampled_from(_CAPTIONS),
    st.lists(st.sampled_from(_DATE_LINES), max_size=2).map("\n".join),
    st.sampled_from(_FILENAME_STEMS),
    st.sampled_from([".pdf", ".docx", ".PDF", ".txt"]),
    st.sampled_from(_COURTS),
    st.sampled_from(_REPORTERS),
)
def test_composed_rename_differential(caption, dates, stem, ext, court_t, rep_t):
    text = caption + "\n" + dates
    file_name = stem + ext
    court, court_source = court_t
    reporter, reporter_source = rep_t
    ref_out = _ref_process(text, file_name, court, court_source, reporter, reporter_source)
    ours_out = ours.legacy_rename_for_doc(
        text, file_name, court, court_source, reporter, reporter_source
    )
    assert ours_out == ref_out


def test_composed_golden():
    out = ours.legacy_rename_for_doc(
        "Indian Trail, LLC, Appellant\nv.\nState Bank, Appellee\nDecided: July 3, 2014",
        "original scan (Ga App 2014).pdf",
        "Ga_Ct_App",
        "document",
        "328_GaApp_524",
        "document",
    )
    assert out["year"] == "2014" and out["year_source"] == "document"
    assert out["case_name"] == "Indian-v-State"
    assert out["confidence"] == "HIGH"
    assert (
        out["new_filename"]
        == "c.Ga_Ct_App__2014__Indian-v-State__328_GaApp_524.pdf"
    )
