"""Differential tests for the legacy caselaw DEEP-metadata extractor: load
the actual zOld-Code/step1--Base_FILENAME--a-caselaw metadata_extractor.py
by file path and require identical outputs from
reference_semantics/caselaw_metadata.py on a fuzzed corpus of
court-opinion-shaped text (SURVEY §2 round-3 addendum CM1-CM9).

Covers disposition (header+footer scoping, HIGH/MEDIUM grading), opinion
author (Per Curiam short-circuit), opinion type, lower-court judge,
appellate panel roster, concurring/dissenting votes (footer scoping, the
lazy section-header pattern's double-filing bug), counsel-of-record group
introspection, docket number, the case-sensitive date family, the
compact-reporter -> legal-citation formatter, and the weighted overall
confidence score. ``extraction_timestamp`` is the documented exclusion
(datetime.now() in the reference).
"""

import importlib.util
import os as _os
import sys

import pytest
from hypothesis import given, settings, strategies as st

_EX = int(_os.environ.get("DIFF_FUZZ_EXAMPLES", "120"))

sys.dont_write_bytecode = True

_REF_PATH = (
    "/root/reference/zOld-Code/step1--Base_FILENAME--a-caselaw"
    "/src/extractors/metadata_extractor.py"
)


def _load(name: str, path: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


try:
    ref_meta = _load("ref_metadata_x", _REF_PATH)
    _REF_OK = True
except Exception:  # pragma: no cover
    _REF_OK = False

pytestmark = pytest.mark.skipif(not _REF_OK, reason="caselaw reference unavailable")

from modern_document_converter_for_ai_library_spark.reference_semantics import (
    caselaw_metadata as ours,
)

# ---------------------------------------------------------------------------
# fuzz corpus: court-opinion line pool exercising every pattern family
# ---------------------------------------------------------------------------

_LINE_POOL = [
    # dispositions (each grading path)
    "The judgment is AFFIRMED.",
    "the decision is REVERSED",
    "The order is VACATED and the case REMANDED.",
    "We AFFIRM in part and REVERSE in part.",
    "REVERSED and remanded for further proceedings.",
    "Disposition: Reversed and remanded\n",
    "disposition: affirmed.",
    # opinion author / type
    "Kennedy, J., delivered the opinion of the Court.",
    "Justice Breyer delivered the opinion of the Court.",
    "OPINION BY JUSTICE THOMAS",
    "Ginsburg, C.J., delivered the opinion of the Court.",
    "PER CURIAM",
    "per curiam opinion",
    "MAJORITY OPINION",
    "PLURALITY OPINION",
    "OPINION OF THE COURT",
    # lower court judge
    "District Judge Smith Heard the original matter.",
    "Judge Alvarez presiding over the trial below.",
    "The case came before District Judge Womack.",
    "before Judge Patel",
    # panel
    "Before Smith, Jones, and Brown, Circuit Judges.",
    "Before Carnes, Hull, District Judges",
    "Panel: Wood, Easterbrook, Sykes",
    # concur / dissent (incl. the double-filing section-header bug)
    "Justice Scalia, dissenting.",
    "Thomas, J., concurring in part.",
    "Justice Sotomayor, with whom Justice Kagan joins, dissenting in part.",
    "Alito, J., concurring.",
    "BREYER, J., CONCURRING IN PART AND DISSENTING IN PART",
    "KAVANAUGH, dissenting statement follows: DISSENTING",
    # attorneys (all three pattern shapes)
    "John A. Roberts argued the cause for petitioner.",
    "Mary Johnson argued the cause for respondent",
    "Attorney for appellant: James Wilson",
    "Sarah Parker, Atlanta, Georgia, for appellee.",
    "Robert Lee Chang, Phoenix, Arizona, for petitioner",
    # docket numbers (all three shapes)
    "Case No. 1:19-cv-12345",
    "Civil Action No. 4:08-md-1840",
    "Docket No. 2019-0452",
    "No. 98-436",
    "No. 123-4567",
    # dates (labels that grade HIGH vs MEDIUM, and unlabeled)
    "Decided: January 15, 2024",
    "Filed: March 3, 1999",
    "Argued: October 4, 2010",
    "Submitted: June 30, 2015",
    "July 3, 2014, Decided",
    "On September 9, 2001 the parties appeared.",
    # noise / fillers
    "The petition for certiorari is granted.",
    "915 Indian Trail, LLC v. State Bank and Trust Company",
    "Court of Appeals of Georgia",
    "328 Ga. App. 524; 759 S.E.2d 654",
    "",
    "   ",
    "ARGUED BEFORE THE FULL PANEL",
]

_REPORTERS = [
    "",
    "Unpub",
    "743_FSupp2d_762",
    "328_GaApp_524",
    "570_US_123",
    "WL_1234567",
    "2014_GaStateLEXIS_99",
    "BadShape_1_2_3",
    "Solo",
    "135_SCt_2584",
]

_texts = st.lists(
    st.sampled_from(_LINE_POOL), min_size=0, max_size=14
).map(lambda ls: "\n".join(ls))

# optionally splice the last-pages marker in to exercise footer scoping
_texts_with_marker = st.tuples(_texts, _texts, st.booleans()).map(
    lambda t: (t[0] + "\n[LAST_PAGES_SECTION]\n" + t[1]) if t[2] else t[0]
)

_renamer = st.fixed_dictionaries(
    {
        "case_name": st.sampled_from(["", "Smith v. Jones", "Indian Trail, LLC v. State Bank"]),
        "court": st.sampled_from(["", "Ga. Ct. App.", "Eleventh Circuit"]),
        "year": st.sampled_from(["", "2014", "1999"]),
        "reporter": st.sampled_from(_REPORTERS),
        "original_filename": st.sampled_from(["", "smith.pdf", "a b.PDF"]),
    }
)


def _ref_extract(renamer_result, text):
    md = ref_meta.MetadataExtractor().extract_metadata(renamer_result, text)
    md.pop("extraction_timestamp", None)
    return md


@settings(max_examples=_EX, deadline=None)
@given(_texts_with_marker, _renamer)
def test_deep_metadata_differential(text, renamer_result):
    assert ours.extract_case_metadata(renamer_result, text) == _ref_extract(
        renamer_result, text
    )


def test_citation_formatter_differential():
    ext = ref_meta.MetadataExtractor()
    for rep in _REPORTERS:
        rr = {"reporter": rep}
        assert ours.format_legal_citation(rr) == ext._format_legal_citation(rr), rep


def test_empty_text_matches_reference():
    rr = {"case_name": "Smith v. Jones", "court": "Ga.", "year": "2014", "reporter": ""}
    assert ours.extract_case_metadata(rr, "") == _ref_extract(rr, "")


def test_footer_scoped_disposition_and_votes():
    # disposition in the last-pages section only; votes scoped there too
    text = (
        "Kennedy, J., delivered the opinion of the Court.\n"
        "Justice Scalia, dissenting.\n"  # BEFORE marker: invisible to votes
        "[LAST_PAGES_SECTION]\n"
        "The judgment is REVERSED.\n"
        "Thomas, J., concurring in part.\n"
    )
    rr = {"reporter": "570_US_123"}
    got = ours.extract_case_metadata(rr, text)
    exp = _ref_extract(rr, text)
    assert got == exp
    assert got["disposition"] == "Reversed"
    assert got["concurring_dissenting"]["concurring_in_part"] == ["Thomas"]
    assert got["concurring_dissenting"]["dissenting"] == []
