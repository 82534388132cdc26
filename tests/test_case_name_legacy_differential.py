"""Differential tests for the legacy case-name formatter: load the actual
zOld-Code/step1--Base_FILENAME--a-caselaw ``case_name_formatter.py`` by
file path and require identical outputs from
reference_semantics/case_name_legacy.py on fuzzed caption text, filenames,
and raw case names (SURVEY §2 round-3 addendum CN1-CN4).
"""

import importlib.util
import os as _os
import sys

import pytest
from hypothesis import given, settings, strategies as st

_EX = int(_os.environ.get("DIFF_FUZZ_EXAMPLES", "150"))

sys.dont_write_bytecode = True

_REF_PATH = (
    "/root/reference/zOld-Code/step1--Base_FILENAME--a-caselaw"
    "/src/formatters/case_name_formatter.py"
)


def _load(name: str, path: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


try:
    ref_mod = _load("ref_case_name_fmt", _REF_PATH)
    _REF_OK = True
except Exception:  # pragma: no cover
    _REF_OK = False

pytestmark = pytest.mark.skipif(not _REF_OK, reason="caselaw reference unavailable")

from modern_document_converter_for_ai_library_spark.reference_semantics import (
    case_name_legacy as ours,
)

_PARTY_POOL = [
    "915 Indian Trail, LLC",
    "State Bank and Trust Company",
    "JOHN H ALDEN",
    "United States",
    "United States of America",
    "Abbott Labs.",
    "Sandoz, Inc.",
    "New Hampshire",
    "Smith",
    "mary-ellen o'brien",
    "The North West Trading Corp",
    "Georgia Power & Light (Holdings)",
    "U.S. Dept of Justice",
    "Fla. Keys Md. Assoc.",
    "AM Z",
]

_SUFFIX_POOL = [
    "",
    ", Petitioner",
    ", Petitioners",
    ", Plaintiffs",
    ", Appellant",
    ", et al.",
    ", Respondent",
    ", Defendants",
    ", Appellee",
]

_V_TOKENS = ["v", "v.", "vs", "vs."]

_FILLER_POOL = [
    "SUPREME COURT OF THE UNITED STATES",
    "Court of Appeals of Georgia",
    "October Term, 2013",
    "No. 12-1184",
    "AM Z",
    "PM Z",
    "",
    "   ",
    "Syllabus",
]


@st.composite
def _caption_texts(draw):
    """Multi-line captions hitting strategy 1, strategy 2, or neither."""
    filler_top = draw(st.lists(st.sampled_from(_FILLER_POOL), max_size=4))
    left = draw(st.sampled_from(_PARTY_POOL)) + draw(st.sampled_from(_SUFFIX_POOL))
    right = draw(st.sampled_from(_PARTY_POOL)) + draw(st.sampled_from(_SUFFIX_POOL))
    v = draw(st.sampled_from(_V_TOKENS))
    shape = draw(st.integers(0, 3))
    if shape == 0:  # own-line v
        caption = [left, v, right]
    elif shape == 1:  # same-line caption
        caption = [f"{left} {v} {right}"]
    elif shape == 2:  # no caption at all
        caption = []
    else:  # v-line at index 0 (strategy-1 guard i > 0 must skip it)
        caption = [v, right]
    filler_bottom = draw(st.lists(st.sampled_from(_FILLER_POOL), max_size=3))
    return "\n".join(filler_top + caption + filler_bottom)


_FILENAMES = st.sampled_from(
    [
        "law - GA CASES - Smith v Jones (Ga. 2014).pdf",
        "Indian Trail v State Bank_ 2014 Ga. App. LEXIS 12.pdf",
        "Some Case_Attachment2.pdf",
        "Plain Name.docx",
        "noextension",
        "Abbott v Sandoz (11th Cir. 2010) extra.PDF",
        "U.S. v Alden_ 1999 U.S. Dist. LEXIS 4.pdf",
    ]
)


@settings(max_examples=_EX, deadline=None)
@given(_caption_texts())
def test_extract_from_pdf_differential(text):
    ref = ref_mod.CaseNameFormatter(max_words_per_party=1)
    assert ours.extract_case_name_from_pdf(text) == ref.extract_from_pdf(text)


@settings(max_examples=_EX, deadline=None)
@given(_FILENAMES)
def test_extract_from_filename_differential(fname):
    ref = ref_mod.CaseNameFormatter(max_words_per_party=1)
    assert ours.extract_case_name_from_filename(fname) == ref.extract_from_filename(
        fname
    )


@settings(max_examples=_EX, deadline=None)
@given(
    st.sampled_from(_PARTY_POOL),
    st.sampled_from(_PARTY_POOL),
    st.sampled_from(_V_TOKENS + [" versus "]),
    st.integers(1, 3),
)
def test_format_case_name_differential(left, right, v, max_words):
    raw = f"{left} {v} {right}" if v != " versus " else f"{left}{v}{right}"
    ref = ref_mod.CaseNameFormatter(max_words_per_party=max_words)
    assert ours.format_case_name_legacy(raw, max_words) == ref.format_case_name(raw)
    expanded = ref.expand_abbreviations(raw)
    assert ours.expand_abbreviations(raw) == expanded


@settings(max_examples=_EX, deadline=None)
@given(_caption_texts(), _FILENAMES)
def test_composed_flow_differential(text, fname):
    """Mirror renamer.py:157-172 against the reference class directly —
    including the STEM handoff (renamer.py:98), so the composed kernel
    cannot drift onto the full-filename path."""
    from pathlib import Path

    ref = ref_mod.CaseNameFormatter(max_words_per_party=1)
    raw = ref.extract_from_pdf(text)
    source = "document" if raw else "filename"
    if not raw:
        raw = ref.extract_from_filename(Path(fname).stem)
    if raw:
        expected = {
            "case_name": ref.format_case_name(ref.expand_abbreviations(raw)),
            "case_name_source": source,
        }
    else:
        expected = {"case_name": "Unknown", "case_name_source": source}
    assert ours.legacy_case_name_for_doc(text, fname) == expected


def test_known_goldens():
    assert ours.format_case_name_legacy("Abbott Labs. v. Sandoz, Inc.") == (
        "Abbott-v-Sandoz"
    )
    assert ours.format_case_name_legacy("JOHN H ALDEN v United States") == (
        "ALDEN-v-United-States"
    )
    assert (
        ours.extract_case_name_from_pdf(
            "SUPREME COURT\nSmith, Petitioner\nv.\nJones, Respondent\n"
        )
        == "Smith v. Jones"
    )
