"""Differential tests for the LEGACY cleaners: load the actual zOld-Code
modules by file path (their directory names are not importable) and require
identical outputs from our re-implementations.

Covers the Boilerpipe-style boilerplate operators the north star names
explicitly: running-header frequency removal, context-sensitive heading
marking, paragraph merge + de-hyphenation, OCR/typo/archaic replacement
tables, and the markdown normal-form cleaner.
"""

import importlib.util
import sys

import pytest
import os as _os

from hypothesis import given, settings, strategies as st

# deep-fuzz knob: DIFF_FUZZ_EXAMPLES=3000 pytest ... for a long hunt
_EX = int(_os.environ.get("DIFF_FUZZ_EXAMPLES", "120"))

sys.dont_write_bytecode = True

_BASE = (
    "/root/reference/zOld-Code/"
    "step3a--NORMALIZE-TXT--MODERN--convert_to_txt--clean--add_headings"
)


def _load(name: str, path: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


try:
    ref_ct = _load("ref_clean_txt", f"{_BASE}/clean_txt.py")
    ref_md = _load("ref_md_cleaner", f"{_BASE}/doc_to_markdown/markdown_cleaner.py")
    _REF_OK = True
except Exception:  # pragma: no cover
    _REF_OK = False

pytestmark = pytest.mark.skipif(not _REF_OK, reason="legacy reference unavailable")

from modern_document_converter_for_ai_library_spark.reference_semantics import (
    legacy as ours,
)
from modern_document_converter_for_ai_library_spark.reference_semantics import (
    markdown_norm as ours_md,
)

_LINE_POOL = [
    "SUPREME COURT OF GEORGIA",  # running-header candidate (repeated below)
    "---[ PDF Page 3 ]---",
    "[OCR FAILED: page 4]",
    "17",
    "xiv",
    "I. INTRODUCTION",
    "THE FACTS OF THE CASE",
    "This is a body line that continues the para-",
    "graph across a line break.",
    "Another line ends with hyphen-",
    "ATION in capitals.",
    "",
    "  ",
    "short",
    "The court helde that the titel vpon the publick honour was colour-blind.",
    "A normal sentence with sufficient length to be body text, decided today.",
]


def _docs_strategy():
    return st.lists(st.sampled_from(_LINE_POOL), min_size=0, max_size=30)


@settings(max_examples=_EX, deadline=None)
@given(_docs_strategy())
def test_full_legacy_pipeline_differential(lines):
    assert ours.clean_legacy_text(lines) == ref_ct.clean_text_content(lines)


@settings(max_examples=_EX, deadline=None)
@given(_docs_strategy())
def test_running_headers_and_removal_differential(lines):
    ref_run = ref_ct.collect_running_headers(lines)
    our_run = ours.collect_running_headers(lines)
    assert our_run == ref_run
    assert ours.remove_headers_and_page_numbers(
        lines, our_run
    ) == ref_ct.remove_headers_and_page_numbers(lines, ref_run)


@settings(max_examples=_EX, deadline=None)
@given(_docs_strategy())
def test_mark_headings_differential(lines):
    run = ref_ct.collect_running_headers(lines)
    assert ours.mark_headings(lines, run) == ref_ct.mark_headings(lines, run)


@settings(max_examples=_EX, deadline=None)
@given(_docs_strategy())
def test_build_paragraphs_differential(lines):
    assert ours.build_paragraphs(lines) == ref_ct.build_paragraphs(lines)


@settings(max_examples=_EX, deadline=None)
@given(
    st.text(
        alphabet=" .\n\t'’“”—–… ­fiflABCDEFGHIKLMNOPRSTUVWXYZ"
        "abcdefghiklmnopqrstuvwxyz0123456789#->*_`",
        max_size=200,
    )
)
def test_replacement_tables_differential(text):
    assert ours.apply_typo_replacements(text) == ref_ct.apply_typo_replacements(text)
    assert ours.apply_ocr_replacements(text) == ref_ct.apply_ocr_replacements(text)
    assert ours.apply_modern_spellings(text) == ref_ct.apply_modern_spellings(text)


_MD_POOL = [
    "# Title",
    "#Title no space",
    "## Sub ##",
    "body text continues here",
    "---",
    "",
    "   trailing ws   ",
    "“smart quotes” and ’apostrophe’",
    "an em—dash and en–dash and … ellipsis",
    "soft­hyphen zero​width",
    "control\x07char",
    "﻿frontmatter BOM",
    "crlf line\r",
]


@settings(max_examples=_EX, deadline=None)
@given(st.lists(st.sampled_from(_MD_POOL), min_size=0, max_size=20).map("\n".join))
def test_markdown_cleaner_differential(text):
    assert ours_md.clean_markdown(text) == ref_md.clean_markdown(text)


_STEP1 = (
    "/root/reference/zOld-Code/step1--Base_FILENAME--a-caselaw/"
    "src/extractors/pdf_extractor.py"
)

try:
    _ref_pdf = _load("ref_pdf_extractor", _STEP1)
    _PDF_OK = True
except Exception:  # pragma: no cover
    _PDF_OK = False


@pytest.mark.skipif(not _PDF_OK, reason="step1 pdf_extractor unavailable")
@settings(max_examples=_EX, deadline=None)
@given(
    st.lists(
        st.sampled_from(
            _LINE_POOL
            + [
                "Dated this day",
                "vs. Smith",
                "the v. token",
                "   SUPREME   ",
                "x" * 21,
                "Circuit",
                "  short court  ",
            ]
        ),
        min_size=0,
        max_size=25,
    )
)
def test_margin_filter_differential(lines):
    text = "\n".join(lines)
    ref_out = _ref_pdf.PDFExtractor().get_main_content(text)
    ours_out = "\n".join(ours.margin_content_filter(lines))
    # reference returns "" for empty input text; ours returns [] -> ""
    assert ours_out == ref_out


@pytest.mark.skipif(not _PDF_OK, reason="step1 pdf_extractor unavailable")
@settings(max_examples=_EX, deadline=None)
@given(
    st.lists(
        st.sampled_from(
            [
                "Indian Trail, LLC v. State Bank and Trust Company",
                "Smith vs Jones",
                "smith v. jones lowercase",
                "The v. token mid-line",
                "SUPREME COURT OF GEORGIA",
                "Page 3 of 17",
                "no marker here at all",
                "A v B no dots",
                "",
                "Multi, Word & Co. v. Other'Party-Name",
            ]
        ),
        min_size=0,
        max_size=50,
    ).map("\n".join)
)
def test_caption_finder_differential(text):
    assert ours.find_case_caption(text) == _ref_pdf.PDFExtractor().find_case_caption(
        text
    )


def test_markdown_cleaner_pieces_differential():
    for t in ["a\r\nb\rc", "# x #\nbody", "x\n\n\n\n\ny", "---\nkey: v\n---\nbody"]:
        assert ours_md.normalize_line_endings(t) == ref_md.normalize_line_endings(t)
        assert ours_md.strip_control_chars(t) == ref_md.remove_control_characters(t)
        assert ours_md.normalize_headings(t) == ref_md.normalize_headings(t)
        assert ours_md.normalize_spacing(t) == ref_md.normalize_spacing(t)
        assert ours_md.clean_frontmatter_spacing(t) == ref_md.clean_frontmatter_spacing(t)
