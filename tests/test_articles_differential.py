"""Differential tests for the ARTICLES-variant legacy extractors: load the
actual zOld-Code/step1--Base_FILENAME--b-articles modules by file path and
require identical outputs from reference_semantics/articles.py on a fuzzed
corpus of law-journal-shaped headers (VERDICT r2 "What's missing #1").

Covers author extraction (patterns + aggressive fallback + filename
fallback + surname formatting), title extraction (position/pattern/
aggressive strategies + filename fallback), publication-year priority
chain, journal name/volume/issue/page, the filename title formatter, and
the combined rename flow with source-based confidence.
"""

import importlib.util
import os as _os
import sys

import pytest
from hypothesis import given, settings, strategies as st

_EX = int(_os.environ.get("DIFF_FUZZ_EXAMPLES", "120"))

sys.dont_write_bytecode = True

_BASE = "/root/reference/zOld-Code/step1--Base_FILENAME--b-articles/src"


def _load(name: str, path: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


try:
    ref_author = _load("ref_author_x", f"{_BASE}/extractors/author_extractor.py")
    ref_title = _load("ref_title_x", f"{_BASE}/extractors/title_extractor.py")
    ref_date = _load("ref_date_x", f"{_BASE}/extractors/date_extractor.py")
    ref_journal = _load("ref_journal_x", f"{_BASE}/extractors/journal_extractor.py")
    ref_tfmt = _load("ref_title_fmt", f"{_BASE}/formatters/title_formatter.py")
    _REF_OK = True
except Exception:  # pragma: no cover
    _REF_OK = False

pytestmark = pytest.mark.skipif(not _REF_OK, reason="articles reference unavailable")

from modern_document_converter_for_ai_library_spark.reference_semantics import (
    articles as ours,
)

# ---------------------------------------------------------------------------
# fuzz corpus: law-journal front-matter line pool
# ---------------------------------------------------------------------------

_LINE_POOL = [
    "INDIANA LAW JOURNAL",
    "The American Journal of Legal History",
    "Georgetown Law Journal",
    "Vol. 84 No. 2",
    "[Vol. 84:397",
    "Vol. XVIII",
    "Volume 81",
    "Issue 3",
    "397",
    "© 2008 The Trustees",
    "Copyright 2013",
    "[2013]",
    "(1974)",
    "February 2013",
    "January 15, 2024",
    "Law and Fact in Medieval Jury Trials:",
    "Out of Sight, Out of Mind",
    "The Rise of Directed Verdict",
    "MORRIS S. ARNOLD**",
    "LAURA I APPLEMAN*",
    "By MORRIS S. ARNOLD**",
    "Morris S. Arnold*",
    "Authors: Jane Q. Smith",
    "RENEE LETTOW LERNER",
    "* Professor of Law, Indiana University",
    "* Associate Professor, Willamette University. J.D., Yale Law School.",
    "ABSTRACT",
    "TABLE OF CONTENTS",
    "INTRODUCTION",
    "INTRODUCTION....397",
    "I. THE EARLY HISTORY",
    "A. Before the Conquest",
    "1. The Writ System",
    "Maurer School of Law: Indiana University",
    "Digital Repository @ Maurer Law",
    "Recommended Citation",
    "Follow this and additional works at: https://www.repository.law.indiana.edu",
    "Part of the Courts Commons, European Law Commons",
    "brought to you by CORE",
    "jsmith@law.edu",
    "Page 12",
    "12",
    "2013",
    "xiv",
    "",
    "  ",
    "short",
    "A substantial body sentence that could be mistaken for a title line here",
    "This Article examines the allocation of decision-making, see 10.1234/abc.5678.",
]

_FILENAMES = [
    "Arnold_Law_and_Fact_1974.pdf",
    "Lerner_Rise_of_Directed_Verdict_2013.pdf",
    "B_Lerner_Remittitur_1976.pdf",
    "appleman2009.pdf",
    "scan0001.pdf",
    "UPPER_CASE_DOC.docx",
    "no_year_here.pdf",
    "1999_old_style.pdf",
    "plain",
]

_TITLES = [
    "The Rise of Directed Verdict: Jury Power in Civil Cases",
    "Law and Fact in Medieval Jury Trials",
    "Out of Sight, Out of Mind",
    "A Study with From and Of in It",
    "USA PATRIOT Act and Its Discontents",
    "An I II Of at on World",
    "Short: One",
    "",
    "  :  ",
    "word",
]


def _doc_strategy():
    return st.lists(st.sampled_from(_LINE_POOL), min_size=0, max_size=40).map(
        "\n".join
    )


# ---------------------------------------------------------------------------
# per-extractor differentials
# ---------------------------------------------------------------------------


@settings(max_examples=_EX, deadline=None)
@given(_doc_strategy())
def test_author_extraction_differential(text):
    ref = ref_author.AuthorExtractor().extract_from_document(text)
    got = ours.extract_authors(text)
    assert got == ref


@settings(max_examples=_EX, deadline=None)
@given(_doc_strategy())
def test_title_extraction_differential(text):
    assert ours.extract_title(text) == ref_title.TitleExtractor().extract_from_document(
        text
    )


@settings(max_examples=_EX, deadline=None)
@given(_doc_strategy())
def test_year_extraction_differential(text):
    assert (
        ours.extract_article_year(text)
        == ref_date.DateExtractor().extract_from_document(text)
    )


@settings(max_examples=_EX, deadline=None)
@given(_doc_strategy())
def test_journal_extraction_differential(text):
    assert ours.extract_journal(text) == ref_journal.JournalExtractor().extract_from_document(
        text
    )


@pytest.mark.parametrize("fn", _FILENAMES)
def test_filename_fallbacks_differential(fn):
    stem = fn.rsplit(".", 1)[0] if "." in fn else fn
    assert ours.author_from_filename(stem) == ref_author.AuthorExtractor().extract_from_filename(
        stem
    )
    assert ours.title_from_filename(stem) == ref_title.TitleExtractor().extract_from_filename(
        stem
    )
    assert (
        ours.article_year_from_filename(stem)
        == ref_date.DateExtractor().extract_from_filename(stem)
    )


@pytest.mark.parametrize("title", _TITLES)
def test_title_formatter_differential(title):
    assert ours.format_title_for_filename(
        title
    ) == ref_tfmt.TitleFormatter().format_for_filename(title)


@settings(max_examples=_EX, deadline=None)
@given(
    st.lists(
        st.sampled_from(
            ["MORRIS S. ARNOLD**", "Laura I Appleman*", "X", "J. R. R. TOLKIEN†", ""]
        ),
        max_size=3,
    )
)
def test_author_filename_format_differential(authors):
    assert ours.format_author_for_filename(
        authors
    ) == ref_author.AuthorExtractor().format_author_for_filename(authors)


def test_roman_volume_bug_for_bug():
    # valid and INVALID numerals must agree (the reference's prev-value
    # tracker diverges from a max-tracker on junk like VIX)
    je = ref_journal.JournalExtractor()
    for numeral in ["XVIII", "IV", "IX", "MCMXCIX", "VIX", "IXI", "IIX"]:
        assert ours._roman_to_int(numeral) == je._roman_to_int(numeral), numeral


# ---------------------------------------------------------------------------
# combined rename flow vs a sequential replay of renamer.process_file
# ---------------------------------------------------------------------------


def _ref_rename_flow(text, filename):
    """Replay renamer.py:122-225 using the REAL extractor/formatter modules
    (process_file itself needs a file on disk; the flow below is its exact
    extraction logic with document text injected)."""
    stem = filename.rsplit(".", 1)[0] if "." in filename else filename
    ext = "." + filename.rsplit(".", 1)[1].lower() if "." in filename else ""
    ax, tx, dx = (
        ref_author.AuthorExtractor(),
        ref_title.TitleExtractor(),
        ref_date.DateExtractor(),
    )
    out = {"authors": [], "authors_source": None, "title": None,
           "title_source": None, "year": None, "year_source": None}
    ad = ax.extract_from_document(text)
    if ad["authors"]:
        out["authors"], out["authors_source"] = ad["authors"], "document"
    else:
        a = ax.extract_from_filename(stem)
        if a:
            out["authors"], out["authors_source"] = [a], "filename"
    t = tx.extract_from_document(text)
    if t:
        out["title"], out["title_source"] = t, "document"
    else:
        t = tx.extract_from_filename(stem)
        if t:
            out["title"], out["title_source"] = t, "filename"
    y = dx.extract_from_document(text)
    if y:
        out["year"], out["year_source"] = y, "document"
    else:
        y = dx.extract_from_filename(stem)
        if y:
            out["year"], out["year_source"] = y, "filename"
    jd = ref_journal.JournalExtractor().extract_from_document(text)
    out.update(
        journal_name=jd.get("journal_name"), volume=jd.get("volume"),
        issue=jd.get("issue"), page_start=jd.get("page_start"),
    )
    out["new_filename"], out["confidence"] = None, "UNKNOWN"
    if out["authors"] and out["year"] and out["title"]:
        name = "%s_%s_%s%s" % (
            out["year"],
            ax.format_author_for_filename(out["authors"]),
            ref_tfmt.TitleFormatter().format_for_filename(out["title"]),
            ext,
        )
        import re as _re

        name = _re.sub(r'[<>:"/\\|?*\x00-\x1f]', "", name)
        name = "".join(c for c in name if ord(c) >= 32).strip(". ")
        if len(name) > 255:
            stem2, ext2 = name.rsplit(".", 1)
            name = stem2[: 255 - len(ext2) - 1] + "." + ext2
        out["new_filename"] = name
        dc = sum(
            1
            for k in ("authors_source", "title_source", "year_source")
            if out[k] == "document"
        )
        out["confidence"] = "HIGH" if dc >= 3 else "MEDIUM" if dc >= 2 else "LOW"
    return out


@settings(max_examples=_EX, deadline=None)
@given(_doc_strategy(), st.sampled_from(_FILENAMES))
def test_article_rename_flow_differential(text, filename):
    assert ours.article_rename_doc(text, filename) == _ref_rename_flow(text, filename)
