"""Unit tests for the pure-Python kernels (SURVEY.md §5 strategy, item 2).

Golden expectations transcribed from the reference's docstrings, configs and
smoke scripts (citations inline). These tests run without Spark.
"""

import pytest
from hypothesis import given, strategies as st

from modern_document_converter_for_ai_library_spark.reference_semantics import (
    apply_cleaning_rules,
    classify_text,
    cleaning_rules_for,
    code_to_index,
    convert_spans_doc,
    discover_code,
    extract_caselaw_metadata,
    fix_hyphens,
    format_filename,
    generate_frontmatter,
    index_to_code,
    is_valid_code,
    normalize_text,
    normalize_whitespace,
    rename_doc,
)
from modern_document_converter_for_ai_library_spark.reference_semantics.filename import (
    format_case_name,
    format_citation,
    format_court,
)
from modern_document_converter_for_ai_library_spark.reference_semantics import legacy


# ---------------------------------------------------------------------------
# Code math (code_generator.py:72-80,159-168 examples)
# ---------------------------------------------------------------------------

def test_index_to_code_goldens():
    assert index_to_code(0) == "AAAAA"
    assert index_to_code(1) == "AAAAB"
    assert index_to_code(24) == "AAAAZ"
    assert index_to_code(25) == "AAABA"
    assert index_to_code(25**5 - 1) == "ZZZZZ"


def test_code_validation():
    assert is_valid_code("AAAAA")
    assert is_valid_code("XYZAB")
    assert not is_valid_code("WWWWW")  # W excluded from the alphabet
    assert not is_valid_code("AAAA")
    assert not is_valid_code("aaaaa")


def test_code_discovery():
    # code_generator.py:45 pattern; smoke_test_registry.py scenarios
    assert discover_code("document----ABCDE.pdf") == "ABCDE"
    assert discover_code("folder----XYZAB") == "XYZAB"
    assert discover_code("bad----WWWWW.pdf") is None  # invalid -> fresh code
    assert discover_code("plain.pdf") is None
    assert discover_code("old_statute----ABXCD.pdf") == "ABXCD"


@given(st.integers(min_value=0, max_value=25**5 - 1))
def test_code_roundtrip(idx):
    assert code_to_index(index_to_code(idx)) == idx


def test_index_out_of_range():
    with pytest.raises(RuntimeError):
        index_to_code(25**5)
    with pytest.raises(ValueError):
        index_to_code(-1)


# ---------------------------------------------------------------------------
# Normalization (text_normalizer.py docstring examples)
# ---------------------------------------------------------------------------

def test_fix_hyphens_goldens():
    assert fix_hyphens("The defend-\nant argued") == "The defendant argued"
    assert fix_hyphens("The PLAIN-\nTIFF filed") == "The PLAINTIFF filed"
    assert fix_hyphens("A well-known case") == "A well-known case"
    assert fix_hyphens("word-   next") == "word next"  # hyphen + 2+ spaces + lower


def test_normalize_whitespace():
    assert normalize_whitespace("The   defendant    argued") == "The defendant argued"
    assert normalize_whitespace("Line 1\n\n\n\nLine 2") == "Line 1\n\nLine 2"
    assert normalize_whitespace("a\tb") == "a b"
    assert normalize_whitespace("x\r\ny\rz") == "x\ny\nz"
    assert normalize_whitespace("trail   \nnext") == "trail\nnext"


def test_normalize_text_punctuation_and_empty():
    assert normalize_text("") == ""
    assert normalize_text(None) == ""
    assert normalize_text("End.Next sentence") == "End. Next sentence"
    assert normalize_text("a,b") == "a, b"
    # commas before newline untouched ([^ \n])
    assert normalize_text("a,\nb") == "a,\nb"


def test_normalize_text_ascii_fold():
    # cleantext absent in this env -> reference falls back to ascii-ignore
    # (text_normalizer.py:179-182); smart quotes are dropped, not folded.
    out = normalize_text("café “quoted”")
    assert out == "caf quoted"


# ---------------------------------------------------------------------------
# Classification (caselaw.yaml / statutes.yaml weights)
# ---------------------------------------------------------------------------

CASE_TEXT = (
    "Indian Trail, LLC v. State Bank and Trust Company\n"
    "Court of Appeals of Georgia\n"
    "July 3, 2014, Decided\n"
    "328 Ga. App. 524\n"
    "Judgment affirmed. Plaintiff appealed.\n"
)

STATUTE_TEXT = (
    "Official Code of Georgia Annotated\n"
    "TITLE 42\n"
    "§ 5-6-34. Appeals procedures\n"
    "O. C. G. A. provisions as amended\n"
)

PROSE_TEXT = "A quiet walk in the park on a sunny afternoon with friends.\n"


def test_classify_caselaw():
    r = classify_text(CASE_TEXT)
    assert r.document_type == "caselaw"
    # v.(40) + reporter(35) + court(20) + party(10) + procedural terms
    # 'Judgment'(5, case-sensitive) + action verbs 'affirmed'(5) = 115.
    # The date pattern needs the year AFTER the keyword ('Decided ... 2014'),
    # so 'July 3, 2014, Decided' does not score it.
    assert r.score == 115.0
    assert r.confidence == 1.0  # capped at 1.0
    assert r.confidence_level == "HIGH"


def test_classify_statute():
    r = classify_text(STATUTE_TEXT)
    assert r.document_type == "statute"
    assert r.score >= 100  # 'Official Code of' trump card alone is 100
    assert r.confidence == 1.0


def test_classify_unknown_and_empty():
    assert classify_text(PROSE_TEXT).document_type == "unknown"
    r = classify_text("")
    assert r.document_type == "unknown" and r.confidence == 0.0


def test_classify_below_threshold_keeps_confidence():
    # One weak match only: 'amended' (statute, +5) -> below low=10 -> unknown
    # but confidence = 5/100 (classifier.py:306-311)
    r = classify_text("the rules were amended quietly")
    assert r.document_type == "unknown"
    assert r.confidence == pytest.approx(0.05)


def test_prefilter_equivalence_on_corpus():
    """The literal-prescan optimization must be score-identical to the naive
    full re.search path on every synthetic doc and on adversarial snippets."""
    from modern_document_converter_for_ai_library_spark.reference_semantics.classify import (
        score_type,
    )
    from modern_document_converter_for_ai_library_spark.reference_semantics.convert import (
        reassemble_text,
    )
    from modern_document_converter_for_ai_library_spark.sources.synth import (
        synth_documents_pandas,
    )

    texts = [
        reassemble_text(list(r.spans))
        for r in synth_documents_pandas(300, seed=42).itertuples()
    ]
    texts += [
        "",  # empty
        "opinion",  # lowercase vs case-sensitive 'Opinion'
        "Defendants moved",  # boundary: 'Defendants' must NOT match \bDefendant\b
        "wl 123",  # prescan hit, regex needs 'WL\\s+\\d+' (ci) -> matches
        "vs. something",  # 'v.' absent ('vs.' contains 'v' not 'v.')... contains 's.'
        "averse to remandX",  # 'reverse'? 'averse' contains 'verse' not 'reverse'
        "Sections 12",  # 'section' present; '(?:Section|Sec.)\\s+\\d+' vs 'Sections 12'
        "SUPREME COURT",  # pure-literal ci
        "u.s advisory",  # prescan 'u.s' present but regex U\\.S\\.C\\. absent
        # non-ASCII: the lowered-pattern fast path must disable itself
        # (İ.lower() is 2 chars; ß is caseless) and fall back to IGNORECASE
        "İstanbul Court of Appeals",
        "ß Opinion Per Curiam",
        "Smith v. Jones DECIDED March 4, 2019",
        "U.S.C. § 101 TITLE 5",
    ]
    for t in texts:
        for tn in ("caselaw", "statute"):
            fast_score, fast_hits = score_type(t, tn, use_prescan=True)
            slow_score, slow_hits = score_type(t, tn, use_prescan=False)
            assert (fast_score, fast_hits) == (slow_score, slow_hits), (tn, t[:80])


@given(st.text(alphabet=" .\nvVwWcC0123456789abdefgilmnoprstuJ§", max_size=80))
def test_prefilter_equivalence_property(text):
    from modern_document_converter_for_ai_library_spark.reference_semantics.classify import (
        score_type,
    )

    for tn in ("caselaw", "statute"):
        assert score_type(text, tn, True) == score_type(text, tn, False)


# ---------------------------------------------------------------------------
# Cleaning rules (caselaw.yaml:386-431; convert_step.py:242-309)
# ---------------------------------------------------------------------------

def test_noise_removal_and_heading_markup():
    rules = cleaning_rules_for("caselaw")
    text = "\n".join(
        [
            "As of: November 28, 2024 8:48 PM Z",
            "Opinion by: LAGRUA",
            "Page 3 of 17",
            "BACKGROUND",
            "Some ordinary sentence here.",
            "1. Analysis",
            "II. Facts",
            "End of Document",
            "|",
            "***",
        ]
    )
    cleaned, stats = apply_cleaning_rules(text, rules)
    assert stats["lines_removed"] == 5  # As of, Page, End of Document, |, ***
    assert stats["headings_added"] == 4
    lines = cleaned.split("\n")
    assert lines[0] == "## Opinion by: LAGRUA"
    assert lines[1] == "## BACKGROUND"
    assert lines[2] == "Some ordinary sentence here."
    assert lines[3] == "### 1. Analysis"
    assert lines[4] == "### II. Facts"


def test_allcaps_heading_beats_roman_rule():
    # 'II. FACTS' is all-caps so the all-caps rule (## ) wins over the roman
    # rule (### ) — first match in list order.
    rules = cleaning_rules_for("caselaw")
    cleaned, stats = apply_cleaning_rules("II. FACTS", rules)
    assert cleaned == "## II. FACTS"


def test_statute_gets_empty_rules():
    # statute vs statutes.yaml mismatch (convert_step.py:227-231): no cleaning
    rules = cleaning_rules_for("statute")
    text = "End of Document\nPage 3 of 17"
    cleaned, stats = apply_cleaning_rules(text, rules)
    assert cleaned == text
    assert stats == {"lines_removed": 0, "headings_added": 0}


# ---------------------------------------------------------------------------
# Metadata extraction (smoke_test_caselaw.py:20-26, adjusted to actual
# regex behavior: the case-name pattern cannot start mid-number, so the
# leading '915 ' is not captured by the reference code either)
# ---------------------------------------------------------------------------

def test_indian_trail_metadata():
    text = (
        "915 Indian Trail, LLC v. State Bank and Trust Company\n"
        "Court of Appeals of Georgia\n"
        "July 3, 2014, Decided\n"
        "328 Ga. App. 524; 759 S.E.2d 654\n"
    )
    fields = extract_caselaw_metadata(text)
    assert fields["case_name"] == "Indian Trail, LLC v. State Bank and Trust Company"
    assert fields["year"] == "2014"
    assert fields["court"] == "Ga. Ct. App."
    assert fields["citation"] == "328 Ga. App. 524"  # Ga. App. outranks S.E.2d


def test_party_cleanup():
    text = "Smith, Plaintiff v. Jones, Defendant\nDecided: May 1, 2001\n"
    fields = extract_caselaw_metadata(text)
    assert fields["case_name"] == "Smith v. Jones"
    assert fields["year"] == "2001"


def test_federal_district_court_lazy_state_bug():
    # The lazy trailing group captures a single letter (caselaw.py district
    # pattern) -> 'ND I' for Illinois. Bug-for-bug.
    text = "United States District Court for the Northern District of Illinois\n"
    fields = extract_caselaw_metadata(text)
    assert fields["court"] == "ND I"


def test_supreme_court_and_circuit():
    assert (
        extract_caselaw_metadata("Supreme Court of Georgia\n")["court"]
        == "Ga. Sup. Ct."
    )
    assert (
        extract_caselaw_metadata(
            "United States Court of Appeals for the Eleventh Circuit\n"
        )["court"]
        == "Eleventh Circuit"
    )


# ---------------------------------------------------------------------------
# Filename formatting (filename_formatter.py examples + template yaml)
# ---------------------------------------------------------------------------

def test_field_formatters():
    assert format_court("Ga. Ct. App.") == "Ga_Ct_App"
    assert format_court("ND Ill.") == "ND_Ill"
    assert format_case_name("Abbott Labs. v. Sandoz, Inc") == "Abbott-Labs-v-Sandoz-Inc"
    assert (
        format_case_name("Indian Trail, LLC v. State Bank & Trust Co.")
        == "Indian-Trail-LLC-v-State-Bank-and-Trust-Co"
    )
    assert format_citation("759 S.E.2d 654") == "759_SE2d_654"
    # The reference's docstring claims '328_GaApp_524' / '743_FSupp2d_762'
    # but its CODE (replace('.','') then replace(' ','_')) produces the
    # underscore-separated forms — we match the code, not the docstring.
    assert format_citation("328 Ga. App. 524") == "328_Ga_App_524"
    assert format_citation("743 F. Supp. 2d 762") == "743_F_Supp_2d_762"


def test_format_filename_full():
    fields = {
        "court": "Ga. Ct. App.",
        "year": "2014",
        "case_name": "Indian Trail, LLC v. State Bank and Trust Company",
        "citation": "328 Ga. App. 524",
    }
    name = format_filename(fields, "AAAAA", ".pdf")
    assert name == (
        "c.Ga_Ct_App__2014__Indian-Trail-LLC-v-State-Bank-and-Trust-Company"
        "__328_Ga_App_524----AAAAA.pdf"
    )


def test_format_filename_missing_required():
    assert format_filename({"year": "2014"}, "AAAAA", ".pdf") is None


def test_format_filename_optional_citation_fallback():
    fields = {"court": "Ga. Ct. App.", "year": "2014", "case_name": "A v. B"}
    name = format_filename(fields, "AAAAB", ".pdf")
    assert name == "c.Ga_Ct_App__2014__A-v-B__Unpub----AAAAB.pdf"


def test_truncation_keeps_extension():
    fields = {
        "court": "Ga. Ct. App.",
        "year": "2014",
        "case_name": "X" * 400,
        "citation": "1 Ga. 2",
    }
    name = format_filename(fields, "AAAAC", ".pdf")
    assert len(name) == 255
    assert name.endswith(".pdf")


# ---------------------------------------------------------------------------
# Frontmatter (convert_step.py:316-381; called with code=None, metadata={})
# ---------------------------------------------------------------------------

def test_frontmatter_minimal():
    fm = generate_frontmatter("caselaw", "case.pdf")
    assert fm == "---\ntype: caselaw\nsource_file: case.pdf\n---"


@given(
    st.text(
        alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789._- ()'é",
        min_size=1,
        max_size=120,
    )
)
def test_frontmatter_fast_path_equals_yaml_dump(source_file):
    """The plain-scalar fast path must be byte-identical to yaml.dump for
    every input (falls back to yaml.dump when unsure)."""
    import yaml as _yaml

    got = generate_frontmatter("caselaw", source_file)
    body = _yaml.dump(
        {"type": "caselaw", "source_file": source_file},
        default_flow_style=False,
        allow_unicode=True,
        sort_keys=False,
    )
    assert got == f"---\n{body}---"


def test_frontmatter_yaml_special_words_still_quoted():
    # 'no' would be resolved as a YAML 1.1 bool -> must take the yaml path
    assert generate_frontmatter("caselaw", "no") == "---\ntype: caselaw\nsource_file: 'no'\n---"


def test_frontmatter_with_metadata():
    fm = generate_frontmatter(
        "caselaw", "x.pdf", code="AAAAA", metadata={"case_name": "A v. B"}
    )
    assert fm == (
        "---\ntype: caselaw\nsource_file: x.pdf\ncode: AAAAA\n"
        "case_name: A v. B\n---"
    )


# ---------------------------------------------------------------------------
# Full convert kernel over spans
# ---------------------------------------------------------------------------

def _text_span(text, off):
    return {"kind": "text", "text": text, "media_ref": "", "offset": off}


def _media_span(ref, off):
    return {"kind": "image", "text": "", "media_ref": ref, "offset": off}


def test_convert_no_media_matches_reference_string_pipeline():
    spans = [
        _text_span("As of: November 28, 2024 8:48 PM Z", 0),
        _text_span("Indian Trail, LLC v. State Bank and Trust Company", 1),
        _text_span("Court of Appeals of Georgia", 2),
        _text_span("OPINION", 3),
        _text_span("The court affirmed the judgment below.", 4),
        _text_span("End of Document", 5),
    ]
    out = convert_spans_doc("doc1", spans, source_file="case.pdf")
    assert out["success"]
    assert out["document_type"] == "caselaw"
    assert out["lines_removed"] == 2
    assert out["headings_added"] == 1
    # span 0 is frontmatter, span 1 the cleaned body
    assert out["spans"][0]["text"] == "---\ntype: caselaw\nsource_file: case.pdf\n---"
    body = out["spans"][1]["text"]
    assert body == (
        "Indian Trail, LLC v. State Bank and Trust Company\n"
        "Court of Appeals of Georgia\n"
        "## OPINION\n"
        "The court affirmed the judgment below."
    )
    expected_final = out["spans"][0]["text"] + "\n\n" + body
    assert out["character_count"] == len(expected_final)
    assert [s["offset"] for s in out["spans"]] == list(range(len(out["spans"])))


def test_convert_preserves_media_interleaving():
    spans = [
        _text_span("Smith v. Jones, Appellant\nCourt of Appeals of Georgia", 0),
        _media_span("media://doc2/0", 1),
        _text_span("Decided: May 1, 2001\nThe judgment is affirmed.", 2),
        _media_span("media://doc2/1", 3),
    ]
    out = convert_spans_doc("doc2", spans, source_file="smith.pdf")
    assert out["success"]
    kinds = [s["kind"] for s in out["spans"]]
    refs = [s["media_ref"] for s in out["spans"] if s["kind"] == "image"]
    assert kinds == ["text", "text", "image", "text", "image"]
    assert refs == ["media://doc2/0", "media://doc2/1"]
    assert [s["offset"] for s in out["spans"]] == [0, 1, 2, 3, 4]


def test_convert_empty_doc_fails_gracefully():
    out = convert_spans_doc("doc3", [_text_span("", 0)], source_file="e.pdf")
    assert not out["success"]
    assert "image-based PDF" in out["error_message"]
    assert out["spans"] == []


def test_statute_doc_not_cleaned():
    spans = [
        _text_span("Official Code of Georgia Annotated", 0),
        _text_span("End of Document", 1),  # would be noise for caselaw
    ]
    out = convert_spans_doc("doc4", spans, source_file="ocga.pdf")
    assert out["document_type"] == "statute"
    assert out["lines_removed"] == 0
    assert "End of Document" in out["spans"][1]["text"]


# ---------------------------------------------------------------------------
# Rename kernel
# ---------------------------------------------------------------------------

def test_rename_doc_caselaw():
    spans = [
        _text_span("Indian Trail, LLC v. State Bank and Trust Company", 0),
        _text_span("Court of Appeals of Georgia", 1),
        _text_span("July 3, 2014, Decided", 2),
        _text_span("328 Ga. App. 524", 3),
    ]
    out = rename_doc("doc1", spans, "Indian_Trail.pdf")
    assert out["rename_success"]
    assert out["document_type"] == "caselaw"
    assert out["filename_template"] == (
        "c.Ga_Ct_App__2014__Indian-Trail-LLC-v-State-Bank-and-Trust-Company"
        "__328_Ga_App_524----{code}.pdf"
    )
    assert out["discovered_code"] is None


def test_rename_preserves_legacy_code():
    spans = [_text_span("A v. B\nSupreme Court of Texas\nDecided: May 1, 2001\n1 U.S. 2", 0)]
    out = rename_doc("doc9", spans, "old----ABXCD.pdf")
    assert out["discovered_code"] == "ABXCD"


# ---------------------------------------------------------------------------
# Legacy cleaner (clean_txt.py)
# ---------------------------------------------------------------------------

def test_running_header_removal():
    lines = ["SUPREME COURT REPORTS"] * 3 + ["Actual body text that stays."]
    headers = legacy.collect_running_headers(lines)
    assert headers == {"SUPREME COURT REPORTS"}
    cleaned = legacy.remove_headers_and_page_numbers(lines, headers)
    assert cleaned == ["Actual body text that stays."]


def test_bare_page_numbers_dropped():
    cleaned = legacy.remove_headers_and_page_numbers(
        ["17", "xiv", "MCMXC", "body line here"], set()
    )
    assert cleaned == ["body line here"]


def test_heading_marking_with_context():
    lines = ["", "INTRODUCTION", "", "This is ordinary paragraph text that continues."]
    marked = legacy.mark_headings(lines, set())
    assert marked[1] == "# INTRODUCTION"  # < 25 chars -> '# '


def test_paragraph_merge_dehyphenation():
    lines = ["The defend-", "ant argued the case", "", "New paragraph."]
    paras = legacy.build_paragraphs(lines)
    assert paras[0] == "The defendant argued the case"
    assert paras[-1] == "New paragraph."


def test_paragraph_merge_uppercase_keeps_hyphen_chars():
    lines = ["WELL-", "KNOWN precedent"]
    paras = legacy.build_paragraphs(lines)
    assert paras[0] == "WELL-KNOWN precedent"


def test_margin_filter():
    kept = legacy.margin_content_filter(
        ["short", "Decided May 1", "A long enough line to clear the threshold."]
    )
    assert kept == ["Decided May 1", "A long enough line to clear the threshold."]


def test_lowered_equiv_rejects_unsafe_class_ranges():
    from modern_document_converter_for_ai_library_spark.reference_semantics.classify import (
        _lowered_equiv,
    )

    # safe: same-case letter ranges and lowercase-only patterns
    assert _lowered_equiv(r"[A-Z]{3}") is not None
    assert _lowered_equiv(r"foo[a-z]+bar") is not None
    # unsafe: lowercasing changes the class extent
    assert _lowered_equiv(r"[A-z]") is None
    assert _lowered_equiv(r"[?-Z]") is None
    # unsafe: backslash-uppercase escapes complement on lowering
    assert _lowered_equiv(r"\Wfoo") is None
