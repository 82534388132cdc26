"""DIFFERENTIAL tests: run the ACTUAL reference implementation (imported
read-only from /root/reference) side by side with our kernels on the same
inputs and require identical outputs.

This is a strictly stronger check than the transcribed goldens in
test_reference_semantics.py: any drift between our re-implementation and the
real reference code — pattern sets, rule ordering, edge-case handling —
fails here even if the transcriptions were wrong.

The reference resolves its YAML/JSON config relative to the CWD, so every
test chdirs into /root/reference (read-only is fine; nothing is written —
bytecode writing is disabled too).
"""

import sys

import pytest

sys.dont_write_bytecode = True
if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")

try:
    from src.cleaners.text_normalizer import normalize_text as ref_normalize
    from src.services import code_generator as ref_cg
    from src.services.classifier import classify as ref_classify
    from src.services.classifier import get_all_scores as ref_scores
    from src.formatters.filename_formatter import FilenameFormatter as RefFormatter
    from src.plugins.caselaw import CaselawProcessor as RefCaselaw
    from src.steps.convert_step import ConvertStep as RefConvertStep

    _REF_OK = True
except Exception:  # pragma: no cover - reference tree unavailable
    _REF_OK = False

pytestmark = pytest.mark.skipif(not _REF_OK, reason="reference tree not importable")

from modern_document_converter_for_ai_library_spark.reference_semantics.classify import (
    classify_text as our_classify,
    score_type as our_score,
)
from modern_document_converter_for_ai_library_spark.reference_semantics import codes as our_cg
from modern_document_converter_for_ai_library_spark.reference_semantics.cleanrules import (
    apply_cleaning_rules as our_apply_rules,
)
from modern_document_converter_for_ai_library_spark.reference_semantics.filename import (
    format_case_name as our_case_name,
    format_citation as our_citation,
    format_court as our_court,
    format_filename as our_filename,
    format_year as our_year,
)
from modern_document_converter_for_ai_library_spark.reference_semantics.frontmatter import (
    generate_frontmatter as our_frontmatter,
)
from modern_document_converter_for_ai_library_spark.reference_semantics.metadata import (
    extract_caselaw_metadata as our_metadata,
)
from modern_document_converter_for_ai_library_spark.reference_semantics.normalize import (
    normalize_text as our_normalize,
)
from modern_document_converter_for_ai_library_spark.reference_semantics.rules import (
    cleaning_rules_for,
)


@pytest.fixture(autouse=True, scope="module")
def _in_reference_dir():
    import os

    cwd = os.getcwd()
    os.chdir("/root/reference")
    yield
    os.chdir(cwd)


@pytest.fixture(scope="module")
def texts():
    from modern_document_converter_for_ai_library_spark.reference_semantics.convert import (
        reassemble_text,
    )
    from modern_document_converter_for_ai_library_spark.sources.synth import (
        synth_documents_pandas,
    )

    pdf = synth_documents_pandas(250, seed=42)
    out = []
    for spans in pdf["spans"]:
        out.append(
            reassemble_text(
                [
                    s
                    if isinstance(s, dict)
                    else dict(zip(("kind", "text", "media_ref", "offset"), s))
                    for s in spans
                ]
            )
        )
    out += [
        "",
        "   \n\t \n",
        "Smith v. Jones, Appellant\nCourt of Appeals of Georgia\n"
        "July 3, 2014, Decided\n328 Ga. App. 524\nEnd of Document",
        "Official Code of Georgia Annotated\n§ 16-3-1\nTITLE 16",
        "defend-\nant moved to PLAIN-\nTIFF's house",
        "a.B,c  d\te\r\nf\n\n\n\ng",
        "In re Gault, 387 U.S. 1 (1967)",
        "randomly unrelated prose about gardening tools",
    ]
    return out


def test_normalize_differential(texts):
    for t in texts:
        assert our_normalize(t) == ref_normalize(t), repr(t[:80])


def test_normalize_modernize_flag_differential(texts):
    # N5: the archaic->modern spelling pass, off by default, on when asked
    for t in texts[:60] + [
        "The honourable court shewed its colours vpon the publick record."
    ]:
        assert our_normalize(t, modernize_spellings=True) == ref_normalize(
            t, modernize_spellings=True
        ), repr(t[:80])


def test_filename_safe_text_differential():
    # N8: filename-safe text (text_normalizer.py:262-294)
    from src.cleaners.text_normalizer import (
        normalize_filename_text as ref_fname_text,
    )
    from modern_document_converter_for_ai_library_spark.reference_semantics.normalize import (
        normalize_filename_text as our_fname_text,
    )

    for s in [
        "Smith v. Jones (2014)!",
        "a/b\\c:d*e?f\"g<h>i|j",
        "  collapse   spaces  ",
        "under_score-dash.dot",
        "",
        "Ünïcôdé name",
    ]:
        assert our_fname_text(s) == ref_fname_text(s), repr(s)


def test_classifier_scores_differential(texts):
    for t in texts:
        if not t.strip():
            continue  # reference get_all_scores asserts on empty separately
        ref = ref_scores(t)
        for type_name, (ref_score, ref_inds) in ref.items():
            score, inds = our_score(t, type_name)
            assert score == ref_score, (type_name, t[:80], score, ref_score)
            assert inds == ref_inds, (type_name, t[:80])


def test_classify_differential(texts):
    for t in texts:
        ref = ref_classify(t)
        ours = our_classify(t)
        assert ours.document_type == ref.document_type.value, t[:80]
        assert ours.confidence == pytest.approx(ref.confidence), t[:80]
        assert list(ours.indicators) == list(ref.indicators), t[:80]


def test_code_math_differential():
    indices = [0, 1, 24, 25, 624, 625, 390624, 390625, 9765624]
    for i in indices:
        assert our_cg.index_to_code(i) == ref_cg.index_to_code(i), i
        assert our_cg.code_to_index(our_cg.index_to_code(i)) == ref_cg.code_to_index(
            ref_cg.index_to_code(i)
        )
    for code in ["AAAAA", "ZZZZZ", "ABXCD", "WWWWW", "AAAAW", "AAAA", "aaaaa", "AAAA1"]:
        assert our_cg.is_valid_code(code) == ref_cg.is_valid_code(code), code
    for fname in [
        "brief----ABXCD.pdf",
        "brief----WWWWW.pdf",
        "brief.pdf",
        "x----AAAAA",
        "x----AAAAA.tar.gz",
        "a----AAAAA----BBBBB.pdf",
    ]:
        assert our_cg.discover_code(fname) == ref_cg.extract_code_from_filename(
            fname
        ), fname


def test_filename_formatter_differential():
    ref = RefFormatter("caselaw")
    courts = ["Ga. Ct. App.", "N.D. Ill.", "Utah", "S. Ct.", " spaced  name "]
    years = ["2014", "", None, "1899"]
    names = [
        "Indian Trail, LLC v. State Bank & Trust Co.",
        "A  B--C",
        "-lead-trail-",
        "Ünïcôdé & Co.",
    ]
    cites = ["328 Ga. App. 524", "759 S.E.2d 654", " odd  cite. "]
    for c in courts:
        assert our_court(c) == ref.format_court(c), c
    for y in years:
        assert our_year(y or "") == ref.format_year(y or ""), y
    for n in names:
        assert our_case_name(n) == ref.format_case_name(n), n
    for ci in cites:
        assert our_citation(ci) == ref.format_citation(ci), ci
    fields = {
        "court": "Ga. Ct. App.",
        "year": "2014",
        "case_name": "Indian Trail, LLC v. State Bank & Trust Co.",
        "citation": "328 Ga. App. 524",
    }
    ref_name = ref.format_filename(fields, "AAAAA", ".pdf")
    assert our_filename(fields, "AAAAA", ".pdf") == ref_name


def test_caselaw_metadata_differential(texts):
    ref = RefCaselaw()
    for t in texts:
        if not t.strip():
            continue
        ref_md = ref.extract_metadata(t)
        ours = our_metadata(t)
        ref_fields = {k: f.value for k, f in ref_md.fields.items()}
        assert ours == ref_fields, t[:80]


def test_cleaning_rules_differential(texts):
    step = RefConvertStep(None)
    for doc_type in ("caselaw", "statute", "statutes", "unknown"):
        ref_rules = step._load_cleaning_rules(doc_type)
        our_rules = cleaning_rules_for(doc_type)
        # reference YAML keeps each rule as {pattern, description, action};
        # our compiled form flattens to the strings the engine consumes
        ref_noise = [p["pattern"] for p in ref_rules.get("noise_patterns", [])]
        assert our_rules.get("noise_patterns", []) == ref_noise, doc_type
        ref_heads = [
            (h["pattern"], h["markdown_prefix"]) for h in ref_rules.get("heading_patterns", [])
        ]
        our_heads = [tuple(h) for h in our_rules.get("heading_patterns", [])]
        assert our_heads == ref_heads, doc_type
    rules = step._load_cleaning_rules("caselaw")
    for t in texts:
        ref_text, ref_stats = step._apply_cleaning_rules(t, rules)
        ref_removed = ref_stats["lines_removed"]
        ref_added = ref_stats["headings_added"]
        our_text, stats = our_apply_rules(
            t,
            {
                "noise_patterns": [
                    p["pattern"] for p in rules.get("noise_patterns", [])
                ],
                "heading_patterns": [
                    (h["pattern"], h["markdown_prefix"])
                    for h in rules.get("heading_patterns", [])
                ],
            },
        )
        assert our_text == ref_text, t[:80]
        assert stats["lines_removed"] == ref_removed, t[:80]
        assert stats["headings_added"] == ref_added, t[:80]


def test_frontmatter_differential(texts):
    step = RefConvertStep(None)
    ref_fm = step._generate_frontmatter("caselaw", "smith.pdf", None, {})
    assert our_frontmatter("caselaw", "smith.pdf") == ref_fm


def _ref_convert_text(step, text: str, source_file: str):
    """The reference's full convert composition, exactly as
    ConvertStep.process_file does it post-extraction
    (convert_step.py:117-160): classify RAW -> normalize -> rules for the
    classified type -> frontmatter -> f"{fm}\\n\\n{cleaned}"."""
    classification = ref_classify(text)
    doc_type = classification.document_type
    normalized = ref_normalize(text)
    rules = step._load_cleaning_rules(doc_type.value)
    cleaned, stats = step._apply_cleaning_rules(normalized, rules)
    fm = step._generate_frontmatter(
        doc_type=doc_type.value, source_file=source_file, code=None, metadata={}
    )
    return f"{fm}\n\n{cleaned}", stats, classification


def test_full_convert_composition_differential(texts):
    """End-to-end: our span kernel on a single-text-span document must equal
    the reference pipeline's final file content, statistics, and
    classification — including the statute/statutes.yaml filename-mismatch
    quirk (statute docs get empty cleaning rules)."""
    from modern_document_converter_for_ai_library_spark.reference_semantics.convert import (
        convert_spans_doc,
    )

    step = RefConvertStep(None)
    for t in texts:
        if not t.strip():
            continue  # empty docs fail extraction in the reference (F6)
        ref_content, ref_stats, ref_cls = _ref_convert_text(step, t, "doc.pdf")
        res = convert_spans_doc(
            "d",
            [{"kind": "text", "text": t, "media_ref": "", "offset": 0}],
            source_file="doc.pdf",
        )
        assert res["success"], t[:80]
        out_spans = res["spans"]
        assert out_spans[0]["offset"] == 0  # frontmatter span first
        our_content = out_spans[0]["text"] + "\n\n" + "\n\n".join(
            s["text"] for s in out_spans[1:] if s["kind"] == "text"
        ) if len(out_spans) > 1 else out_spans[0]["text"]
        assert our_content == ref_content, t[:80]
        assert res["lines_removed"] == ref_stats["lines_removed"], t[:80]
        assert res["headings_added"] == ref_stats["headings_added"], t[:80]
        assert res["document_type"] == ref_cls.document_type.value, t[:80]
        assert res["confidence"] == pytest.approx(ref_cls.confidence), t[:80]


def test_rename_composition_differential(texts):
    """Rename flow on caselaw docs: our kernel's ``{code}``-templated
    filename, with a code substituted, must equal the reference composition
    classify -> CaselawProcessor.extract_metadata -> FilenameFormatter
    (rename_step.py:123-332, minus the filesystem/registry parts)."""
    from modern_document_converter_for_ai_library_spark.reference_semantics.convert import (
        rename_doc,
    )

    ref_fmt = RefFormatter("caselaw")
    ref_md = RefCaselaw()
    n_caselaw = 0
    for t in texts:
        if not t.strip():
            continue
        ours = rename_doc(
            "d",
            [{"kind": "text", "text": t, "media_ref": "", "offset": 0}],
            source_file="input.pdf",
        )
        ref_cls = ref_classify(t)
        assert ours["document_type"] == ref_cls.document_type.value
        if ref_cls.document_type.value != "caselaw":
            assert ours["filename_template"] is None
            continue
        n_caselaw += 1
        fields = {k: f.value for k, f in ref_md.extract_metadata(t).fields.items()}
        ref_name = ref_fmt.format_filename(fields, "QQQQQ", ".pdf")
        if ref_name is None:
            assert ours["filename_template"] is None, t[:80]
        else:
            assert ours["filename_template"] is not None, t[:80]
            assert (
                ours["filename_template"].replace("{code}", "QQQQQ") == ref_name
            ), t[:80]
    assert n_caselaw > 20  # the synthetic corpus plants plenty of caselaw


def test_markdown_strip_rules_differential():
    """N6: our MARKDOWN_STRIP_RULES list (used columnar in Spark with Java
    regex AND mirrored in the DuckDB oracle) applied via Python re must
    equal the reference's _markdown_to_plain_text. The (?m)/(?s) inline
    flags in our rules are the portable spelling of the reference's
    flags= arguments."""
    import re as _re

    from src.services.text_extractor import _markdown_to_plain_text
    from modern_document_converter_for_ai_library_spark.functions.markdown import (
        MARKDOWN_STRIP_RULES,
    )

    def ours(text: str) -> str:
        for pat, rep in MARKDOWN_STRIP_RULES:
            text = _re.sub(pat, rep.replace("$1", r"\1"), text)
        return text

    samples = [
        "# Title\nbody **bold** and *it* `code`\n> quote\n- item\n1. one\n---\n",
        "### deep header ###\n__under__ _single_\n[link](http://x) plain",
        "```python\ncode block\n```\nafter",
        "*** \n---\n___\nnot a rule --- mid",
        "no markdown at all",
        "",
        "**unterminated bold\n*stray star",
    ]
    for t in samples:
        assert ours(t) == _markdown_to_plain_text(t), repr(t[:60])


# ---------------------------------------------------------------------------
# property-based differential fuzzing: hypothesis drives both
# implementations with adversarial strings; any divergence is a real bug in
# our re-implementation (the reference IS the spec)
# ---------------------------------------------------------------------------

import os as _os

from hypothesis import given, settings, strategies as st

# deep-fuzz knob: DIFF_FUZZ_EXAMPLES=3000 pytest ... for a long hunt
_EX = int(_os.environ.get("DIFF_FUZZ_EXAMPLES", "150"))  # noqa: E402

# fragments that interact with the rule regexes, composed into documents
_FRAGMENTS = st.sampled_from(
    [
        "Page 3 of 17",
        "End of Document",
        "As of: November 28, 2024 8:48 PM Z",
        "Load Date: December 1, 2024",
        "|",
        "***",
        "Opinion by: LAGRUA",
        "OPINION",
        "BACKGROUND AND FACTS",
        "1. Analysis",
        "II. Facts",
        "Smith v. Jones",
        "328 Ga. App. 524",
        "Court of Appeals of Georgia",
        "July 3, 2014, Decided",
        "defend-",
        "ant",
        "PLAIN-",
        "TIFF",
        "a.B",
        "x,y",
        "",
        " ",
        "\t",
        "word-  word",
        "§ 16-3-1",
        "U.S.C.",
        "O. C. G. A.",
        "randomly unrelated prose",
    ]
)
_DOCS = st.lists(_FRAGMENTS, min_size=0, max_size=12).map("\n".join)
_RAW = st.text(
    alphabet=" .,\n\t\r-§|*#\N{LATIN SMALL LETTER I WITH DIAERESIS}"
    "vVwWcCpPsSuU0123456789abdefgilmnoqrtxyzJAEIOT",
    max_size=160,
)


@settings(max_examples=_EX, deadline=None)
@given(st.one_of(_DOCS, _RAW))
def test_normalize_diff_property(text):
    assert our_normalize(text) == ref_normalize(text)


@settings(max_examples=_EX, deadline=None)
@given(st.one_of(_DOCS, _RAW))
def test_classify_diff_property(text):
    ref = ref_classify(text)
    ours = our_classify(text)
    assert ours.document_type == ref.document_type.value
    assert ours.confidence == pytest.approx(ref.confidence)


@settings(max_examples=_EX, deadline=None)
@given(_DOCS)
def test_cleaning_diff_property(text):
    import os

    cwd = os.getcwd()
    os.chdir("/root/reference")  # @given doesn't compose with monkeypatch
    try:
        step = RefConvertStep(None)
        rules = step._load_cleaning_rules("caselaw")
    finally:
        os.chdir(cwd)
    ref_text, ref_stats = step._apply_cleaning_rules(text, rules)
    our_text, stats = our_apply_rules(
        text,
        {
            "noise_patterns": [p["pattern"] for p in rules.get("noise_patterns", [])],
            "heading_patterns": [
                (h["pattern"], h["markdown_prefix"])
                for h in rules.get("heading_patterns", [])
            ],
        },
    )
    assert our_text == ref_text
    assert stats["lines_removed"] == ref_stats["lines_removed"]
    assert stats["headings_added"] == ref_stats["headings_added"]


@settings(max_examples=_EX, deadline=None)
@given(st.text(alphabet=" .,&-_'\"<>:/\\|?*\tA-Za-z0123456789éü", max_size=60))
def test_formatter_diff_property(s):
    import os

    cwd = os.getcwd()
    os.chdir("/root/reference")
    try:
        ref = RefFormatter("caselaw")
    finally:
        os.chdir(cwd)
    assert our_court(s) == ref.format_court(s)
    assert our_case_name(s) == ref.format_case_name(s)
    assert our_citation(s) == ref.format_citation(s)
    assert our_year(s) == ref.format_year(s)
