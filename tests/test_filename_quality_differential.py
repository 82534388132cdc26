"""Differential test for the filename-quality evaluator: load the ACTUAL
legacy module (zOld-Code/step1--…-b-articles/src/filename_evaluator.py)
and require identical (quality, score, reasons) and should_replace
decisions from reference_semantics/filename_quality.py on fuzzed
filenames covering garbage patterns, penalty/bonus stacking, and the
length/word-count heuristics."""

import importlib.util
import os as _os
import sys

import pytest
from hypothesis import given, settings, strategies as st

from modern_document_converter_for_ai_library_spark.reference_semantics import (
    filename_quality as ours,
)

_EX = int(_os.environ.get("DIFF_FUZZ_EXAMPLES", "250"))

sys.dont_write_bytecode = True

_PATH = (
    "/root/reference/zOld-Code/step1--Base_FILENAME--b-articles/src/"
    "filename_evaluator.py"
)


def _load():
    spec = importlib.util.spec_from_file_location("ref_fn_eval", _PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


try:
    _ref = _load().FilenameEvaluator()
    _REF_OK = True
except Exception:  # pragma: no cover - reference tree unavailable
    _REF_OK = False

pytestmark = pytest.mark.skipif(
    not _REF_OK, reason="reference module not loadable"
)

_WORDS = st.sampled_from(
    [
        "Smith", "johnson", "The", "Law", "of", "contracts", "2019",
        "download", "ssrn-", "untitled", "Analysis", "vX", "a1b2c3d4e5",
        "draft", "FINAL", "(1)", "(2)", "  ", "review.tmp", "doi_",
        "Johnson_Smith_Brown", "x",
    ]
)
_SEP = st.sampled_from(["", " ", "_", "-", "."])
_EXT = st.sampled_from([".pdf", ".PDF", ".docx", ".doc", ".txt", ""])


@st.composite
def filenames(draw):
    parts = draw(st.lists(_WORDS, min_size=1, max_size=8))
    sep = draw(_SEP)
    return sep.join(parts) + draw(_EXT)


@settings(max_examples=_EX, deadline=None)
@given(filenames())
def test_evaluate_quality_matches_reference(name):
    assert ours.evaluate_quality(name) == _ref.evaluate_quality(name)


def test_garbage_short_circuit_and_hand_cases():
    for name in [
        "download.pdf", "Document (1).pdf", "untitled.docx", "12345.pdf",
        "deadbeef01.pdf", "Smith_Johnson_2019_Contract_Theory.pdf",
        "a.pdf", "x" * 200 + ".pdf", "New Report.pdf",
        "Some  doubled  spaces.pdf", "weird$chars%here.pdf",
    ]:
        assert ours.evaluate_quality(name) == _ref.evaluate_quality(name), name


def test_should_replace_matrix_matches_reference():
    for conf in ["HIGH", "MEDIUM", "LOW", "UNKNOWN", "ODD"]:
        for qual in ["HIGH", "MEDIUM", "LOW", "ODD"]:
            for force in [False, True]:
                assert ours.should_replace(conf, qual, force) == (
                    _ref.should_replace(conf, qual, force)
                ), (conf, qual, force)


def test_columnar_scoring_matches_kernel(spark):
    """The distributed column formulation must equal the pure-Python kernel
    (itself differential-green vs the real module) on every synthesized
    filename at sf0.001."""
    from modern_document_converter_for_ai_library_spark.queries import (
        spark_filename_quality,
    )

    rows = spark_filename_quality(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 0
    for r in rows:
        quality, score, _ = ours.evaluate_quality(r["filename"])
        assert (r["quality"], r["score"]) == (quality, score), r["filename"]
