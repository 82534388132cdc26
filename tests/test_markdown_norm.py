"""Markdown RAG normal-form kernel (N7) + its Spark operator."""

from modern_document_converter_for_ai_library_spark.operators.legacy_clean import (
    markdown_normalize_documents,
)
from modern_document_converter_for_ai_library_spark.reference_semantics.markdown_norm import (
    clean_frontmatter_spacing,
    clean_markdown,
    fold_unicode_punct,
    normalize_headings,
    normalize_spacing,
    strip_control_chars,
)


def test_reference_docstring_example():
    # markdown_cleaner.py:262-264 golden
    assert clean_markdown("﻿##Heading\r\nContent\x00") == "## Heading\nContent\n"


def test_smart_punct_folding():
    assert fold_unicode_punct("“x” – y — z…") == '"x" - y -- z...'
    assert fold_unicode_punct("a\xa0b") == "a b"


def test_control_and_zero_width():
    assert strip_control_chars("a\x00b​c\xadd\te\n") == "abcd\te\n"


def test_heading_normalization():
    out = normalize_headings("##No Space\nbody\n###  Extra  ###")
    # space inserted after hashes, trailing hashes dropped, blank line added
    # before headings that follow non-blank lines
    assert out == "##No Space\nbody\n\n### Extra" or out == "## No Space\nbody\n\n### Extra"
    # the first line IS a heading too (i == 0 -> no blank inserted)
    assert out.startswith("## No Space")


def test_empty_heading_left_alone():
    assert normalize_headings("###\ntext") == "###\ntext"


def test_spacing_caps_blanks_and_trailing_newline():
    assert normalize_spacing("line1  \n\n\n\n\nline2") == "line1\n\n\nline2\n"
    assert normalize_spacing("x") == "x\n"


def test_frontmatter_spacing():
    got = clean_frontmatter_spacing("---\ntitle: T\n---\n\n\n\n# H")
    assert got == "---\ntitle: T\n---\n\n# H"


def test_spark_operator_matches_kernel(spark):
    samples = [
        ("m1", "﻿##Heading\r\nContent\x00"),
        ("m2", "---\ntitle: T\n---\n\n\n\nBody “quoted” text…"),
        ("m3", ""),
    ]
    df = spark.createDataFrame(samples, ["doc_id", "text"])
    out = {r["doc_id"]: r["markdown"] for r in markdown_normalize_documents(df).collect()}
    for doc_id, text in samples:
        assert out[doc_id] == clean_markdown(text), doc_id
