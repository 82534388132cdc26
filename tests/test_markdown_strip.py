"""Markdown strip chain (N6) vs the reference regex semantics."""

import re

import pytest

from modern_document_converter_for_ai_library_spark.functions.markdown import (
    MARKDOWN_STRIP_RULES,
    strip_markdown,
)

SAMPLE = (
    "# Title\n"
    "Some **bold** and __also bold__ and *italic* text.\n"
    "A [link](http://example.com) plus `code`.\n"
    "> quoted line\n"
    "- item one\n"
    "1. item two\n"
    "---\n"
    "End."
)

EXPECTED = (
    "Title\n"
    "Some bold and also bold and italic text.\n"
    "A link plus code.\n"
    "quoted line\n"
    "item one\n"
    "item two\n"
    "\n"
    "End."
)


def _python_reference(text: str) -> str:
    # the reference chain (text_extractor.py:204-251) in re-module form
    text = re.sub(r"^#{1,6}\s+", "", text, flags=re.MULTILINE)
    text = re.sub(r"\*\*([^*]+)\*\*", r"\1", text)
    text = re.sub(r"__([^_]+)__", r"\1", text)
    text = re.sub(r"\*([^*]+)\*", r"\1", text)
    text = re.sub(r"_([^_]+)_", r"\1", text)
    text = re.sub(r"\[([^\]]+)\]\(([^\)]+)\)", r"\1", text)
    text = re.sub(r"`([^`]+)`", r"\1", text)
    text = re.sub(r"```[^\n]*\n(.*?)\n```", r"\1", text, flags=re.DOTALL)
    text = re.sub(r"^(\*\*\*|---|___)\s*$", "", text, flags=re.MULTILINE)
    text = re.sub(r"^>\s+", "", text, flags=re.MULTILINE)
    text = re.sub(r"^[\*\-\+]\s+", "", text, flags=re.MULTILINE)
    text = re.sub(r"^\d+\.\s+", "", text, flags=re.MULTILINE)
    return text


def test_python_reference_expectation():
    assert _python_reference(SAMPLE) == EXPECTED


def test_spark_strip_matches_reference(spark):
    df = spark.createDataFrame([("d1", SAMPLE)], ["doc_id", "text"])
    out = df.select(strip_markdown("text").alias("t")).collect()[0]["t"]
    assert out == _python_reference(SAMPLE) == EXPECTED


def test_rule_count_matches_reference():
    assert len(MARKDOWN_STRIP_RULES) == 12
