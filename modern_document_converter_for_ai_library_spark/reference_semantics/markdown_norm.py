"""Markdown RAG normal form (SURVEY.md §2.7 N7).

Re-expression of the legacy conservative markdown cleaner
(zOld-Code/step3a…/doc_to_markdown/markdown_cleaner.py:21-284): line endings,
BOM/smart-quote folding, control/zero-width/soft-hyphen removal, ATX heading
normalization (space after ``#``, trailing hashes dropped, blank line
inserted before headings), blank-line capping, single trailing newline,
frontmatter spacing. The heading pass is order-sensitive (inserts lines), so
the whole chain lives in this kernel and is exposed to Spark through an
Arrow stage (operators/legacy_clean.markdown_normalize_documents).
"""

from __future__ import annotations

import re

_SMART_FOLD = [
    ("‘", "'"),
    ("’", "'"),
    ("“", '"'),
    ("”", '"'),
    ("–", "-"),
    ("—", "--"),
    ("…", "..."),
    ("\xa0", " "),
]

_CONTROL = re.compile(r"[\x00-\x08\x0b-\x0c\x0e-\x1f]")
_HEADING = re.compile(r"^(#{1,6})\s*(.*?)(?:\s*#+\s*)?$")
_FRONTMATTER = re.compile(r"^(---\n.*?\n---)\n+", re.DOTALL | re.MULTILINE)


def normalize_line_endings(text: str) -> str:
    return text.replace("\r\n", "\n").replace("\r", "\n")


def fold_unicode_punct(text: str) -> str:
    """BOM strip + smart quote/dash/ellipsis/nbsp folding (cleaner.py:44-80)."""
    if text.startswith("﻿"):
        text = text[1:]
    for src, dst in _SMART_FOLD:
        text = text.replace(src, dst)
    return text


def strip_control_chars(text: str) -> str:
    """Control chars (keep tab/newline), zero-widths, soft hyphens
    (cleaner.py:83-116)."""
    text = _CONTROL.sub("", text)
    for ch in ("​", "‌", "‍", "﻿", "\xad"):
        text = text.replace(ch, "")
    return text


def normalize_headings(text: str) -> str:
    """ATX normal form + blank line before headings (cleaner.py:119-166)."""
    out: list[str] = []
    for i, line in enumerate(text.split("\n")):
        m = _HEADING.match(line)
        if m:
            hashes, content = m.groups()
            if not content.strip():
                out.append(line)
                continue
            if i > 0 and out and out[-1].strip():
                out.append("")
            out.append(f"{hashes} {content.strip()}")
        else:
            out.append(line)
    return "\n".join(out)


def normalize_spacing(text: str) -> str:
    """rstrip lines, cap blank runs at 2, single trailing newline
    (cleaner.py:169-211)."""
    out: list[str] = []
    blanks = 0
    for line in (ln.rstrip() for ln in text.split("\n")):
        if not line:
            blanks += 1
            if blanks <= 2:
                out.append(line)
        else:
            blanks = 0
            out.append(line)
    return "\n".join(out).rstrip("\n") + "\n"


def clean_frontmatter_spacing(text: str) -> str:
    """Exactly one blank line after the closing --- (cleaner.py:214-239)."""
    return _FRONTMATTER.sub(r"\1\n\n", text)


def clean_markdown(text: str) -> str:
    """Full chain in the reference's order (cleaner.py:242-284)."""
    text = normalize_line_endings(text)
    text = fold_unicode_punct(text)
    text = strip_control_chars(text)
    text = normalize_headings(text)
    text = normalize_spacing(text)
    return clean_frontmatter_spacing(text)
