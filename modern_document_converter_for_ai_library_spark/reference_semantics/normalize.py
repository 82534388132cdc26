"""Text normalization chain — the exactness core (SURVEY.md §2.7, ⚖).

Order is fixed and matches the reference
(src/cleaners/text_normalizer.py:127-201):

    unicode fold -> hyphen repair -> whitespace normalize -> punctuation fixes

Every regex below is applied with Python ``re`` so the bytes coming out of the
Spark kernels equal the golden generator's bytes by construction.
"""

from __future__ import annotations

import re

# Compiled once per process (executors compile on first import — the Spark
# analogue of the reference's module-level pattern caching).
_HYPHEN_LOWER = re.compile(r"-\s*\n\s*([a-z])")
_HYPHEN_UPPER = re.compile(r"-\s*\n\s*([A-Z])")
_HYPHEN_SPACED = re.compile(r"-\s{2,}([a-z])")
_MULTI_SPACE = re.compile(r"[ \t]{2,}")
_MULTI_NEWLINE = re.compile(r"\n{3,}")
_DOT_CAP = re.compile(r"\.([A-Z])")
_COMMA_TIGHT = re.compile(r",([^ \n])")

# Archaic -> modern table (text_normalizer.py:220-250); applied IGNORECASE,
# default off.
_MODERNIZE = [
    (re.compile(p, re.IGNORECASE), r)
    for p, r in [
        (r"\bhonour\b", "honor"),
        (r"\bhonours\b", "honors"),
        (r"\bhonourable\b", "honorable"),
        (r"\bcolour\b", "color"),
        (r"\bcolours\b", "colors"),
        (r"\blabour\b", "labor"),
        (r"\blabours\b", "labor"),
        (r"\bcentre\b", "center"),
        (r"\bcentres\b", "centers"),
        (r"\btheatre\b", "theater"),
        (r"\bmetre\b", "meter"),
        (r"\bvpon\b", "upon"),
        (r"\bvnto\b", "unto"),
        (r"\bvnder\b", "under"),
        (r"\bpublick\b", "public"),
        (r"\bmagick\b", "magic"),
        (r"\bshew\b", "show"),
        (r"\bshewed\b", "showed"),
        (r"\bgaol\b", "jail"),
        (r"\bcompl(eat|ete)", "complete"),
    ]
]


# Resolve the optional dependency ONCE per process: a failed import inside
# the hot function would re-run the module finders on every call (~0.2 ms/doc
# measured). The reference pays that cost; the semantics are identical.
try:
    from cleantext import clean as _cleantext_clean  # optional, as in the reference
except ImportError:
    _cleantext_clean = None


def unicode_fold(text: str) -> str:
    """Unicode fix + ASCII fold (text_normalizer.py:153-183).

    The reference calls ``cleantext.clean(..., fix_unicode=True,
    to_ascii=True, lower=False)`` when the optional ``clean-text`` package is
    importable and otherwise falls back to a plain ASCII-ignore encode. We
    mirror that exactly — same call, same fallback — so behavior matches the
    reference in whichever environment both run.
    """
    if _cleantext_clean is None:
        return text.encode("ascii", "ignore").decode("ascii")
    return _cleantext_clean(
        text,
        fix_unicode=True,
        to_ascii=True,
        lower=False,
        no_line_breaks=False,
        no_urls=False,
        no_emails=False,
        no_phone_numbers=False,
        no_numbers=False,
        no_digits=False,
        no_currency_symbols=False,
        no_punct=False,
        replace_with_punct="",
        replace_with_url="",
        replace_with_email="",
        replace_with_phone_number="",
        replace_with_number="",
        replace_with_digit="",
        replace_with_currency_symbol="",
    )


def fix_hyphens(text: str) -> str:
    """Repair line-break hyphenation (text_normalizer.py:22-75).

    ``defend-\\nant`` -> ``defendant``; ``PLAIN-\\nTIFF`` -> ``PLAINTIFF``;
    ``word-  x`` (hyphen + 2+ spaces + lowercase) -> ``word x``;
    intentional hyphens (``well-known``) untouched.
    """
    text = _HYPHEN_LOWER.sub(r"\1", text)
    text = _HYPHEN_UPPER.sub(r"\1", text)
    return _HYPHEN_SPACED.sub(r" \1", text)


def normalize_whitespace(text: str) -> str:
    """Whitespace normalization (text_normalizer.py:78-124), exact order:

    tabs -> spaces; CRLF/CR -> LF; rstrip each line; collapse 2+ spaces/tabs;
    collapse 3+ newlines to 2; strip the whole text.
    """
    text = text.replace("\t", " ")
    text = text.replace("\r\n", "\n").replace("\r", "\n")
    text = "\n".join(ln.rstrip() for ln in text.split("\n"))
    text = _MULTI_SPACE.sub(" ", text)
    text = _MULTI_NEWLINE.sub("\n\n", text)
    return text.strip()


def normalize_text(text: str, modernize_spellings: bool = False) -> str:
    """Full normalization chain (text_normalizer.py:127-201)."""
    if not text:
        return ""
    text = unicode_fold(text)
    text = fix_hyphens(text)
    text = normalize_whitespace(text)
    text = _DOT_CAP.sub(r". \1", text)
    text = _COMMA_TIGHT.sub(r", \1", text)
    if modernize_spellings:
        for pat, rep in _MODERNIZE:
            text = pat.sub(rep, text)
    return text


_FNAME_STRIP = re.compile(r"[^\w\s\-\_\.]")
_WS_RUN = re.compile(r"\s+")


def normalize_filename_text(text: str) -> str:
    """Filename-safe normalization (text_normalizer.py:262-294)."""
    text = normalize_text(text)
    text = _FNAME_STRIP.sub("", text)
    text = _WS_RUN.sub(" ", text)
    return text.strip()
