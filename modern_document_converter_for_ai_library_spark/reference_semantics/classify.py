"""Document-type classification kernel (SURVEY.md §2.4 A1–A3, ⚖).

Scoring: per type, sum the weights of every pattern that ``re.search``-matches
the text (src/services/classifier.py:161-193). Arg-max with a strictly-greater
tie-break in rule-set order (classifier.py:282-291); thresholds map the score
to a confidence level, below ``low`` the type collapses to ``unknown``
(classifier.py:196-225, 294-311). Confidence float = min(score/100, 1.0).
"""

from __future__ import annotations

import re
from typing import NamedTuple

from .rules import CLASSIFICATION_RULESETS, CONFIDENCE_THRESHOLDS


class ClassifyResult(NamedTuple):
    document_type: str
    confidence: float
    indicators: tuple[str, ...]
    score: float
    confidence_level: str | None  # HIGH / MEDIUM / LOW / None


# --------------------------------------------------------------------------
# Literal prescan (performance only — semantics untouched).
#
# Each scoring regex has a set of substrings of which AT LEAST ONE must occur
# for the regex to possibly match (a necessary condition derived from its
# alternation structure). When none occurs, re.search is provably False and
# is skipped; when one occurs, re.search still decides. ``pure=True`` marks
# patterns that are plain literal alternations with no anchors/boundaries —
# there, presence of a literal IS a match and re.search is skipped entirely.
# Keyed by regex source string; patterns without an entry always run the
# regex. Equivalence against the naive full-scan path is asserted in
# tests/test_reference_semantics.py::test_prefilter_equivalence.
# --------------------------------------------------------------------------

_PRESCAN: dict[str, tuple[tuple[str, ...], bool]] = {
    # caselaw (rules.CASELAW_PATTERNS order)
    r"\b\w+\s+v\.\s+\w+|\b\w+\s+versus\s+\w+": (("v.", "versus"), False),
    # reporter citation starts with \d+ -> a digit is a necessary condition
    r"\d+\s+[A-Z][a-z]+\.?\s+(?:App\.\s+)?(?:2d|3d)?\s*\d+": (
        tuple("0123456789"),
        False,
    ),
    (
        r"Court of Appeals|Supreme Court|District Court|Circuit Court"
        r"|Superior Court|Appellate Court"
    ): (
        (
            "court of appeals", "supreme court", "district court",
            "circuit court", "superior court", "appellate court",
        ),
        True,
    ),
    r"\b(?:LEXIS|Westlaw|WL\s+\d+|West\s+Law)\b": (("lexis", "westlaw", "wl", "west"), False),
    r"\b(?:Plaintiff|Defendant|Appellant|Appellee|Petitioner|Respondent)\b": (
        ("plaintiff", "defendant", "appellant", "appellee", "petitioner", "respondent"),
        False,
    ),
    r"(?:Decided|Filed|Argued).*\d{4}": (("decided", "filed", "argued"), False),
    r"\b(?:Opinion|Judgment|ORDER|MOTION|Memorandum|Per Curiam)\b": (
        # case-sensitive pattern -> exact-case literals, checked on raw text
        ("Opinion", "Judgment", "ORDER", "MOTION", "Memorandum", "Per Curiam"),
        False,
    ),
    r"\b(?:affirm|reverse|remand|vacate|dismiss)(?:ed|ing)?\b": (
        ("affirm", "reverse", "remand", "vacate", "dismiss"),
        False,
    ),
    r"Case\s+No\.|Docket\s+No\.|Civil\s+Action\s+No\.": (("case", "docket", "civil"), False),
    r"\bJ\.,\s+(?:concurring|dissenting|delivering the opinion)": (("j.,",), False),
    r"This case comes before (the court|us)": (("this case comes before",), False),
    r"\b(?:Section|§)\s+\d+|\bU\.S\.C\.|United States Code": (("section", "§", "u.s"), False),
    # statute (rules.STATUTE_PATTERNS order; shared strings reuse entries)
    r"Official Code of": (("official code of",), True),
    "§": (("§",), True),  # a bare literal is its own (pure) prescan
    # the spaced-acronym patterns all require a literal '.'
    r"O\.\s*C\.\s*G\.\s*A\.": ((".",), False),
    r"U\.\s*S\.\s*C\.": ((".",), False),
    r"C\.\s*F\.\s*R\.": ((".",), False),
    r"TITLE\s+\d+": (("title",), False),
    r"Chapter\s+\d+": (("chapter",), False),
    r"\bCode of\b": (("code of",), False),
    r"(?:Section|Sec\.)\s+\d+": (("sec",), False),
    "§" + r"\s*\d+": (("§",), False),
    r"\b(?:enacted|codified|amended)\b": (("enacted", "codified", "amended"), False),
    r"Public Law|Pub\.\s*L\.": (("public law", "pub"), False),
    r"\b(?:subsection|subdivision|paragraph)\s*\([a-z0-9]+\)": (
        ("subsection", "subdivision", "paragraph"),
        False,
    ),
    r"Court of Appeals|Supreme Court|District Court|Circuit Court": (
        ("court of appeals", "supreme court", "district court", "circuit court"),
        True,
    ),
    r"\b(?:Plaintiff|Defendant|Appellant|Appellee|Petitioner)\b": (
        ("plaintiff", "defendant", "appellant", "appellee", "petitioner"),
        False,
    ),
    r"\b(?:Opinion|affirm|reverse|remand)\b": (("opinion", "affirm", "reverse", "remand"), False),
}

def _lowered_equiv(pat: str) -> re.Pattern | None:
    r"""Case-SENSITIVE compile of the lowercased pattern, usable in place of
    an IGNORECASE search when the subject text is ASCII and already lowered
    (plain search is 2-3x faster than IGNORECASE in CPython's re).

    Only safe when lowercasing the pattern source cannot change its meaning:

    - reject patterns containing any backslash-uppercase escape (``\\W \\S
      \\B \\D`` … would silently become their complements);
    - reject character-class ranges unless both endpoints are same-case
      letters or neither is uppercase: ``[A-z]``.lower() -> ``[a-z]``
      silently drops ``[\\]^_\```, ``[?-Z]`` -> ``[?-z]`` widens. The scan is
      conservative (any ``x-y`` trigram in a pattern containing ``[``) —
      a false reject only costs the fast path, never correctness.

    ASCII literal chars and ``[A-Z]``-style ranges lowercase correctly for
    this purpose.
    """
    if re.search(r"\\[A-Z]", pat):
        return None
    if "[" in pat:
        for m in re.finditer(r"(.)-(.)", pat):
            a, b = m.group(1), m.group(2)
            if a.isupper() and b.isupper():
                continue  # [A-Z] -> [a-z]: the intended equivalence
            if a.isupper() or b.isupper():
                return None  # mixed-case or punct-to-upper range
    try:
        return re.compile(pat.lower())
    except re.error:
        return None


# Pre-compile every scoring pattern once per process; attach its prescan and
# (for IGNORECASE patterns) the lowered fast-path equivalent.
_COMPILED: list[
    tuple[
        str,
        list[
            tuple[
                re.Pattern,
                float,
                str,
                tuple[str, ...] | None,
                bool,
                bool,
                re.Pattern | None,
            ]
        ],
    ]
] = [
    (
        name,
        [
            (
                re.compile(pat, 0 if cs else re.IGNORECASE),
                weight,
                desc,
                _PRESCAN.get(pat, (None, False))[0],
                _PRESCAN.get(pat, (None, False))[1],
                cs,
                None if cs else _lowered_equiv(pat),
            )
            for (pat, weight, cs), desc in zip(patterns, descriptions)
        ],
    )
    for name, patterns, descriptions in CLASSIFICATION_RULESETS
]


def score_type(
    text: str,
    type_name: str,
    use_prescan: bool = True,
    _lower: str | None = None,
) -> tuple[float, list[str]]:
    """Score one document type; returns (score, matched indicator texts).

    ``_lower`` lets callers scoring several types share one lowercase pass.
    """
    lower = (_lower if _lower is not None else text.lower()) if use_prescan else ""
    # the lowered fast path requires lower to be a faithful char-for-char
    # image of text (ASCII guarantees it; e.g. 'İ'.lower() changes length)
    ascii_fast = use_prescan and text.isascii()
    for name, compiled in _COMPILED:
        if name != type_name:
            continue
        score = 0.0
        hits: list[str] = []
        for rx, weight, desc, literals, pure, cs, rx_low in compiled:
            if use_prescan and literals is not None:
                haystack = text if cs else lower
                present = any(lit in haystack for lit in literals)
                if not present:
                    continue
                if pure:
                    matched = True
                elif ascii_fast and rx_low is not None:
                    matched = bool(rx_low.search(lower))
                else:
                    matched = bool(rx.search(text))
            else:
                matched = bool(rx.search(text))
            if matched:
                score += weight
                hits.append(desc)
        return score, hits
    raise KeyError(type_name)


def classify_text(text: str) -> ClassifyResult:
    """Classify raw (pre-normalization) document text.

    Mirrors ``classify()`` at classifier.py:232-339 with
    ``min_confidence=None``.
    """
    if not text or not text.strip():
        return ClassifyResult("unknown", 0.0, ("No text to classify",), 0.0, None)

    best_name: str | None = None
    best_score = 0.0
    best_hits: list[str] = []
    lower = text.lower()
    for name, _ in _COMPILED:
        score, hits = score_type(text, name, _lower=lower)
        if score > best_score:  # strictly greater: earlier rule set wins ties
            best_name, best_score, best_hits = name, score, hits

    if best_name is None or best_score == 0:
        return ClassifyResult("unknown", 0.0, ("No patterns matched",), 0.0, None)

    conf = min(best_score / 100.0, 1.0)
    if best_score >= CONFIDENCE_THRESHOLDS["high"]:
        level = "HIGH"
    elif best_score >= CONFIDENCE_THRESHOLDS["medium"]:
        level = "MEDIUM"
    elif best_score >= CONFIDENCE_THRESHOLDS["low"]:
        level = "LOW"
    else:
        # Below the low threshold the type collapses to unknown but the
        # normalized confidence is still reported (classifier.py:306-311).
        return ClassifyResult(
            "unknown",
            conf,
            tuple(best_hits) + (f"Score {best_score} below minimum threshold",),
            best_score,
            None,
        )

    return ClassifyResult(best_name, conf, tuple(best_hits), best_score, level)
