"""Line-oriented cleaning-rule engine (SURVEY.md §2.2 F1–F2, ⚖).

Two passes over the document's lines, in the reference's fixed apply order
(src/steps/convert_step.py:242-309; caselaw.yaml:435-437):

  1. noise pass  — drop any line that ``re.match``-es a noise pattern
                   (first match wins, counts ``lines_removed``)
  2. heading pass — prepend the markdown prefix of the first heading pattern
                   that ``re.match``-es (counts ``headings_added``)

``re.match`` anchors at line start only; the rule regexes carry their own
``^…$`` anchors, preserved verbatim in rules.py.
"""

from __future__ import annotations

import re
from functools import lru_cache


def _combinable(patterns: tuple[str, ...]) -> bool:
    """True when every pattern is safe to merge into one alternation:
    no inline-flag/group-modifier constructs (``(?i)`` mid-pattern is an
    error in Python 3.11+, and flags must not leak between alternatives).
    Plain non-capturing groups are fine."""
    return all(
        "(?" not in p.replace("(?:", "") and not re.search(r"\\[0-9]", p)
        for p in patterns
    )


@lru_cache(maxsize=16)
def _compiled_noise(
    patterns: tuple[str, ...],
) -> tuple[tuple[re.Pattern, ...], re.Pattern | None]:
    """(per-pattern regexes, combined-alternation regex or None).

    Noise semantics are ANY-match → drop (the per-pattern order only decides
    *which* pattern matched, and the action is identical for all), so one
    combined ``(?:p1)|(?:p2)|…`` match call replaces k calls per line.
    Combined form used only when provably safe (see _combinable).
    """
    per = tuple(re.compile(p) for p in patterns)
    combined = (
        re.compile("|".join(f"(?:{p})" for p in patterns))
        if patterns and _combinable(patterns)
        else None
    )
    return per, combined


@lru_cache(maxsize=16)
def _compiled_headings(
    patterns: tuple[tuple[str, str], ...]
) -> tuple[tuple[tuple[re.Pattern, str], ...], re.Pattern | None]:
    """(ordered (regex, prefix) pairs, combined prescan regex or None).

    Heading prefixes differ per pattern (first match wins), so the ordered
    loop stays authoritative; the combined regex is only a prescan — when it
    does not match, no individual pattern can (union semantics), and most
    lines are not headings.
    """
    per = tuple((re.compile(p), prefix) for p, prefix in patterns)
    pats = tuple(p for p, _ in patterns)
    combined = (
        re.compile("|".join(f"(?:{p})" for p in pats))
        if pats and _combinable(pats)
        else None
    )
    return per, combined


def apply_cleaning_rules(text: str, rules: dict) -> tuple[str, dict]:
    """Apply noise deletion then heading markup; returns (text, stats)."""
    noise, noise_any = _compiled_noise(tuple(rules.get("noise_patterns", ())))
    headings, head_any = _compiled_headings(
        tuple(map(tuple, rules.get("heading_patterns", ())))
    )

    lines_removed = 0
    headings_added = 0

    out: list[str] = []
    for line in text.split("\n"):
        if noise_any is not None:
            if noise_any.match(line):
                lines_removed += 1
                continue
        else:
            dropped = False
            for rx in noise:
                if rx.match(line):
                    lines_removed += 1
                    dropped = True
                    break
            if dropped:
                continue
        if head_any is None or head_any.match(line):
            for rx, prefix in headings:
                if rx.match(line):
                    out.append(f"{prefix}{line}")
                    headings_added += 1
                    break
            else:
                out.append(line)
        else:
            out.append(line)

    return "\n".join(out), {
        "lines_removed": lines_removed,
        "headings_added": headings_added,
    }
