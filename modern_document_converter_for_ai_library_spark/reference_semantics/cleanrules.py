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


@lru_cache(maxsize=16)
def _compiled_noise(patterns: tuple[str, ...]) -> tuple[re.Pattern, ...]:
    return tuple(re.compile(p) for p in patterns)


@lru_cache(maxsize=16)
def _compiled_headings(
    patterns: tuple[tuple[str, str], ...]
) -> tuple[tuple[re.Pattern, str], ...]:
    return tuple((re.compile(p), prefix) for p, prefix in patterns)


def apply_cleaning_rules(text: str, rules: dict) -> tuple[str, dict]:
    """Apply noise deletion then heading markup; returns (text, stats)."""
    noise = _compiled_noise(tuple(rules.get("noise_patterns", ())))
    headings = _compiled_headings(tuple(map(tuple, rules.get("heading_patterns", ()))))

    stats = {"lines_removed": 0, "headings_added": 0}

    kept: list[str] = []
    for line in text.split("\n"):
        for rx in noise:
            if rx.match(line):
                stats["lines_removed"] += 1
                break
        else:
            kept.append(line)

    out: list[str] = []
    for line in kept:
        for rx, prefix in headings:
            if rx.match(line):
                out.append(f"{prefix}{line}")
                stats["headings_added"] += 1
                break
        else:
            out.append(line)

    return "\n".join(out), stats
