"""YAML frontmatter generation (SURVEY.md §2.7 N12, ⚖).

The reference builds an insertion-ordered dict and ``yaml.dump``s it with
``default_flow_style=False, allow_unicode=True, sort_keys=False``, wrapped in
``---`` delimiters (src/steps/convert_step.py:316-381). In the convert flow it
is invoked with ``code=None, metadata={}`` so only ``type`` and
``source_file`` are emitted (convert_step.py:152-157) — goldens reflect that
actual behavior.
"""

from __future__ import annotations

import re
from typing import Optional

import yaml

# Plain-scalar fast path: strings yaml.dump emits verbatim (no quoting, no
# line folding — folding needs a space to break on, so space-free tokens are
# safe at any length; values here also can't collide with yaml specials like
# 'true'/'null'/numbers because they must contain a letter AND a separator-
# free shape typical of filenames). Anything outside this shape falls back to
# the real yaml.dump. Equivalence is property-tested against yaml.dump in
# tests/test_reference_semantics.py.
_PLAIN_SAFE = re.compile(r"^[A-Za-z][A-Za-z0-9._\-]*$")

# bare words the YAML 1.1 resolver would re-tag (forcing the emitter to
# quote them); a '.'/'-'/'_' or digit anywhere breaks the match, so typical
# filenames never hit this set
_YAML_SPECIAL = {
    "y", "yes", "n", "no", "true", "false", "on", "off", "null", "none", "nan",
}


def _plain_safe(s: str) -> bool:
    return bool(_PLAIN_SAFE.match(s)) and s.lower() not in _YAML_SPECIAL


def _fast_two_field(doc_type: str, source_file: str) -> Optional[str]:
    if _plain_safe(doc_type) and _plain_safe(source_file):
        return f"---\ntype: {doc_type}\nsource_file: {source_file}\n---"
    return None


def generate_frontmatter(
    doc_type: str,
    source_file: str,
    code: Optional[str] = None,
    metadata: Optional[dict] = None,
) -> str:
    metadata = metadata or {}

    if code is None and not metadata:
        fast = _fast_two_field(doc_type, source_file)
        if fast is not None:
            return fast

    data: dict = {"type": doc_type, "source_file": source_file}
    if code:
        data["code"] = code
    if doc_type == "caselaw":
        for key in ("case_name", "citation", "court", "date"):
            if key in metadata:
                data[key] = metadata[key]

    body = yaml.dump(
        data,
        default_flow_style=False,
        allow_unicode=True,
        sort_keys=False,
    )
    return f"---\n{body}---"
