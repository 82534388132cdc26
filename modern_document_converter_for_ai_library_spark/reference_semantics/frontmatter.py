"""YAML frontmatter generation (SURVEY.md §2.7 N12, ⚖).

The reference builds an insertion-ordered dict and ``yaml.dump``s it with
``default_flow_style=False, allow_unicode=True, sort_keys=False``, wrapped in
``---`` delimiters (src/steps/convert_step.py:316-381). In the convert flow it
is invoked with ``code=None, metadata={}`` so only ``type`` and
``source_file`` are emitted (convert_step.py:152-157) — goldens reflect that
actual behavior.
"""

from __future__ import annotations

from typing import Optional

import yaml


def generate_frontmatter(
    doc_type: str,
    source_file: str,
    code: Optional[str] = None,
    metadata: Optional[dict] = None,
) -> str:
    metadata = metadata or {}

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
