"""End-to-end per-document kernels: convert and rename flows.

These are the bodies of the two Spark Arrow kernels AND the golden-fixture
generator (SURVEY.md §5, §7 — same code on both sides, so the span-equality
gate holds by construction).

Span model
----------
A document is ``(doc_id, spans)`` with ``spans`` an ordered list of
``{kind, text, media_ref, offset}``. Text spans carry one line/paragraph each;
media spans (``kind != 'text'``) carry ``media_ref`` and empty text and are
NEVER text-processed — they keep their sequence position (the north rule's
interleaving invariant).

Convert flow (mirrors src/steps/convert_step.py:93-200):
  1. full_text = text spans joined with '\\n' (document reassembly)
  2. classify on the RAW reassembled text (convert_step.py:134-135)
  3. per text-block (maximal run of consecutive text spans — media spans are
     hard boundaries): normalize_text -> apply_cleaning_rules
  4. frontmatter (type + source_file only; convert_step.py:152-157) becomes a
     new text span at position 0
  5. offsets recomputed densely; empty cleaned blocks are dropped

For a document with no media spans this reduces exactly to the reference's
single-string pipeline: frontmatter + "\\n\\n" + cleaned_text, same statistics
(lines_removed, headings_added, character_count).
"""

from __future__ import annotations

from typing import Any, Optional

from .classify import classify_text
from .cleanrules import apply_cleaning_rules
from .codes import discover_code, registry_replay
from .filename import format_filename
from .frontmatter import generate_frontmatter
from .metadata import extract_caselaw_metadata
from .normalize import normalize_text
from .rules import cleaning_rules_for

Span = dict  # {kind, text, media_ref, offset}


def _mk_span(kind: str, text: str, media_ref: str, offset: int) -> Span:
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}


def reassemble_text(spans: list[Span]) -> str:
    """Document text = '\\n'-join of text-span texts in offset order."""
    return "\n".join(s["text"] or "" for s in spans if s["kind"] == "text")


def _segments(spans: list[Span]) -> list[tuple[str, Any]]:
    """Split the span sequence into ('text', [texts]) blocks and
    ('media', span) passthroughs, preserving order."""
    segs: list[tuple[str, Any]] = []
    block: list[str] = []
    for s in sorted(spans, key=lambda x: x["offset"]):
        if s["kind"] == "text":
            block.append(s["text"] or "")
        else:
            if block:
                segs.append(("text", block))
                block = []
            segs.append(("media", s))
    if block:
        segs.append(("text", block))
    return segs


def convert_spans_doc(
    doc_id: str,
    spans: list[Span],
    source_file: Optional[str] = None,
) -> dict:
    """Convert one interleaved document; returns the golden output row.

    Output keys: doc_id, spans (cleaned, reindexed), document_type,
    confidence, lines_removed, headings_added, character_count, success,
    error_message.
    """
    try:
        source_file = source_file or f"{doc_id}.pdf"
        full_text = reassemble_text(spans)

        if not full_text or not full_text.strip():
            # Mirrors the extractor's empty-text guard
            # (src/services/text_extractor.py:443-450): failure result,
            # nothing written.
            return {
                "doc_id": doc_id,
                "spans": [],
                "document_type": "unknown",
                "confidence": 0.0,
                "lines_removed": 0,
                "headings_added": 0,
                "character_count": 0,
                "success": False,
                "error_message": f"No text extracted from {source_file}. "
                "This might be an image-based PDF (OCR required) or empty document.",
            }

        cls = classify_text(full_text)
        rules = cleaning_rules_for(cls.document_type)

        out_spans: list[Span] = []
        cleaned_blocks: list[str] = []
        lines_removed = 0
        headings_added = 0

        for seg_kind, payload in _segments(spans):
            if seg_kind == "media":
                out_spans.append(
                    _mk_span(
                        payload["kind"],
                        payload["text"] or "",
                        payload["media_ref"] or "",
                        -1,
                    )
                )
                continue
            block_text = "\n".join(payload)
            normalized = normalize_text(block_text)
            cleaned, stats = apply_cleaning_rules(normalized, rules)
            lines_removed += stats["lines_removed"]
            headings_added += stats["headings_added"]
            if cleaned:
                cleaned_blocks.append(cleaned)
                out_spans.append(_mk_span("text", cleaned, "", -1))

        frontmatter = generate_frontmatter(cls.document_type, source_file)
        out_spans.insert(0, _mk_span("text", frontmatter, "", -1))

        final_text = f"{frontmatter}\n\n" + "\n".join(cleaned_blocks)
        for i, s in enumerate(out_spans):
            s["offset"] = i

        return {
            "doc_id": doc_id,
            "spans": out_spans,
            "document_type": cls.document_type,
            "confidence": cls.confidence,
            "lines_removed": lines_removed,
            "headings_added": headings_added,
            "character_count": len(final_text),
            "success": True,
            "error_message": None,
        }
    except Exception as exc:  # result-typed error channel, never raises
        return {
            "doc_id": doc_id,
            "spans": [],
            "document_type": "unknown",
            "confidence": 0.0,
            "lines_removed": 0,
            "headings_added": 0,
            "character_count": 0,
            "success": False,
            "error_message": f"{type(exc).__name__}: {exc}",
        }


def rename_doc(
    doc_id: str,
    spans: list[Span],
    source_file: str,
) -> dict:
    """Rename-flow kernel: classify -> extract metadata -> discover code ->
    format filename (src/steps/rename_step.py:123-332).

    The global sequential code allocation (C4) is NOT done here — it is a
    cross-document operation handled by operators/codes.py. This kernel
    reports ``discovered_code`` (preserved legacy code, or None) and the
    formatted filename templated with the placeholder ``{code}`` so the
    allocator can substitute without re-running regexes.

    Step ordering mirrors the reference exactly (rename_step.py:123-332):
    STEP 3 metadata check comes BEFORE code allocation, so only docs with
    ``metadata_ok`` (caselaw with >=1 extracted field,
    rename_step.py:183-196 + rename_step.py:339-355 — non-caselaw types
    return None metadata) ever consume a code index or claim a discovered
    code; STEP 6 filename formatting comes AFTER, so a formatting failure
    still burns/keeps its code (the reference never rolls back a committed
    code, registrar.py:333-349).
    """
    full_text = reassemble_text(spans)
    cls = classify_text(full_text)

    fields: dict[str, str] = {}
    new_filename_tpl: Optional[str] = None
    if cls.document_type == "caselaw":
        fields = extract_caselaw_metadata(full_text)

    metadata_ok = len(fields) > 0
    if metadata_ok:
        ext = "." + source_file.rsplit(".", 1)[1] if "." in source_file else ""
        # Format with a sentinel code, then re-expose the placeholder. The
        # sentinel is alphabet-valid so sanitization cannot disturb it.
        sentinel = "AAAAA"
        formatted = format_filename(fields, sentinel, ext)
        if formatted is not None:
            new_filename_tpl = formatted.replace(f"----{sentinel}", "----{code}")

    if not metadata_ok:
        error_message: Optional[str] = (
            "Metadata extraction failed - no fields extracted"
        )
    elif new_filename_tpl is None:
        error_message = "Filename formatting failed - required fields missing"
    else:
        error_message = None

    return {
        "doc_id": doc_id,
        "document_type": cls.document_type,
        "confidence": cls.confidence,
        "case_name": fields.get("case_name"),
        "year": fields.get("year"),
        "court": fields.get("court"),
        "citation": fields.get("citation"),
        # STEP 4 eligibility: codes are discovered/allocated only past the
        # metadata gate (rename_step.py:202-204)
        "discovered_code": discover_code(source_file) if metadata_ok else None,
        "metadata_ok": metadata_ok,
        "filename_template": new_filename_tpl,
        "rename_success": new_filename_tpl is not None,
        "error_message": error_message,
    }


def rename_corpus_sequential(
    docs: list[tuple[str, list[Span], str]],
    start_index: int = 0,
) -> list[dict]:
    """Sequential (single-process) emulation of the reference's batch rename
    loop — the golden generator for the distributed ``rename_documents``.

    Replays the registry state machine exactly (orchestrator.py:143-175 +
    rename_step.py:123-332 + registrar.py schema):

    - processing order = lexicographic ``doc_id`` (the reference sorts file
      paths alphabetically, orchestrator.py:96);
    - ``codes.code`` is PRIMARY KEY: a fresh sequential allocation whose
      base-25 code was already inserted raises IntegrityError inside
      allocate_code (registrar.py:266-283) — the reference would crash the
      batch (no try/except in the orchestrator loop); we record a per-row
      failure instead (documented divergence, same winner);
    - ``documents.unique_code`` is UNIQUE: a second claimant of the same
      discovered code fails at commit_code_to_document (registrar.py:49-112,
      298-331), caught by rename_step's STEP-5 handler -> clean failure with
      ``unique_code=None``; rollback_code is a no-op for committed codes;
    - the code index increments even for failed fresh allocations
      (increment_code_index commits its own transaction before
      allocate_code raises, code_generator.py:364-390).
    """
    rows = []
    for doc_id, spans, source_file in sorted(docs, key=lambda d: d[0]):
        row = rename_doc(doc_id, spans, source_file)
        row["source_file"] = source_file
        row["code_index"] = None
        row["unique_code"] = None
        row["new_filename"] = None
        rows.append(row)

    outcomes = registry_replay(
        [
            (row["doc_id"], row["discovered_code"])
            for row in rows
            if row["metadata_ok"]
        ],
        start_index=start_index,
    )
    for row in rows:
        if not row["metadata_ok"]:
            continue
        idx, code, err = outcomes[row["doc_id"]]
        row["code_index"] = idx
        row["unique_code"] = code
        if err is not None:
            row["rename_success"] = False
            row["error_message"] = err
        elif row["filename_template"] is not None:
            row["new_filename"] = row["filename_template"].replace("{code}", code)
    return rows
