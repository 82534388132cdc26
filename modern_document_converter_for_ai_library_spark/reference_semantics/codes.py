"""Base-25 unique-code math (SURVEY.md §2.8 C1–C3, C6).

Alphabet A–Z minus W (25 chars), 5-character codes, 25^5 = 9,765,625 keys —
src/services/code_generator.py:36-45. Pure functions of an integer/string, so
they compile equally well into Spark column expressions (functions/codes_cols)
and into these kernels.
"""

from __future__ import annotations

import re

ALPHABET = "ABCDEFGHIJKLMNOPQRSTUVXYZ"  # no W
CODE_LENGTH = 5
SEPARATOR = "----"
CAPACITY = len(ALPHABET) ** CODE_LENGTH  # 9,765,625

# ----CODE followed by '.' or end of string (code_generator.py:45)
_CODE_IN_NAME = re.compile(r"----([A-VX-Z]{5})(?:\.|$)")
_VALID = re.compile(r"^[A-VX-Z]{5}$")


def index_to_code(idx: int) -> str:
    """0 -> AAAAA, 1 -> AAAAB, 24 -> AAAAZ, 25 -> AAABA (code_generator.py:52-101)."""
    if idx < 0:
        raise ValueError(f"Index must be non-negative, got: {idx}")
    if idx >= CAPACITY:
        raise RuntimeError(f"Registry exhausted: index {idx} exceeds maximum {CAPACITY - 1}.")
    chars = []
    for _ in range(CODE_LENGTH):
        chars.append(ALPHABET[idx % 25])
        idx //= 25
    return "".join(reversed(chars))


def code_to_index(code: str) -> int:
    """Inverse of :func:`index_to_code` (code_generator.py:104-139)."""
    if not is_valid_code(code):
        raise ValueError(f"Invalid code format: {code!r}")
    idx = 0
    for ch in code:
        idx = idx * 25 + ALPHABET.index(ch)
    return idx


def is_valid_code(code: str) -> bool:
    """Exactly 5 uppercase letters, no W (code_generator.py:142-184)."""
    return bool(code) and bool(_VALID.match(code))


def discover_code(filename: str) -> str | None:
    """Extract a preserved legacy code from ``stem----CODE.ext`` names.

    Valid codes are kept; names carrying an invalid suffix (e.g. ``----WWWWW``)
    yield None and get a fresh allocation (code_generator.py:392-436,
    smoke_test_registry.py:19-25).
    """
    m = _CODE_IN_NAME.search(filename)
    return m.group(1) if m else None


# Failure messages reproduce the reference's registry constraint errors
# byte-for-byte (rename_step.py:228-243 wraps the sqlite exception text).
DUP_CLAIM_ERR = (
    "Document registration failed: UNIQUE constraint failed: "
    "documents.unique_code"
)
DUP_ALLOC_ERR = "sqlite3.IntegrityError: UNIQUE constraint failed: codes.code"


def registry_replay(
    entries: list[tuple[str, str | None]],
    start_index: int = 0,
) -> dict[str, tuple[int | None, str | None, str | None]]:
    """Replay the reference registry's code-allocation state machine.

    ``entries`` = (key, discovered_code_or_None) in PROCESSING ORDER for
    every doc that passed the STEP-3 metadata gate. Returns per key
    ``(code_index, unique_code, error)``.

    Mirrors sqlite semantics exactly (differentially tested against the
    actual Registrar/CodeGenerator in tests/test_codes_rename.py):

    - discovered code (scenario A, code_generator.py:392-436): inserted into
      ``codes`` only if absent (code_exists guard), then STEP 5's
      commit_code_to_document trips ``documents.unique_code UNIQUE`` for any
      claimant after the first holder -> clean per-file failure
      (rename_step.py:228-243); rollback_code is a no-op once committed;
    - fresh allocation (scenario B): increment_code_index commits BEFORE
      allocate_code's INSERT, so the index is consumed even when the INSERT
      raises IntegrityError on a previously-preserved code (the reference
      would crash the batch here — uncaught in orchestrator.py:143-175; we
      record the row failure instead, documented divergence).
    """
    codes_table: set[str] = set()
    docs_unique: set[str] = set()
    next_index = start_index
    out: dict[str, tuple[int | None, str | None, str | None]] = {}
    for key, disc in entries:
        if disc is not None:
            codes_table.add(disc)
            if disc in docs_unique:
                out[key] = (None, None, DUP_CLAIM_ERR)
            else:
                docs_unique.add(disc)
                out[key] = (None, disc, None)
        else:
            idx = next_index
            next_index += 1
            code = index_to_code(idx)
            if code in codes_table:
                out[key] = (idx, None, DUP_ALLOC_ERR)
            else:
                codes_table.add(code)
                docs_unique.add(code)
                out[key] = (idx, code, None)
    return out


def append_code(stem: str, code: str) -> str:
    return f"{stem}{SEPARATOR}{code}"


def strip_code(name: str) -> str:
    """Remove a trailing ``----CODE`` from a filename stem."""
    return re.sub(r"----[A-VX-Z]{5}$", "", name)
