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


def append_code(stem: str, code: str) -> str:
    return f"{stem}{SEPARATOR}{code}"


def strip_code(name: str) -> str:
    """Remove a trailing ``----CODE`` from a filename stem."""
    return re.sub(r"----[A-VX-Z]{5}$", "", name)
