"""Legacy standalone filename indexer semantics (SURVEY.md §2 addendum
row IX1; reference ``zOld-Code/step2--FILE_CODE_NAME---All Files/
filename_indexer.py:1-431``).

The step-2 tool appends ``----CODE`` registry suffixes to arbitrary
files/folders. Adjudication vs the modern registry (VERDICT r2 "What's
missing #2"): C3 discovery + C4 allocation do NOT subsume it — five real
deltas, each replicated here and differentially tested against the actual
module (tests/test_indexer_differential.py):

  1. suffix recognition accepts 4 OR 5 letters (``----[A-VX-Z]{4,5}$``,
     filename_indexer.py:29) vs the modern exactly-5 discovery regex;
  2. an already-tagged name is SKIPPED, never re-registered — the modern
     flow PRESERVES discovered codes into the registry (C3);
  3. processing order is (deepest path first, then case-insensitive
     lexicographic) (filename_indexer.py:271), not plain alphabetical;
  4. a destination conflict ROLLS BACK the just-requested index
     (filename_indexer.py:327-332, 364-375) — no index is burned, unlike
     the modern registry where failed fresh allocations consume theirs;
  5. the tag check strips ALL dot-suffixes (``Path.suffixes``,
     filename_indexer.py:176-187), so ``v1.2----ABCDE.pdf`` is NOT
     recognized as tagged (base ``v1``) — quirk kept bug-for-bug.

Code math (index_to_code, filename_indexer.py:275-284) is byte-identical
to the modern C1 and shared from ``codes.py``.
"""

from __future__ import annotations

import re

from .codes import ALPHABET, index_to_code  # identical alphabet/base-25

SUFFIX_RE = re.compile(r"----[%s]{4,5}$" % ALPHABET)

ALLOWED_FILE_EXTS = {".pdf", ".doc", ".docx", ".md", ".txt"}
IMAGE_EXTENSIONS = {
    ".png", ".jpg", ".jpeg", ".gif", ".bmp", ".svg", ".tif", ".tiff",
    ".webp", ".heic", ".heif",
}
DOC_SKIP_NAMES = {"README", "LICENSE", "CHANGELOG", "CONTRIBUTING"}


def _suffixes(name: str) -> list[str]:
    """``pathlib.PurePath.suffixes`` semantics (leading dots excluded,
    trailing-dot names have none)."""
    if name.endswith("."):
        return []
    stripped = name.lstrip(".")
    return ["." + s for s in stripped.split(".")[1:]]


def split_name_and_suffix(name: str) -> tuple[str, str]:
    """filename_indexer.py:176-182 — base minus ALL suffixes."""
    suffix = "".join(_suffixes(name))
    base = name[: -len(suffix)] if suffix else name
    return base, suffix


def _last_suffix(name: str) -> str:
    sfx = _suffixes(name)
    return sfx[-1] if sfx else ""


def has_registry_suffix(name: str, is_dir: bool = False) -> bool:
    """filename_indexer.py:185-187."""
    target = name if is_dir else split_name_and_suffix(name)[0]
    return bool(SUFFIX_RE.search(target))


def should_skip_file(name: str) -> bool:
    """filename_indexer.py:190-206 (string-level; existence checked by the
    caller)."""
    if name.startswith("."):
        return True
    suffix = _last_suffix(name).lower()
    if suffix in IMAGE_EXTENSIONS:
        return True
    if suffix not in ALLOWED_FILE_EXTS:
        return True
    stem = name[: -len(_last_suffix(name))] if _last_suffix(name) else name
    if stem.upper() in DOC_SKIP_NAMES or name.upper() in DOC_SKIP_NAMES:
        return True
    if name.startswith("~$"):
        return True
    return False


def should_skip_directory(name: str) -> bool:
    """filename_indexer.py:209-215."""
    return name.startswith(".") or name.upper() in DOC_SKIP_NAMES


def indexer_sort_key(path: str):
    """filename_indexer.py:271 — deepest first, then case-insensitive."""
    depth = len([p for p in path.split("/") if p != ""]) + (
        1 if path.startswith("/") else 0
    )
    return (-depth, path.lower())


def rename_target(path: str, code: str, is_dir: bool) -> str:
    """filename_indexer.py:339-345."""
    parent, _, name = path.rpartition("/")
    if is_dir:
        new_name = f"{name}----{code}"
    else:
        base, suffix = split_name_and_suffix(name)
        new_name = f"{base}----{code}{suffix}"
    return f"{parent}/{new_name}" if parent or path.startswith("/") else new_name


def indexer_replay(
    entries: list[tuple[str, bool]],
    existing: set[str] | None = None,
    start_index: int = 0,
) -> list[dict]:
    """Sequential replay of gather-sort-allocate (filename_indexer.py:
    218-384) over (path, is_dir) entries assumed pre-filtered to the
    traversal's reach. Returns one record per entry with status in
    {renamed, already_tagged, skipped, conflict} and the final code/dest.

    Conflict rollback is faithful: a destination present in ``existing``
    skips the entry WITHOUT consuming the index (rollback_code only
    decrements when the rolled-back code was the last allocated — always
    true in this strictly sequential loop)."""
    existing = set(existing or ())
    skipped, tagged, candidates = [], [], []
    for path, is_dir in entries:
        name = path.rpartition("/")[2]
        if (should_skip_directory(name) if is_dir else should_skip_file(name)):
            skipped.append((path, is_dir))
            continue
        if has_registry_suffix(name, is_dir):
            tagged.append((path, is_dir))
            continue
        candidates.append((path, is_dir))
    candidates.sort(key=lambda e: indexer_sort_key(e[0]))

    out = [
        {"path": p, "is_dir": d, "status": "skipped", "code": None, "dest": None}
        for p, d in skipped
    ] + [
        {"path": p, "is_dir": d, "status": "already_tagged", "code": None, "dest": None}
        for p, d in tagged
    ]
    next_index = start_index
    for path, is_dir in candidates:
        code = index_to_code(next_index)
        dest = rename_target(path, code, is_dir)
        if dest in existing:
            out.append(
                {"path": path, "is_dir": is_dir, "status": "conflict",
                 "code": None, "dest": None}
            )
            continue  # rollback: index NOT consumed
        next_index += 1
        existing.add(dest)
        out.append(
            {"path": path, "is_dir": is_dir, "status": "renamed",
             "code": code, "dest": dest}
        )
    return out
