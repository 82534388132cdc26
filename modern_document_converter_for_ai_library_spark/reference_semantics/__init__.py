"""Pure-Python kernels reproducing the reference converter's semantics.

These functions are the single source of truth for BOTH the golden-fixture
generator and the pandas/Arrow UDF bodies that run inside Spark executors —
span-sequence equality between the distributed job and the goldens holds by
construction (SURVEY.md §5, §7).

No Spark imports here. Everything is deterministic and side-effect free.
"""

from .rules import (
    CASELAW_CLEANING_RULES,
    CLASSIFICATION_RULESETS,
    cleaning_rules_for,
)
from .normalize import fix_hyphens, normalize_whitespace, normalize_text
from .classify import classify_text
from .cleanrules import apply_cleaning_rules
from .metadata import extract_caselaw_metadata
from .filename import format_filename
from .codes import (
    ALPHABET,
    CODE_LENGTH,
    index_to_code,
    code_to_index,
    is_valid_code,
    discover_code,
)
from .frontmatter import generate_frontmatter
from .convert import convert_spans_doc, rename_doc

__all__ = [
    "CASELAW_CLEANING_RULES",
    "CLASSIFICATION_RULESETS",
    "cleaning_rules_for",
    "fix_hyphens",
    "normalize_whitespace",
    "normalize_text",
    "classify_text",
    "apply_cleaning_rules",
    "extract_caselaw_metadata",
    "format_filename",
    "ALPHABET",
    "CODE_LENGTH",
    "index_to_code",
    "code_to_index",
    "is_valid_code",
    "discover_code",
    "generate_frontmatter",
    "convert_spans_doc",
    "rename_doc",
]
