"""Mojibake repair for the common UTF-8-decoded-as-cp1252 damage class.

Web corpora carry text that was UTF-8 encoded and then mis-decoded as
Windows-1252/Latin-1 somewhere in a crawl or CMS pipeline ("café" ->
"cafÃ©", an em dash -> "â€”"). The general repair (ftfy) re-encodes and
re-decodes bytes; Spark/DuckDB string functions cannot round-trip
arbitrary charsets portably, so this module takes the table-driven form
that covers the overwhelmingly common case: for a fixed set of frequent
non-ASCII characters, PRECOMPUTE the mojibake string each would become
under the UTF-8->cp1252 mis-decode (cp1252's five undefined bytes fall
back to Latin-1, matching what lenient decoders do), and repair by
literal replacement. The table is built at import from the real codec
round-trip — no hand-typed mojibake — and is the single source of truth
for BOTH the Spark column chain and the DuckDB oracle chain.

One pass repairs ONE layer of mis-decoding (measured: doubly-damaged
"Ã‚Â©" needs two passes, and doubly-damaged "ÃƒÂ©" is not resolvable by
this table at all — its outer layer exposes "Ãƒ", whose repair target Ã
is not a covered character; multi-layer damage needs the general
byte-level re-decode this module deliberately does not attempt). ASCII
text is untouched by construction (every mojibake key contains a byte
>= 0x80's image, which no ASCII text contains).

Known ambiguity, decided the way ftfy decides it: a mojibake key IS
valid text — clean text that legitimately contains "Â©" (CAPITAL A
CIRCUMFLEX + COPYRIGHT) is indistinguishable from the mis-decode of
"©" and gets "repaired" to "©". Real-world base rates overwhelmingly
favor the mis-decode reading (a bare Â before a symbol is almost
always the C2 lead byte's image), so the table maps every occurrence;
corpora where such sequences are intentional should not run this fix.
Pinned by test (test_mojibake.py::test_ambiguous_clean_digraph_policy).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# frequent Latin-script letters, punctuation, and symbols seen in web text
_TARGETS = (
    "éèêëàáâäçíîïñóôöúûüùßÉÈÀÂÇÖÜ"
    "€£¥°©®™§µ"
    "–—…•·«»‘’“”„"
    " "  # NBSP
)

# cp1252's undefined bytes (0x81 0x8D 0x8F 0x90 0x9D): lenient decoders
# pass them through as their Latin-1 code points
_CP1252_UNDEFINED = {0x81, 0x8D, 0x8F, 0x90, 0x9D}


def _mojibake_of(c: str) -> str:
    out = []
    for byte in c.encode("utf-8"):
        if byte in _CP1252_UNDEFINED:
            out.append(chr(byte))
        else:
            out.append(bytes([byte]).decode("cp1252"))
    return "".join(out)


def mojibake_pairs() -> list[tuple[str, str]]:
    """(mojibake, repaired) pairs, longest mojibake first so a 3-byte
    character's image is never half-consumed by a 2-byte rule (ties
    ordered lexicographically for determinism)."""
    pairs = [(_mojibake_of(c), c) for c in _TARGETS]
    pairs.sort(key=lambda p: (-len(p[0]), p[0]))
    return pairs


def fix_mojibake_col(col) -> Column:
    """Column expression repairing one layer of UTF-8->cp1252 mojibake
    via the table — a chain of literal replaces, pure codegen, map-only."""
    if isinstance(col, str):
        col = F.col(col)
    for moji, fixed in mojibake_pairs():
        col = F.replace(col, F.lit(moji), F.lit(fixed))
    return col
