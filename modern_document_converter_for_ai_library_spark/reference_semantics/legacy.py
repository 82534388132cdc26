"""Legacy OCR-text cleaning kernels (SURVEY.md §2.2 F3–F5, §2.5 W1–W2).

Re-expression of the reference's older regex-only cleaner
(zOld-Code/step3a…/clean_txt.py) covering the operators the new src/ tree has
not re-absorbed: running-header removal by within-document frequency,
bare page-number / roman-numeral deletion, context-aware heading marking
(lag/lead blank-line test), and the stateful paragraph merge with
de-hyphenation. These run per document inside the Arrow kernel — the whole
document must be visible in order (SURVEY.md §7 hard part 4).
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

_PAGE_MARKER = re.compile(r"^---\[.*PDF Page.*\]---$")
_OCR_FAILED = re.compile(r"^\[OCR FAILED:")
_HEADER_CANDIDATE = re.compile(r"^[A-Z0-9 ,.'-]{4,60}$")
_BARE_PAGE_NO = re.compile(r"^\d{1,4}$")
_BARE_ROMAN = re.compile(r"^[ivxlcdmIVXLCDM]{1,6}$")
_ALL_CAPS = re.compile(r"^[A-Z0-9 ,.'-]+$")
_NUMBERED = re.compile(r"^(?:[IVXLCDM]+\.\s+.+|\d+\.\s+.+)$")

# Deterministic typographic / unicode fold table (clean_txt.py:25-50).
TYPO_TABLE: list[tuple[str, str]] = [
    (r"ſ", "s"), (r"ﬁ", "fi"), (r"ﬂ", "fl"), (r"æ", "ae"), (r"Æ", "Ae"),
    (r"[“”]", '"'), (r"[‘’]", "'"), (r"—", " — "), (r"–", "-"), (r"•", ", "),
    (r"[àáâäå]", "a"), (r"[ÀÁÂÄÅ]", "A"), (r"[èéêë]", "e"), (r"[ÈÉÊË]", "E"),
    (r"[ìíîï]", "i"), (r"[ÌÍÎÏ]", "I"), (r"[òóôö]", "o"), (r"[ÒÓÔÖ]", "O"),
    (r"[ùúûü]", "u"), (r"[ÙÚÛÜ]", "U"), (r"ç", "c"), (r"Ç", "C"),
    (r"ñ", "n"), (r"Ñ", "N"),
]

# OCR misread corrections (clean_txt.py:52-60), applied IGNORECASE.
OCR_TABLE: list[tuple[str, str]] = [
    (r"\btbe\b", "the"), (r"\btbis\b", "this"), (r"\btbat\b", "that"),
    (r"\bfub\b", "sub"), (r"\binft\b", "inst"), (r"\bmodem\b", "modern"),
    (r"\bcomer\b", "corner"),
]

# Archaic-spelling modernization, the long table (clean_txt.py:62-171),
# applied IGNORECASE in list order.
SPELLING_TABLE: list[tuple[str, str]] = [
    (r"\bpublick\b", "public"), (r"\bCatholick\b", "Catholic"),
    (r"\bcatholick\b", "catholic"), (r"\bpolitick\b", "politic"),
    (r"\bpoliticks\b", "politics"), (r"\bpractick\b", "practic"),
    (r"\bpracticks\b", "practics"), (r"\bmusick\b", "music"),
    (r"\bmusicalk?\b", "musical"), (r"\bphysick\b", "physic"),
    (r"\bphysicks\b", "physics"), (r"\bauthentick\b", "authentic"),
    (r"\bauthentically\b", "authentically"), (r"\bhonour\b", "honor"),
    (r"\bhonours\b", "honors"), (r"\bhonourable\b", "honorable"),
    (r"\bcolour\b", "color"), (r"\bcolours\b", "colors"),
    (r"\bneighbour\b", "neighbor"), (r"\bneighbours\b", "neighbors"),
    (r"\blabour\b", "labor"), (r"\blabours\b", "labors"),
    (r"\bfavour\b", "favor"), (r"\bfavours\b", "favors"),
    (r"\bsaviour\b", "savior"), (r"\bbehaviour\b", "behavior"),
    (r"\bendeavour\b", "endeavor"), (r"\bvapour\b", "vapor"),
    (r"\bcentre\b", "center"), (r"\bcentres\b", "centers"),
    (r"\btheatre\b", "theater"), (r"\btheatres\b", "theaters"),
    (r"\bmetre\b", "meter"), (r"\bmetres\b", "meters"),
    (r"\bshew\b", "show"), (r"\bshewed\b", "showed"),
    (r"\bshewing\b", "showing"), (r"\bchuse\b", "choose"),
    (r"\bchuses\b", "chooses"), (r"\bchusing\b", "choosing"),
    (r"\bchused\b", "chose"), (r"\bsurprize\b", "surprise"),
    (r"\bsurprized\b", "surprised"), (r"\bsurprizing\b", "surprising"),
    (r"\bpublique\b", "public"), (r"\bpublicque\b", "public"),
    (r"\bantient\b", "ancient"), (r"\bancestours\b", "ancestors"),
    (r"\bintire\b", "entire"), (r"\bintirely\b", "entirely"),
    (r"\bcompleat\b", "complete"), (r"\bcompleatly\b", "completely"),
    (r"\bcompleated\b", "completed"), (r"\bcloaths?\b", "clothes"),
    (r"\bcloath\b", "cloth"), (r"\bcloathing\b", "clothing"),
    (r"\bmagick\b", "magic"), (r"\btragick\b", "tragic"),
    (r"\bcomedick\b", "comic"), (r"\bvpon\b", "upon"),
    (r"\bvnto\b", "unto"), (r"\bvnder\b", "under"),
    (r"\bvnited\b", "united"), (r"\bvnion\b", "union"),
    (r"\bvnjust\b", "unjust"), (r"\bvnless\b", "unless"),
    (r"\bvniuersal\b", "universal"), (r"\bvniuersity\b", "university"),
    (r"\bhaue\b", "have"), (r"\bsaue\b", "save"),
    (r"\bgiu(e|en|eth|ing)\b", r"giv\1"), (r"\beuer\b", "ever"),
    (r"\bneuer\b", "never"), (r"\bouer\b", "over"),
    (r"\bdoe\b", "do"), (r"\bdoeth\b", "does"), (r"\bdoth\b", "does"),
    (r"\bhath\b", "has"), (r"\bhadst\b", "had"), (r"\bshalt\b", "shall"),
    (r"\bshouldst\b", "should"), (r"\bwouldst\b", "would"),
    (r"\bcouldst\b", "could"), (r"\bmightst\b", "might"),
    (r"\bjudgement\b", "judgment"), (r"\bjudgements\b", "judgments"),
    (r"\backnowledgement\b", "acknowledgment"),
    (r"\backnowledgements\b", "acknowledgments"),
    (r"\bencrease\b", "increase"), (r"\benuy\b", "envy"),
    (r"\bantagonistick\b", "antagonistic"), (r"\bgaol\b", "jail"),
    (r"\bgaoler\b", "jailer"), (r"\binteftate\b", "intestate"),
    (r"\bestate\b", "estate"), (r"\bcommoditie?s\b", "commodities"),
    (r"\bcommoditie\b", "commodity"), (r"\bimploy\b", "employ"),
    (r"\bimployed\b", "employed"), (r"\bimployment\b", "employment"),
    (r"\btravell\b", "travel"), (r"\btraveller\b", "traveler"),
    (r"\btravellers\b", "travelers"), (r"\bphilosophick\b", "philosophic"),
    (r"\bpolitically\b", "politically"), (r"\bmony\b", "money"),
    (r"\btyme\b", "time"), (r"\bcryme\b", "crime"),
]

_TYPO_COMPILED = [(re.compile(p), r) for p, r in TYPO_TABLE]
_OCR_COMPILED = [(re.compile(p, re.IGNORECASE), r) for p, r in OCR_TABLE]
_SPELL_COMPILED = [(re.compile(p, re.IGNORECASE), r) for p, r in SPELLING_TABLE]


def is_page_marker(line: str) -> bool:
    return bool(_PAGE_MARKER.match(line.strip()))


def is_ocr_status(line: str) -> bool:
    s = line.strip()
    return (
        s == "There is no visible text on this page."
        or s == "(No text visible)"
        or bool(_OCR_FAILED.match(s))
    )


def collect_running_headers(lines: Sequence[str]) -> set[str]:
    """Within-document frequency heuristic: any short-caps line repeated >= 3
    times is a running header/footer (clean_txt.py:195-206). This is the
    Boilerpipe-style boilerplate signal of the reference."""
    counts: dict[str, int] = {}
    for line in lines:
        s = line.strip()
        if not s or is_page_marker(s) or is_ocr_status(s):
            continue
        if _HEADER_CANDIDATE.match(s):
            counts[s] = counts.get(s, 0) + 1
    return {t for t, n in counts.items() if n >= 3}


def remove_headers_and_page_numbers(
    lines: Sequence[str], running_headers: set[str]
) -> list[str]:
    """Drop running headers and bare page numbers / roman numerals while
    preserving page/OCR markers (clean_txt.py:209-230)."""
    out: list[str] = []
    for line in lines:
        s = line.strip()
        if is_page_marker(line) or is_ocr_status(line):
            out.append(line.rstrip("\n"))
            continue
        if s in running_headers:
            continue
        if _BARE_PAGE_NO.match(s) or _BARE_ROMAN.match(s):
            continue
        out.append(line.rstrip("\n"))
    return out


def is_heading_candidate(
    line: str,
    prev_line: Optional[str],
    next_line: Optional[str],
    running_headers: set[str],
) -> bool:
    """<= 10 words, caps/numbered shape, and blank-adjacent (the lag/lead
    context test, clean_txt.py:233-255)."""
    s = line.strip()
    if not s or is_page_marker(s) or is_ocr_status(s) or s in running_headers:
        return False
    if len(s.split()) > 10:
        return False
    if not (_ALL_CAPS.match(s) or _NUMBERED.match(s)):
        return False
    prev_blank = prev_line is None or not prev_line.strip()
    next_blank = next_line is None or not next_line.strip()
    return prev_blank or next_blank


def mark_headings(lines: Sequence[str], running_headers: set[str]) -> list[str]:
    """Markdown-mark heading candidates: '# ' under 25 chars, else '## '."""
    out: list[str] = []
    n = len(lines)
    for i, line in enumerate(lines):
        prev_line = lines[i - 1] if i > 0 else None
        next_line = lines[i + 1] if i + 1 < n else None
        if is_heading_candidate(line, prev_line, next_line, running_headers):
            s = line.strip()
            out.append(("# " if len(s) < 25 else "## ") + s)
        else:
            out.append(line)
    return out


def apply_typo_replacements(text: str) -> str:
    for rx, rep in _TYPO_COMPILED:
        text = rx.sub(rep, text)
    return text


def apply_ocr_replacements(text: str) -> str:
    for rx, rep in _OCR_COMPILED:
        text = rx.sub(rep, text)
    return text


def apply_modern_spellings(text: str) -> str:
    for rx, rep in _SPELL_COMPILED:
        text = rx.sub(rep, text)
    return text


def normalize_paragraph(text: str) -> str:
    """Fold tables + whitespace collapse + sentence spacing (clean_txt.py:298-305)."""
    text = apply_typo_replacements(text)
    text = apply_ocr_replacements(text)
    text = apply_modern_spellings(text)
    text = re.sub(r"\s+", " ", text).strip()
    return re.sub(r"\.(\S)", r". \1", text)


def build_paragraphs(lines: Sequence[str]) -> list[str]:
    """Stateful paragraph merge with de-hyphenation (clean_txt.py:319-376).

    Inherently sequential per document (the W2 operator): a hyphen-terminated
    line joins the next line — dropping the hyphen when the next starts
    lowercase, keeping the characters when uppercase — and paragraphs flush at
    blanks, markers, and headings.
    """
    out: list[str] = []
    buf: list[str] = []

    def flush() -> None:
        if buf:
            para = normalize_paragraph(" ".join(buf))
            if para:
                out.append(para)
            buf.clear()

    i = 0
    n = len(lines)
    while i < n:
        line = lines[i]
        if is_page_marker(line) or is_ocr_status(line):
            flush()
            out.append(line.strip())
            i += 1
            continue
        if line.startswith("# "):
            flush()
            out.append(line.strip())
            out.append("")
            i += 1
            continue
        s = line.strip()
        if not s:
            flush()
            if out and out[-1] != "":
                out.append("")
            i += 1
            continue

        nxt = lines[i + 1] if i + 1 < n else None
        ends_hyphen = bool(re.search(r"-\s*$", s))
        joinable = (
            nxt is not None
            and not is_page_marker(nxt)
            and not is_ocr_status(nxt)
            and not nxt.lstrip().startswith("#")
            and bool(nxt.strip())
        )
        if ends_hyphen and joinable:
            nxt_s = nxt.lstrip()
            if re.match(r"^[a-z]", nxt_s):
                buf.append(re.sub(r"-\s*$", "", s) + nxt_s)
                i += 2
                continue
            if re.match(r"^[A-Z]", nxt_s):
                buf.append(s.rstrip() + nxt_s)
                i += 2
                continue
        buf.append(s)
        i += 1

    flush()
    return out


def clean_legacy_text(lines: Sequence[str]) -> list[str]:
    """Full legacy pipeline (clean_txt.py:394-399): header collection ->
    removal -> heading marking -> paragraph building."""
    running = collect_running_headers(lines)
    without = remove_headers_and_page_numbers(lines, running)
    marked = mark_headings(without, running)
    return build_paragraphs(marked)


_CAPTION_V = re.compile(r"\s+v\.?\s+", re.IGNORECASE)
_CAPTION_NAME = re.compile(
    r"([A-Z][A-Za-z\s,\.&\'\-]+?)\s+v\.?\s+([A-Za-z\s,\.&\'\-]+?)(?:\n|$)",
    re.IGNORECASE,
)


def find_case_caption(text: str) -> str | None:
    """Exact mirror of the legacy caption finder (zOld-Code/step1…/
    pdf_extractor.py:216-252, W4): scan the first 40 lines for a ' v. '
    marker, take ±2 lines of context, extract 'Party v. Party'.
    Differentially verified in tests/test_legacy_differential.py. The Spark
    operator variant (operators/windows.py:find_captions) surfaces the same
    candidates distributed; this kernel reproduces the reference's composed
    return string."""
    if not text:
        return None
    lines = text.split("\n")
    for i, line in enumerate(lines[:40]):
        if _CAPTION_V.search(line):
            start = max(0, i - 2)
            end = min(len(lines), i + 3)
            context = "\n".join(lines[start:end])
            m = _CAPTION_NAME.search(context)
            if m:
                return f"{m.group(1).strip()} v. {m.group(2).strip()}"
    return None


# exact word list from get_main_content (pdf_extractor.py:111-115) —
# SUBSTRING match on the lowercased stripped line, not word-boundary regex
# ('v.' matches inside 'vs.' etc.; that is the reference's behavior)
_MARGIN_IMPORTANT_WORDS = [
    "decided", "filed", "dated", "court", "circuit", "district",
    "supreme", "appeals", "opinion", "v.", "vs.",
]


def margin_content_filter(lines: Sequence[str]) -> list[str]:
    """Block-scoring margin filter (zOld-Code/step1…/pdf_extractor.py:94-129,
    F5): keep a line iff its stripped form is longer than 20 chars or
    contains a context keyword (substring, case-insensitive) — the
    text-density + keyword heuristic. Differentially verified against
    ``PDFExtractor.get_main_content`` in tests/test_legacy_differential.py."""
    out = []
    for ln in lines:
        stripped = ln.strip()
        if len(stripped) > 20 or any(
            w in stripped.lower() for w in _MARGIN_IMPORTANT_WORDS
        ):
            out.append(ln)
    return out
