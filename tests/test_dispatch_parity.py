"""Pin the binary-ingest format dispatch against the ACTUAL legacy
doc_to_markdown ``FileTypeDetector`` extension sets, so a drift in either
table breaks loudly (step3a adjudication: the factory/detector plumbing is
replaced by this dispatch + the manifest resume protocol)."""

import importlib.util
import sys

import pytest

sys.dont_write_bytecode = True

_DET = (
    "/root/reference/zOld-Code/step3a--NORMALIZE-TXT--MODERN--convert_to_txt"
    "--clean--add_headings/doc_to_markdown/file_detector.py"
)


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


try:
    ref = _load("ref_file_detector", _DET)
    _REF_OK = True
except Exception:  # pragma: no cover
    _REF_OK = False

pytestmark = pytest.mark.skipif(not _REF_OK, reason="step3a reference unavailable")


def test_dispatch_extensions_match_reference_detector():
    from modern_document_converter_for_ai_library_spark.sources.binary_ingest import (
        default_extractor,
    )

    det = ref.FileTypeDetector
    handled = det.WORD_EXTENSIONS | det.EPUB_EXTENSIONS | det.MOBI_EXTENSIONS | det.PDF_EXTENSIONS
    extract = default_extractor()

    for ext in sorted(handled):
        # every reference-supported extension must route somewhere real:
        # either extract (env-dependent) or fail with a per-row dependency
        # error — never the unsupported-format error
        try:
            extract("x" + ext, b"")
        except RuntimeError as e:
            assert "Unsupported file format" not in str(e), ext
        except Exception:
            pass  # dependency errors are fine; routing happened

    # and an extension the reference does not support must be rejected
    with pytest.raises(RuntimeError, match="Unsupported file format"):
        extract("x.xyz", b"")
    assert ".xyz" not in handled
