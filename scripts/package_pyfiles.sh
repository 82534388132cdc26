#!/usr/bin/env bash
# Build the --py-files archive for spark-submit.
set -euo pipefail
cd "$(dirname "$0")/.."
out="${1:-/tmp/mdcal.zip}"
rm -f "$out"
zip -qr "$out" modern_document_converter_for_ai_library_spark -x '*__pycache__*'
echo "$out"
