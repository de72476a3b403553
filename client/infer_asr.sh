#!/usr/bin/env bash
# Curl smoke test (reference client/infer_asr.sh): multipart ASR request.
set -euo pipefail

URL="${1:-http://localhost:19000}"
FILE="${2:-/root/reference/client/3sec.flac}"
MODEL="${3:-medium}"
BEAM="${4:-1}"

curl -sS -F "audio_file=@${FILE}" \
    "${URL}/api/asr?model=${MODEL}&beam_size=${BEAM}" | python3 -m json.tool
