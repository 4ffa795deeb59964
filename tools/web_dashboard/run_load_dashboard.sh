#!/usr/bin/env bash
# Launch the load-test web dashboard (reference run_load_dashboard.sh
# equivalent; no Node/pnpm — the stdlib server serves the frontend too).
set -euo pipefail

SCRIPT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
REPO_ROOT="$(cd "${SCRIPT_DIR}/../.." && pwd)"

WEB_DASHBOARD_HOST="${WEB_DASHBOARD_HOST:-127.0.0.1}"
WEB_DASHBOARD_PORT="${WEB_DASHBOARD_PORT:-8090}"
STT_HTTP_BASE="${STT_HTTP_BASE:-http://127.0.0.1:8000}"
STT_GRPC_TARGET="${STT_GRPC_TARGET:-127.0.0.1:50051}"

cd "${REPO_ROOT}"
exec python -m tools.web_dashboard.server \
  --host "${WEB_DASHBOARD_HOST}" \
  --port "${WEB_DASHBOARD_PORT}" \
  --stt-http "${STT_HTTP_BASE}" \
  --stt-grpc "${STT_GRPC_TARGET}" \
  "$@"
