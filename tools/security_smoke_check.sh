#!/usr/bin/env bash
# Security smoke check: verify observability/admin endpoints reject
# unauthenticated access when tokens are configured.
# Parity with the reference tools/security_smoke_check.sh.
#
# Usage: BASE_URL=http://host:8000 OBS_TOKEN=... ADMIN_TOKEN=... \
#        tools/security_smoke_check.sh
set -u
BASE_URL="${BASE_URL:-http://127.0.0.1:8000}"
OBS_TOKEN="${OBS_TOKEN:-}"
ADMIN_TOKEN="${ADMIN_TOKEN:-}"
fails=0

check() {
  local desc="$1" expected="$2"; shift 2
  local code
  code=$(curl -s -o /dev/null -w "%{http_code}" "$@")
  if [ "$code" = "$expected" ]; then
    echo "OK   $desc -> $code"
  else
    echo "FAIL $desc -> got $code, expected $expected"
    fails=$((fails + 1))
  fi
}

if [ -n "$OBS_TOKEN" ]; then
  check "/metrics without token rejected" 401 "$BASE_URL/metrics"
  check "/metrics.json without token rejected" 401 "$BASE_URL/metrics.json"
  check "/system without token rejected" 401 "$BASE_URL/system"
  check "/metrics with token allowed" 200 \
    -H "Authorization: Bearer $OBS_TOKEN" "$BASE_URL/metrics"
else
  echo "NOTE OBS_TOKEN unset; skipping observability auth checks"
fi

check "/admin/list_models without token rejected" \
  "$([ -n "$ADMIN_TOKEN" ] && echo 401 || echo 501)" \
  "$BASE_URL/admin/list_models"
check "/admin/load_model without token rejected" \
  "$([ -n "$ADMIN_TOKEN" ] && echo 401 || echo 501)" \
  -X POST -H 'content-type: application/json' -d '{"model_id":"x"}' \
  "$BASE_URL/admin/load_model"
if [ -n "$ADMIN_TOKEN" ]; then
  check "/admin/list_models with token allowed" 200 \
    -H "Authorization: Bearer $ADMIN_TOKEN" "$BASE_URL/admin/list_models"
fi

if [ "$fails" -gt 0 ]; then
  echo "security smoke check FAILED ($fails)"
  exit 1
fi
echo "security smoke check passed"
