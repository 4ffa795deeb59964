#!/usr/bin/env bash
# Serve the PWA over HTTPS with Caddy (mic capture requires a secure origin).
set -euo pipefail
cd "$(dirname "$0")"
command -v caddy >/dev/null || { echo "caddy not installed" >&2; exit 1; }
exec caddy run --config Caddyfile --adapter caddyfile
