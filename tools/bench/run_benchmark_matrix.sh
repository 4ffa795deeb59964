#!/usr/bin/env bash
# Benchmark matrix runner (reference tools/bench/run_benchmark_matrix.sh):
# hardware profiles x channels. Starts a server per cell, waits for
# /health, runs the gRPC load test, and collects the full artifact set
# (sessions.{jsonl,csv,md} + summary.json + run_meta.json + profile.json)
# under bench_results/<profile>/<timestamp>/.
#
# Hardware profiles for the TPU build (the reference names its bench
# hosts the same way — run_benchmark_matrix.sh:10-15):
#   cpu-fake      — control-plane throughput (fake backend, cpu)
#   cpu-jax       — jax_whisper tiny on the CPU backend
#   tpu-tiny      — jax_whisper whisper-tiny on the TPU chip
#   tpu-small     — jax_whisper whisper-small on the TPU chip (north star)
#   tpu-small-acc — whisper-small, `accurate` profile (beam 5)
#
# Env knobs: PROFILES, CHANNELS_LIST, ITERATIONS, AUDIO_SEC, SPEED, MODE.
set -euo pipefail
cd "$(dirname "$0")/../.."

PROFILES="${PROFILES:-cpu-fake}"
CHANNELS_LIST="${CHANNELS_LIST:-4 16}"
ITERATIONS="${ITERATIONS:-2}"
AUDIO_SEC="${AUDIO_SEC:-5}"
SPEED="${SPEED:-1.0}"
MODE="${MODE:-realtime}"
GRPC_PORT="${GRPC_PORT:-50971}"
HTTP_PORT="${HTTP_PORT:-18971}"
OUT_ROOT="${OUT_ROOT:-bench_results}"

hardware_fingerprint() {
  python - <<'PY' 2>/dev/null || echo '{}'
import json, os, platform
info = {
    "host": platform.node(),
    "machine": platform.machine(),
    "cpus": os.cpu_count(),
}
try:
    import jax
    info["jax_devices"] = [
        {"platform": d.platform, "kind": getattr(d, "device_kind", "")}
        for d in jax.devices()
    ]
except Exception as exc:
    info["jax_devices_error"] = str(exc)
print(json.dumps(info))
PY
}

run_cell() {
  local profile="$1" channels="$2"
  local backend device model decode_profile
  decode_profile=realtime
  case "$profile" in
    cpu-fake)      backend=fake;        device=cpu; model=tiny ;;
    cpu-jax)       backend=jax_whisper; device=cpu; model=tiny ;;
    tpu-tiny)      backend=jax_whisper; device=tpu; model=tiny ;;
    tpu-small)     backend=jax_whisper; device=tpu; model=small ;;
    tpu-small-acc) backend=jax_whisper; device=tpu; model=small
                   decode_profile=accurate ;;
    *) echo "unknown profile: $profile" >&2; return 1 ;;
  esac
  local stamp out_dir
  stamp=$(date +%Y%m%d_%H%M%S)
  out_dir="$OUT_ROOT/$profile/$stamp"
  mkdir -p "$out_dir"
  echo "[matrix] $profile channels=$channels -> $out_dir"
  {
    echo "{\"profile\": \"$profile\", \"backend\": \"$backend\","
    echo " \"device\": \"$device\", \"model\": \"$model\","
    echo " \"decode_profile\": \"$decode_profile\","
    echo " \"channels\": $channels, \"hardware\": $(hardware_fingerprint)}"
  } > "$out_dir/profile.json"

  python -m stt_tpu.server.main \
    --model "$model" --model-backend "$backend" --device "$device" \
    --port "$GRPC_PORT" --metrics-port "$HTTP_PORT" --ws-port 0 \
    > "$out_dir/server.log" 2>&1 &
  local srv=$!
  trap "kill $srv 2>/dev/null || true" RETURN
  # TPU boots prewarm the full shape matrix: allow up to 15 min cold
  for _ in $(seq 1 1800); do
    curl -sf "http://127.0.0.1:$HTTP_PORT/health" >/dev/null 2>&1 && break
    sleep 0.5
  done
  python tools/bench/grpc_load_test.py \
    --target "127.0.0.1:$GRPC_PORT" \
    --sessions "$channels" --iterations "$ITERATIONS" \
    --synthetic-sec "$AUDIO_SEC" --warmup 1 \
    --mode "$MODE" --speed "$SPEED" --language en \
    --profile "$decode_profile" \
    --out-dir "$out_dir" \
    > "$out_dir/summary_stdout.json" || true
  cat "$out_dir/summary_stdout.json"
  kill "$srv" 2>/dev/null || true
  wait "$srv" 2>/dev/null || true
}

for profile in $PROFILES; do
  for channels in $CHANNELS_LIST; do
    run_cell "$profile" "$channels"
  done
done
echo "[matrix] results under $OUT_ROOT/"
