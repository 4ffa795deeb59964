#!/usr/bin/env bash
# Benchmark matrix runner (reference tools/bench/run_benchmark_matrix.sh):
# profiles x pool_size x channels. Starts a server per cell, waits for
# /health, runs the gRPC load test, and collects JSONL + summary under
# bench_results/<profile>/<timestamp>/.
#
# Profiles for the TPU build:
#   cpu-fake    — control-plane throughput (fake backend, cpu)
#   cpu-jax     — jax_whisper on the CPU backend (tiny)
#   tpu-small   — jax_whisper whisper-small on the TPU chip
set -euo pipefail
cd "$(dirname "$0")/../.."

PROFILES="${PROFILES:-cpu-fake}"
CHANNELS_LIST="${CHANNELS_LIST:-4 16}"
ITERATIONS="${ITERATIONS:-2}"
AUDIO_SEC="${AUDIO_SEC:-5}"
GRPC_PORT="${GRPC_PORT:-50971}"
HTTP_PORT="${HTTP_PORT:-18971}"
OUT_ROOT="${OUT_ROOT:-bench_results}"

run_cell() {
  local profile="$1" channels="$2"
  local backend device model
  case "$profile" in
    cpu-fake)  backend=fake;        device=cpu; model=tiny ;;
    cpu-jax)   backend=jax_whisper; device=cpu; model=tiny ;;
    tpu-small) backend=jax_whisper; device=tpu; model=small ;;
    *) echo "unknown profile: $profile" >&2; return 1 ;;
  esac
  local stamp out_dir
  stamp=$(date +%Y%m%d_%H%M%S)
  out_dir="$OUT_ROOT/$profile/$stamp"
  mkdir -p "$out_dir"
  echo "[matrix] $profile channels=$channels -> $out_dir"

  python -m stt_tpu.server.main \
    --model "$model" --model-backend "$backend" --device "$device" \
    --port "$GRPC_PORT" --metrics-port "$HTTP_PORT" --ws-port 0 \
    > "$out_dir/server.log" 2>&1 &
  local srv=$!
  trap "kill $srv 2>/dev/null || true" RETURN
  for _ in $(seq 1 240); do
    curl -sf "http://127.0.0.1:$HTTP_PORT/health" >/dev/null 2>&1 && break
    sleep 0.5
  done
  python tools/bench/grpc_load_test.py \
    --target "127.0.0.1:$GRPC_PORT" \
    --sessions "$channels" --iterations "$ITERATIONS" \
    --synthetic-sec "$AUDIO_SEC" --warmup 1 \
    --out "$out_dir/sessions.jsonl" \
    > "$out_dir/summary.json" || true
  cat "$out_dir/summary.json"
  kill "$srv" 2>/dev/null || true
  wait "$srv" 2>/dev/null || true
}

for profile in $PROFILES; do
  for channels in $CHANNELS_LIST; do
    run_cell "$profile" "$channels"
  done
done
echo "[matrix] results under $OUT_ROOT/"
