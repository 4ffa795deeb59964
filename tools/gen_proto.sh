#!/usr/bin/env bash
# Regenerate Python protobuf bindings from stt_tpu/proto/stt.proto.
#
# Only the message classes (stt_pb2.py) are machine-generated; the gRPC
# service bindings live in stt_tpu/gen/stt_pb2_grpc.py and are maintained by
# hand (the build image ships protoc but not grpc_python_plugin).
set -euo pipefail
cd "$(dirname "$0")/.."

PROTOC_CMD=(protoc -I stt_tpu/proto --python_out=stt_tpu/gen)

# optional mypy stubs, matching the reference's gen_proto behavior
# (/root/reference/tools/gen_proto.sh:35-44): when protoc-gen-mypy is
# installed (pip install mypy-protobuf), emit stt_pb2.pyi alongside the
# bindings; otherwise skip loudly.
MYPY_PLUGIN=""
if command -v protoc-gen-mypy >/dev/null 2>&1; then
  MYPY_PLUGIN="$(command -v protoc-gen-mypy)"
fi
if [[ -n "$MYPY_PLUGIN" ]]; then
  PROTOC_CMD+=(--plugin=protoc-gen-mypy="$MYPY_PLUGIN")
  PROTOC_CMD+=(--mypy_out=stt_tpu/gen)
else
  echo "Skipping mypy stub generation (protoc-gen-mypy not found)."
fi

"${PROTOC_CMD[@]}" stt_tpu/proto/stt.proto
echo "generated stt_tpu/gen/stt_pb2.py"
[[ -n "$MYPY_PLUGIN" ]] && echo "generated stt_tpu/gen/stt_pb2.pyi"
python - <<'EOF'
from stt_tpu.gen import stt_pb2, stt_pb2_grpc  # noqa: F401
print("import check OK")
EOF
