#!/usr/bin/env bash
# Regenerate Python protobuf bindings from stt_tpu/proto/stt.proto.
#
# Only the message classes (stt_pb2.py) are machine-generated; the gRPC
# service bindings live in stt_tpu/gen/stt_pb2_grpc.py and are maintained by
# hand (the build image ships protoc but not grpc_python_plugin).
set -euo pipefail
cd "$(dirname "$0")/.."

protoc -I stt_tpu/proto --python_out=stt_tpu/gen stt_tpu/proto/stt.proto
echo "generated stt_tpu/gen/stt_pb2.py"
python - <<'EOF'
from stt_tpu.gen import stt_pb2, stt_pb2_grpc  # noqa: F401
print("import check OK")
EOF
