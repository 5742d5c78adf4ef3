#!/usr/bin/env bash
# Regenerate protobuf message classes for the gRPC serving surface.
# grpcio-tools is not available in this image, so only messages are
# generated; the service registration lives hand-written in
# maxtext_indextts2_tpu/infer/grpc_server.py.
set -euo pipefail
cd "$(dirname "$0")/.."
protoc \
  --proto_path=maxtext_indextts2_tpu/infer/proto \
  --python_out=maxtext_indextts2_tpu/infer/proto \
  orchestrator.proto
echo "wrote maxtext_indextts2_tpu/infer/proto/orchestrator_pb2.py"
