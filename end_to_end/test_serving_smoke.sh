#!/usr/bin/env bash
# End-to-end serving smoke: boots the gRPC server CLI on a tiny model,
# streams a Decode over a real channel, then does the same over HTTP.
# Reference flow: maxengine_server (JetStream gRPC, port 9000).
# CPU-safe: MTT_PLATFORM=cpu. Usage: bash end_to_end/test_serving_smoke.sh
set -euo pipefail
cd "$(dirname "$0")/.."

CFG=(base_emb_dim=64 base_mlp_dim=128 base_num_decoder_layers=2
     base_num_query_heads=2 base_num_kv_heads=2 head_dim=32 vocab_size=256
     max_target_length=64 max_prefill_predict_length=16
     per_device_batch_size=4 dtype=float32 decode_sampling_strategy=greedy)
GPORT=${GPORT:-39611}
HPORT=${HPORT:-39612}
PIDS=()
cleanup() { for p in "${PIDS[@]}"; do kill "$p" 2>/dev/null || true; done; }
trap cleanup EXIT

MTT_PLATFORM=cpu python -m maxtext_indextts2_tpu.infer.grpc_server \
  "${CFG[@]}" inference_server_port="$GPORT" &
PIDS+=($!)
MTT_PLATFORM=cpu python -m maxtext_indextts2_tpu.infer.server \
  "${CFG[@]}" inference_server_port="$HPORT" &
PIDS+=($!)

python - "$GPORT" "$HPORT" <<'EOF'
import json, sys, time, urllib.request
import grpc
from maxtext_indextts2_tpu.infer.grpc_server import OrchestratorStub
from maxtext_indextts2_tpu.infer.proto import orchestrator_pb2 as pb

gport, hport = sys.argv[1], sys.argv[2]
chan = grpc.insecure_channel(f"127.0.0.1:{gport}")
deadline = time.time() + 120
while True:
    try:
        assert OrchestratorStub(chan).HealthCheck(
            pb.HealthCheckRequest(), timeout=5).ok
        break
    except Exception:
        if time.time() > deadline:
            raise
        time.sleep(2)
msgs = list(OrchestratorStub(chan).Decode(
    pb.DecodeRequest(token_ids=[3, 5, 7], max_tokens=8), timeout=120))
toks = [t for m in msgs for t in m.token_ids]
assert len(toks) == 8 and msgs[-1].done and not msgs[-1].error, msgs
print(f"gRPC Decode ok: {toks} in {len(msgs)} stream messages")

req = urllib.request.Request(
    f"http://127.0.0.1:{hport}/generate",
    data=json.dumps({"prompt": [3, 5, 7], "max_new_tokens": 8}).encode(),
    headers={"Content-Type": "application/json"})
while True:
    try:
        with urllib.request.urlopen(req, timeout=120) as resp:
            out = json.loads(resp.read())
        break
    except Exception:
        if time.time() > deadline:
            raise
        time.sleep(2)
assert out["tokens"] == toks, (out, toks)  # same greedy stream, same engine cfg
print("HTTP /generate ok: matches gRPC output")
EOF
echo "serving smoke PASSED"
