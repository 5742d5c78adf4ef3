#!/bin/bash
# Quantized-checkpoint round trip: starting from one float params-only
# checkpoint, (a) serve it with on-the-fly int8w conversion, (b) write the
# int8 checkpoint with tools/quantize_checkpoint.py and serve that with
# checkpoint_is_quantized=true. Both paths hold identical int8 params, so
# the greedy completions must match exactly.
# Reference: end_to_end/tpu/test_decode_{save,load}_quantized_ckpt.sh.
set -e
cd "$(dirname "$0")/.."
export MTT_PLATFORM=${MTT_PLATFORM:-cpu}
WORK=$(mktemp -d /tmp/e2e_int8_ckpt_XXXX)
CFG=(base_emb_dim=128 base_mlp_dim=256 base_num_decoder_layers=2
     base_num_query_heads=4 base_num_kv_heads=4 head_dim=32 vocab_size=256
     max_target_length=64 max_prefill_predict_length=16
     per_device_batch_size=1 dtype=float32 decode_sampling_strategy=greedy)

python - "$WORK" "${CFG[@]}" <<'EOF'
import sys
from maxtext_indextts2_tpu.config import load_config
from maxtext_indextts2_tpu.infer.engine import Engine
from maxtext_indextts2_tpu.train.checkpointing import save_params_only

work, cfg_args = sys.argv[1], sys.argv[2:]
# float checkpoints on disk use the training (scan-stacked) layout; the
# serving engine unstacks at load (serve_unroll_layers)
eng = Engine(load_config(cfg_args + ["serve_unroll_layers=false"]))
eng.load_params()  # random init
save_params_only(f"{work}/float_ckpt", eng.params)
print("saved float checkpoint")
EOF

ONLINE=$(python -m maxtext_indextts2_tpu.infer.decode "${CFG[@]}" \
  quantization=int8w_serve load_parameters_path="$WORK/float_ckpt" \
  prompt=3,5,7 max_new_tokens=8 | grep ^completion:)
echo "online int8:  $ONLINE"

python tools/quantize_checkpoint.py "${CFG[@]}" \
  load_parameters_path="$WORK/float_ckpt" save_path="$WORK/int8_ckpt"

OFFLINE=$(python -m maxtext_indextts2_tpu.infer.decode "${CFG[@]}" \
  quantization=int8w_serve checkpoint_is_quantized=true \
  load_parameters_path="$WORK/int8_ckpt" \
  prompt=3,5,7 max_new_tokens=8 | grep ^completion:)
echo "offline int8: $OFFLINE"

[ "$ONLINE" = "$OFFLINE" ] || { echo "completion mismatch"; exit 1; }
rm -rf "$WORK"
echo "quantized-checkpoint decode e2e PASSED"
