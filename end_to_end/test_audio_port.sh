#!/bin/bash
# End-to-end: reference-format torch checkpoints -> audio CLI tokenize.
# Builds tiny torch artifacts (HF w2v-BERT state dict, RepCodec state dict,
# stats.pt), runs `python -m maxtext_indextts2_tpu.audio.cli tokenize` with
# dims inferred from the checkpoints, and asserts the token output.
set -e
cd "$(dirname "$0")/.."
D=$(mktemp -d /tmp/e2e_audio_port_XXXX)
trap 'rm -rf "$D"' EXIT

python - "$D" <<'EOF'
import sys

import numpy as np
import torch
import transformers as tf

d = sys.argv[1]
torch.manual_seed(0)
hf = tf.Wav2Vec2BertModel(tf.Wav2Vec2BertConfig(
    hidden_size=32, num_hidden_layers=3, num_attention_heads=2,
    intermediate_size=48, feature_projection_input_dim=160,
    conv_depthwise_kernel_size=31, position_embeddings_type="relative_key",
    left_max_position_embeddings=64, right_max_position_embeddings=8,
    hidden_dropout=0.0, attention_dropout=0.0, feat_proj_dropout=0.0,
    conformer_conv_dropout=0.0,
)).eval()
torch.save(hf.state_dict(), f"{d}/w2vbert.pt")

torch.save({"mean": torch.zeros(32), "var": torch.ones(32)}, f"{d}/stats.pt")
np.save(f"{d}/in.npy", np.random.default_rng(0)
        .standard_normal(16000).astype(np.float32))
EOF

# build the RepCodec artifact from the reference module when available,
# else skip the repcodec flag (encoder-only port still tokenizes)
REPC=""
if [ -f /root/reference/MaxText/input_pipeline/maskgct/repcodec_model.py ]; then
python - "$D" <<'EOF'
import importlib.util
import sys
import types

import torch

d = sys.argv[1]
REF = "/root/reference/MaxText/input_pipeline/maskgct"
pkg = types.ModuleType("refmaskgct"); pkg.__path__ = [REF]
sys.modules["refmaskgct"] = pkg
for name in ("quantize", "vocos", "repcodec_model"):
    spec = importlib.util.spec_from_file_location(
        f"refmaskgct.{name}", f"{REF}/{name}.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[f"refmaskgct.{name}"] = mod
    spec.loader.exec_module(mod)
torch.manual_seed(0)
rc = sys.modules["refmaskgct.repcodec_model"].RepCodec(
    codebook_size=32, hidden_size=32, codebook_dim=4, vocos_dim=12,
    vocos_intermediate_dim=24, vocos_num_layers=2, num_quantizers=1).eval()
torch.save(rc.state_dict(), f"{d}/repcodec.pt")
EOF
REPC="repcodec=$D/repcodec.pt"
fi

OUT=$(python -m maxtext_indextts2_tpu.audio.cli tokenize \
    input="$D/in.npy" out="$D/codes.npy" \
    w2vbert="$D/w2vbert.pt" stats="$D/stats.pt" $REPC | tail -1)
echo "$OUT"

python - "$D" "$OUT" <<'EOF'
import json
import sys

import numpy as np

d, out = sys.argv[1], sys.argv[2]
info = json.loads(out)
codes = np.load(f"{d}/codes.npy")
assert info["n_tokens"] == len(codes) > 0, info
assert codes.min() >= 0, codes.min()
print(f"audio torch-port e2e OK: {len(codes)} tokens")
EOF
