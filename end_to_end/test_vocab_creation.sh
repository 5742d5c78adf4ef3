#!/bin/bash
# Vocab creation flow: train a tokenizer from a corpus, write a params-only
# checkpoint, expand its embedding (and tied logits) rows for the audio
# tokens, and verify the expanded checkpoint serves.
# Reference: end_to_end/tpu/test_vocab_creation.sh + vocab_expansion/.
set -e
cd "$(dirname "$0")/.."
export MTT_PLATFORM=${MTT_PLATFORM:-cpu}
WORK=$(mktemp -d /tmp/e2e_vocab_XXXX)
CFG=(base_emb_dim=128 base_mlp_dim=256 base_num_decoder_layers=2
     base_num_query_heads=4 base_num_kv_heads=4 head_dim=32
     max_target_length=64 max_prefill_predict_length=16
     per_device_batch_size=1 dtype=float32 decode_sampling_strategy=greedy)

# 1. tokenizer training (SentencePiece when available, byte-vocab fallback)
printf 'the quick brown fox\njumps over the lazy dog\n%.0s' {1..50} > "$WORK/corpus.txt"
python -m maxtext_indextts2_tpu.train.data.train_tokenizer \
  corpus="$WORK/corpus.txt" out="$WORK/tok" vocab_size=512 | tee "$WORK/tok.json"

# 2. params-only checkpoint at vocab 256, expanded by 64 rows
python - "$WORK" <<'EOF'
import sys
from maxtext_indextts2_tpu.config import load_config
from maxtext_indextts2_tpu.infer.engine import Engine
from maxtext_indextts2_tpu.train.checkpointing import save_params_only

work = sys.argv[1]
cfg = load_config([
    "base_emb_dim=128", "base_mlp_dim=256", "base_num_decoder_layers=2",
    "base_num_query_heads=4", "base_num_kv_heads=4", "head_dim=32",
    "vocab_size=256", "max_target_length=64", "max_prefill_predict_length=16",
    "per_device_batch_size=1", "dtype=float32",
    "serve_unroll_layers=false"])  # float ckpts on disk use training layout
eng = Engine(cfg)
eng.load_params()  # random init
save_params_only(f"{work}/base_ckpt", eng.params)
print("saved base checkpoint")
EOF
python -m maxtext_indextts2_tpu.vocab.expand \
  --in_path "$WORK/base_ckpt" --out_path "$WORK/expanded_ckpt" --num_new_rows 64

# 3. the expanded checkpoint serves at the grown vocab, and the new token
#    ids are decodable
python -m maxtext_indextts2_tpu.infer.decode "${CFG[@]}" vocab_size=320 \
  load_parameters_path="$WORK/expanded_ckpt" prompt=300,310,315 max_new_tokens=8 \
  | grep ^completion:
rm -rf "$WORK"
echo "vocab creation e2e PASSED"
