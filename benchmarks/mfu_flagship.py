"""Expanded-vocab (264,192) training MFU at 1B-class, single chip.

VERDICT r2 item #3: the reference fork's actual training regime is the
vocab-expanded model (reference vocab_expansion/expand_embedder.py:35 grows
token_embedder.embedding to 264,192 rows; gemma-3 ties the unembedding to
the embedding). At this vocab the embedding + logits/CE dominate: full
[B,S,V] f32 logits at b4/s2048 are 8.6 GB — they cannot exist on a 16 GB
chip next to a 1B-class model's optimizer state. The fused chunked-vocab CE
(ops/losses.py chunked_unembed_cross_entropy) is what makes this regime
trainable at all; this bench measures what MFU it reaches.

Model: tts-1b body (emb 2048, 20 layers, mlp 8192, 16q/8kv) + vocab 264192
tied embedding = 1.78 B params. FLOPs accounting includes the 2*d*V unembed
matmul (utils/flops.py per_token_matmul_flops), causal-halved attention —
the reference MFU methodology.

  python benchmarks/mfu_flagship.py          # chunk/batch sweep
  python benchmarks/mfu_flagship.py --best   # recorded best config only
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sweep import train_trial  # noqa: E402

MODEL_FLAGSHIP_VOCAB = [
    "decoder_block=tts",
    "base_emb_dim=2048", "base_num_query_heads=16", "base_num_kv_heads=8",
    "base_mlp_dim=8192", "base_num_decoder_layers=20", "head_dim=128",
    "vocab_size=264192", "logits_via_embedding=true",
    "max_target_length=2048",
    "remat_policy=full", "attention=flash", "flash_block_sizes=[1024,1024]",
    "scan_layers=false", "weight_dtype=bfloat16",
]

# Measured 2026-08-20/21 (PERF.md "Flagship-vocab"): chunk 512 @ b4 +
# int8 AQT = 106.95 TF/s/chip (54.3% MFU) is the optimum. bf16 chunk 512
# gives 101.8 (51.7%); chunk 256 drops to 92.7 (the [E,V] unembed weights
# re-read per chunk start to dominate), 1024 gives 98.9, and 2048/4096
# crash the remote compile helper (HTTP 500). b8 at chunk 512 matches b4;
# scanned layers cost 5.7%. The vocab-STREAMING CE measured SLOWER than
# chunked at this shape (98.2 bf16 / 102.9 int8) — the chunked scan's dW
# accumulation is already in-place under XLA, and vocab-outer pays for its
# [N, tile] logits transients and dy-carry rewrites.
BEST = MODEL_FLAGSHIP_VOCAB + [
    "per_device_batch_size=4", "fused_vocab_ce_chunk=512",
]
BEST_INT8 = BEST + ["quantization=int8"]
# Measured 2026-08-22 (--r5 sweep, benchmarks/results/mfu_flagship_r5.jsonl):
# int8 fused CE (once-per-step kernel quant) + bf16 logit slices =
# 119.11 TF/s/chip (60.5% MFU, 0.7772 s/step) — above the reference's
# 56.06% v5e band floor. Ablation: fused_ce_int8 alone +5.8 pts, bf16
# slices alone +0.7; chunk 512 > 1024 > 256; b8 matches b4 per-token.
BEST_R5 = BEST_INT8 + ["fused_ce_int8=true", "fused_ce_logits_dtype=bfloat16"]

# round-3 candidate: vocab-STREAMING fused CE (custom VJP, vocab-outer
# tiles — the unembed kernel moves through HBM O(1) times per step and dW
# is written once per tile instead of the chunked variant's per-chunk
# [E,V] f32 grad rewrite). Tile chooser picks 6144 (= 264192/43) at 8192.
STREAMING = [o for o in BEST if not o.startswith("fused_vocab_ce_chunk")] + [
    "fused_vocab_ce_tile=8192",
]

# round-5 levers (VERDICT r4 item #2): the fused CE's own matmuls go int8
# with the kernel quantized ONCE per step (fused_ce_int8 — AQT's per-call
# dot_general would re-read the bf16 [E,V] kernel every chunk), and the
# [chunk, V] logits slices materialize in bf16 (fused_ce_logits_dtype).
R5_FULL = BEST_INT8 + ["fused_ce_int8=true", "fused_ce_logits_dtype=bfloat16"]
R5_TRIALS = (
    R5_FULL,
    BEST_INT8 + ["fused_ce_int8=true"],
    BEST_INT8 + ["fused_ce_logits_dtype=bfloat16"],
    [o for o in R5_FULL if not o.startswith("fused_vocab_ce_chunk")]
    + ["fused_vocab_ce_chunk=1024"],
    [o for o in R5_FULL if not o.startswith("fused_vocab_ce_chunk")]
    + ["fused_vocab_ce_chunk=256"],
    [o for o in R5_FULL if not o.startswith("per_device_batch_size")]
    + ["per_device_batch_size=8"],
)

TRIALS = (
    BEST_INT8,
    BEST,
    STREAMING,
    [o for o in STREAMING if not o.startswith("fused_vocab_ce_tile")]
    + ["fused_vocab_ce_tile=2048"],
    # int8 AQT won at 1.28B/vocab-8704 (58.4% vs 56.4% bf16, PERF.md); the
    # body matmuls are still ~70% of flagship FLOPs (CE's jnp.dot unembed
    # is not AQT-injected)
    STREAMING + ["quantization=int8"],
    [o for o in STREAMING if not o.startswith("per_device_batch_size")]
    + ["per_device_batch_size=8"],
    [o for o in BEST if not o.startswith("fused_vocab_ce_chunk")]
    + ["fused_vocab_ce_chunk=1024"],
    [o for o in BEST if not o.startswith("fused_vocab_ce_chunk")]
    + ["fused_vocab_ce_chunk=256"],
    [o for o in BEST if not o.startswith("per_device_batch_size")]
    + ["per_device_batch_size=8"],
    [o for o in BEST if not o.startswith("per_device_batch_size")]
    + ["per_device_batch_size=2"],
    # scanned layers: smaller program for the compile helper (unrolled won
    # +5% at 1B with vocab 8704 — PERF.md)
    [o for o in BEST if not o.startswith("scan_layers")]
    + ["scan_layers=true"],
    # richer remat: +2.7% at 1.28B/vocab-8704 (PERF.md) if it still fits
    # next to the 264k embedding + optimizer state
    [o for o in BEST if not o.startswith("remat_policy")]
    + ["remat_policy=save_attn_and_mlp"],
    # the regime the fused CE replaces: full-logits CE only has a chance at
    # batch 1 (2.2 GB f32 logits) — expected slower or OOM; measured for the
    # PERF.md comparison row
    [o for o in MODEL_FLAGSHIP_VOCAB if not o.startswith("per_device_batch_size")]
    + ["per_device_batch_size=1"],
)


def main():
    trials = TRIALS
    if "--best" in sys.argv:
        trials = (BEST_R5,)
    elif "--streaming" in sys.argv:
        trials = TRIALS[2:6]
    elif "--r5" in sys.argv:
        trials = R5_TRIALS
    for ov in trials:
        try:
            print(json.dumps(train_trial(ov)), flush=True)
        except Exception as e:  # noqa: BLE001 — keep sweeping past OOMs
            print(json.dumps({"overrides": ov, "error": repr(e)[:500]}), flush=True)


if __name__ == "__main__":
    main()
