from maxtext_indextts2_tpu.ops.losses import (
    cross_entropy_with_logits,
    masked_cross_entropy,
)
