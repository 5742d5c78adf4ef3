from maxtext_indextts2_tpu.models.attention import (
    MODE_AUTOREGRESSIVE,
    MODE_PREFILL,
    MODE_TRAIN,
    MODE_VERIFY,
    Attention,
)
from maxtext_indextts2_tpu.models.registry import BLOCK_STYLES, get_block_style
from maxtext_indextts2_tpu.models.transformer import Transformer
