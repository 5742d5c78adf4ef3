"""On-device semantic tokenizer: wav -> 8192-vocab semantic token ids.

The TPU-native replacement for the reference's torch SemanticTokenizer
(reference: input_pipeline/maskgct/semantic_utils.py:35 — SeamlessM4T
features -> w2v-BERT layer 17 -> mean/std normalize -> RepCodec quantize).
One jitted function; batched; static shapes via a padded duration bucket.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from maxtext_indextts2_tpu.audio import mel
from maxtext_indextts2_tpu.audio.conformer import ConformerConfig, SemanticEncoder
from maxtext_indextts2_tpu.audio.repcodec import RepCodec


class SemanticTokenizer:
    """Bundles encoder+codec params into one jitted tokenize fn."""

    def __init__(
        self,
        encoder_cfg: ConformerConfig | None = None,
        repcodec_kwargs: dict | None = None,
        params=None,
        rng: jax.Array | None = None,
    ):
        self.encoder_cfg = encoder_cfg or ConformerConfig()
        self.encoder = SemanticEncoder(self.encoder_cfg)
        self.repcodec = RepCodec(
            hidden_size=self.encoder_cfg.hidden_size, **(repcodec_kwargs or {})
        )
        self.params = params
        self._rng = rng if rng is not None else jax.random.PRNGKey(0)
        self._jit_tokenize = jax.jit(self._tokenize_impl)

    def init_params(self, example_seconds: float = 1.0):
        """Random-init params (tests / before checkpoint conversion)."""
        n = int(example_seconds * mel.SAMPLE_RATE)
        wav = jnp.zeros((1, n), jnp.float32)
        feats, _ = mel.w2vbert_features(wav, jnp.array([n]))
        r1, r2 = jax.random.split(self._rng)
        p_enc = self.encoder.init(r1, feats)
        hidden = self.encoder.apply(p_enc, feats)
        p_rep = self.repcodec.init(r2, hidden)
        self.params = {"encoder": p_enc, "repcodec": p_rep}
        return self.params

    def _init_repcodec_only(self):
        """Random-init just the codec half (shape-only encoder output — no
        wasted full-encoder init/forward when converted weights follow)."""
        hidden = jnp.zeros((1, 4, self.encoder_cfg.hidden_size), jnp.float32)
        return self.repcodec.init(jax.random.split(self._rng)[1], hidden)

    def load_hf_encoder(self, state_dict, stat_mean=None, stat_std=None):
        """Load converted HF w2v-BERT weights for the encoder half
        (reference: semantic_utils.py:11 build_semantic_model + the
        wav2vec2bert_stats.pt normalization). ``state_dict`` is a HF
        ``Wav2Vec2BertModel`` state dict (torch tensors or numpy).
        RepCodec params must still be provided/initialized separately."""
        from maxtext_indextts2_tpu.audio.conformer import params_from_hf

        p_enc = params_from_hf(state_dict, self.encoder_cfg, stat_mean, stat_std)
        p_rep = (
            self.params["repcodec"] if self.params is not None
            else self._init_repcodec_only()
        )
        self.params = {"encoder": p_enc, "repcodec": p_rep}
        return self.params

    def load_torch_repcodec(self, state_dict):
        """Load a reference-format RepCodec torch state dict for the codec
        half (reference: semantic_utils.py:27 build_semantic_codec)."""
        from maxtext_indextts2_tpu.audio.torch_ckpt import repcodec_params_from_torch

        if self.params is None:
            self.init_params()
        self.params = {
            **self.params,
            "repcodec": repcodec_params_from_torch(state_dict),
        }
        return self.params

    def set_stats(self, stats):
        """Install layer-tap normalization stats ({"mean", "var"} dict, the
        wav2vec2bert_stats.pt format; std = sqrt(var)) on the current
        encoder params without touching its weights."""
        if self.params is None:
            self.init_params()
        enc = dict(self.params["encoder"])
        p = dict(enc["params"])
        p["stat_mean"] = jnp.asarray(np.asarray(stats["mean"], np.float32))
        p["stat_std"] = jnp.sqrt(jnp.asarray(np.asarray(stats["var"], np.float32)))
        enc["params"] = p
        self.params = {**self.params, "encoder": enc}
        return self.params

    def load_torch_weights(
        self, encoder_state_dict, repcodec_state_dict, stats=None
    ):
        """One-call port of the reference semantic tokenizer's three weight
        artifacts (semantic_utils.py:11-32): the HF Wav2Vec2BertModel state
        dict, the RepCodec state dict, and the wav2vec2bert_stats.pt dict
        ({"mean": [H], "var": [H]} — std is sqrt(var), semantic_utils.py:20).
        """
        mean = std = None
        if stats is not None:
            mean = np.asarray(stats["mean"], np.float32)
            std = np.sqrt(np.asarray(stats["var"], np.float32))
        self.load_hf_encoder(encoder_state_dict, mean, std)
        self.load_torch_repcodec(repcodec_state_dict)
        return self.params

    def _tokenize_impl(self, params, wav, wav_lengths):
        feats, feat_lengths = mel.w2vbert_features(wav, wav_lengths)
        pad_mask = (
            jnp.arange(feats.shape[1])[None, :] < feat_lengths[:, None]
        )
        hidden = self.encoder.apply(params["encoder"], feats, pad_mask)
        ids = self.repcodec.apply(params["repcodec"], hidden, method=self.repcodec.quantize)
        return ids, feat_lengths

    def tokenize(self, wav: np.ndarray | jax.Array, wav_lengths=None):
        """[B, T] 16 kHz float wav -> ([B, T'] ids, [B] lengths)."""
        wav = jnp.asarray(wav)
        if wav.ndim == 1:
            wav = wav[None]
        if wav_lengths is None:
            wav_lengths = jnp.full((wav.shape[0],), wav.shape[1], jnp.int32)
        return self._jit_tokenize(self.params, wav, jnp.asarray(wav_lengths))
