"""Torch-checkpoint converters for the audio stack.

A reference user carries trained MaskGCT weights as torch state dicts; these
functions map them onto this framework's JAX param trees so semantic codec,
acoustic codec, and S2A checkpoints serve on TPU unchanged:

- ``repcodec_params_from_torch``: reference repcodec_model.py RepCodec:29
  (VocosBackbone enc/dec + 1-stage factorized RVQ, codebook 8192x8).
- ``codec_encoder_params_from_torch`` / ``codec_decoder_params_from_torch``:
  reference acoustic/codec.py CodecEncoder:126 / CodecDecoder:195
  (use_vocos=True decoders — the configured default, config.py:53).
- ``s2a_params_from_torch``: reference s2a/maskgct_s2a.py MaskGCT_S2A:35 +
  llama_nar.py DiffLlama:130 (HF-Llama-named q/k/v/o + gate/up/down, adaptive
  RMSNorms, cond/diff-step MLPs).

All take ``{name: tensor}`` state dicts (torch tensors or numpy arrays) and
return ``{"params": ...}`` trees. Weight-normed convs (torch
``weight_norm``) are folded to plain weights; both the legacy
``weight_g``/``weight_v`` and the parametrize-style
``parametrizations.weight.original0/1`` key layouts are handled.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "fold_weight_norm",
    "repcodec_params_from_torch",
    "codec_encoder_params_from_torch",
    "codec_decoder_params_from_torch",
    "s2a_params_from_torch",
]


def _np(sd):
    return {k: np.asarray(v) for k, v in sd.items()}


def fold_weight_norm(sd: dict) -> dict:
    """Fold torch weight_norm parameter pairs into plain ``<p>.weight`` keys.

    W = g * v / ||v|| with the norm over all dims except 0 (torch's
    default dim=0 convention for Conv1d/ConvTranspose1d/Linear).
    """
    sd = dict(sd)
    folded = {}
    for key in list(sd):
        if key.endswith(".weight_v"):
            p = key[: -len(".weight_v")]
            g, v = sd.pop(f"{p}.weight_g"), sd.pop(key)
        elif key.endswith(".parametrizations.weight.original1"):
            p = key[: -len(".parametrizations.weight.original1")]
            g = sd.pop(f"{p}.parametrizations.weight.original0")
            v = sd.pop(key)
        else:
            continue
        v = np.asarray(v, np.float64)
        norm = np.sqrt(
            np.sum(np.square(v), axis=tuple(range(1, v.ndim)), keepdims=True)
        )
        folded[f"{p}.weight"] = (np.asarray(g, np.float64) * v / norm).astype(
            np.float32
        )
    sd.update(folded)
    return sd


def _dense(sd, p):
    """torch Linear [out,in] -> flax Dense {kernel [in,out], bias}."""
    out = {"kernel": sd[f"{p}.weight"].T}
    if f"{p}.bias" in sd:
        out["bias"] = sd[f"{p}.bias"]
    return out


def _conv(sd, p):
    """torch Conv1d [out,in,k] -> flax Conv {kernel [k,in,out], bias}."""
    out = {"kernel": sd[f"{p}.weight"].transpose(2, 1, 0)}
    if f"{p}.bias" in sd:
        out["bias"] = sd[f"{p}.bias"]
    return out


def _conv1x1_as_dense(sd, p):
    """torch Conv1d k=1 [out,in,1] -> flax Dense {kernel [in,out], bias}."""
    out = {"kernel": sd[f"{p}.weight"][:, :, 0].T}
    if f"{p}.bias" in sd:
        out["bias"] = sd[f"{p}.bias"]
    return out


def _ln(sd, p):
    return {"scale": sd[f"{p}.weight"], "bias": sd[f"{p}.bias"]}


def _snake(sd, p):
    """torch Snake1d alpha [1,C,1] -> {alpha [C]} (acoustic/codec.py:39)."""
    return {"alpha": sd[f"{p}.alpha"].reshape(-1)}


def _vocos_backbone(sd, prefix):
    """Reference vocos.py VocosBackbone:116 -> audio/vocos.py VocosBackbone.

    Keys under ``prefix``: embed (Conv1d k=7), norm (LayerNorm),
    convnext.{i}.{dwconv,norm,pwconv1,pwconv2,gamma}, final_layer_norm.
    """
    p = {
        "embed": _conv(sd, f"{prefix}embed"),
        "norm": _ln(sd, f"{prefix}norm"),
        "final_layer_norm": _ln(sd, f"{prefix}final_layer_norm"),
    }
    i = 0
    while f"{prefix}convnext.{i}.gamma" in sd:
        c = f"{prefix}convnext.{i}"
        p[f"convnext_{i}"] = {
            "dwconv": _conv(sd, f"{c}.dwconv"),
            "norm": _ln(sd, f"{c}.norm"),
            "pwconv1": _dense(sd, f"{c}.pwconv1"),
            "pwconv2": _dense(sd, f"{c}.pwconv2"),
            "gamma": sd[f"{c}.gamma"],
        }
        i += 1
    return p


def _fvq(sd, prefix, input_dim, codebook_dim):
    """Reference quantize.py FactorizedVectorQuantize:17 -> audio/quantize.py.

    in_project/out_project are weight-normed 1x1 convs (folded upstream);
    identity when input_dim == codebook_dim.
    """
    p = {"codebook": sd[f"{prefix}codebook.weight"]}
    if input_dim != codebook_dim:
        p["in_proj"] = _conv1x1_as_dense(sd, f"{prefix}in_project")
        p["out_proj"] = _conv1x1_as_dense(sd, f"{prefix}out_project")
    return p


def _rvq(sd, prefix, input_dim, codebook_dim):
    """Reference quantize.py ResidualVQ:122 (quantizers.{i}.*)."""
    p = {}
    i = 0
    while f"{prefix}quantizers.{i}.codebook.weight" in sd:
        p[f"vq_{i}"] = _fvq(sd, f"{prefix}quantizers.{i}.", input_dim, codebook_dim)
        i += 1
    return p


def _as_jax(tree):
    return {"params": jax.tree.map(jnp.asarray, tree)}


def repcodec_kwargs_from_torch(state_dict) -> dict:
    """Infer RepCodec constructor kwargs from a reference state dict."""
    sd = _np({k: v for k, v in state_dict.items() if "parametriz" not in k})
    cb = sd["quantizer.quantizers.0.codebook.weight"]
    hidden, vocos_dim = sd["encoder.1.weight"].shape
    num_layers = 0
    while f"encoder.0.convnext.{num_layers}.gamma" in sd:
        num_layers += 1
    nq = 0
    while f"quantizer.quantizers.{nq}.codebook.weight" in sd:
        nq += 1
    return dict(
        hidden_size=hidden,
        codebook_size=cb.shape[0],
        codebook_dim=cb.shape[1],
        vocos_dim=vocos_dim,
        vocos_intermediate_dim=sd["encoder.0.convnext.0.pwconv1.weight"].shape[0],
        vocos_num_layers=num_layers,
        num_quantizers=nq,
    )


def codec_encoder_kwargs_from_torch(state_dict) -> dict:
    """Infer CodecEncoder constructor kwargs from a reference state dict.

    Strides are recoverable because each EncoderBlock's down-conv has
    kernel_size = 2*stride (acoustic/codec.py:90)."""
    sd = fold_weight_norm(_np(state_dict))
    d_model = sd["block.0.weight"].shape[0]
    strides = []
    i = 1
    while f"block.{i}.block.4.weight" in sd:
        strides.append(sd[f"block.{i}.block.4.weight"].shape[-1] // 2)
        i += 1
    return dict(
        d_model=d_model,
        strides=tuple(strides),
        out_channels=sd[f"block.{i + 1}.weight"].shape[0],
    )


def codec_decoder_kwargs_from_torch(state_dict) -> dict:
    """Infer CodecDecoder constructor kwargs from a reference state dict
    (either decoder variant; up_ratios recoverable from the transposed-conv
    kernel sizes, k = 2*stride)."""
    sd = fold_weight_norm(_np(state_dict))
    cb = sd["quantizer.quantizers.0.codebook.weight"]
    nq = 0
    while f"quantizer.quantizers.{nq}.codebook.weight" in sd:
        nq += 1
    common = dict(num_quantizers=nq, codebook_size=cb.shape[0],
                  codebook_dim=cb.shape[1])
    if "model.embed.weight" in sd:  # vocos variant
        nl = 0
        while f"model.convnext.{nl}.gamma" in sd:
            nl += 1
        return dict(
            in_channels=sd["model.embed.weight"].shape[1],
            vocos_dim=sd["model.embed.weight"].shape[0],
            vocos_intermediate_dim=sd["model.convnext.0.pwconv1.weight"].shape[0],
            vocos_num_layers=nl,
            **common,
        )
    ratios = []
    i = 1
    while f"model.{i}.block.1.weight" in sd:
        ratios.append(sd[f"model.{i}.block.1.weight"].shape[-1] // 2)
        i += 1
    return dict(
        in_channels=sd["model.0.weight"].shape[1],
        use_vocos=False,
        upsample_initial_channel=sd["model.0.weight"].shape[0],
        up_ratios=tuple(ratios),
        **common,
    )


def s2a_kwargs_from_torch(state_dict) -> dict:
    """Infer S2AConfig kwargs from a MaskGCT_S2A state dict.

    num_heads is NOT recoverable from [H, H] projections — callers keep
    their configured value (reference default 16, maskgct_s2a.py:42)."""
    sd = _np(state_dict)
    q = 0
    while f"token_emb.{q}.weight" in sd:
        q += 1
    nl = 0
    while f"diff_estimator.layers.{nl}.self_attn.q_proj.weight" in sd:
        nl += 1
    k, h = sd["token_emb.0.weight"].shape
    return dict(
        num_quantizers=q,
        hidden_size=h,
        num_layers=nl,
        codebook_size=k,
        cond_codebook_size=sd["cond_emb.weight"].shape[0],
    )


def repcodec_params_from_torch(state_dict) -> dict:
    """RepCodec state dict -> params for audio/repcodec.py RepCodec.

    Reference layout (repcodec_model.py:101-133): encoder/decoder are
    Sequential(VocosBackbone, Linear) -> keys ``encoder.0.*``/``encoder.1.*``;
    quantizer is the factorized ResidualVQ.
    """
    sd = fold_weight_norm(_np(state_dict))
    cb = sd["quantizer.quantizers.0.codebook.weight"]
    input_dim = sd["encoder.1.weight"].shape[0]
    return _as_jax(
        {
            "encoder": _vocos_backbone(sd, "encoder.0."),
            "enc_proj": _dense(sd, "encoder.1"),
            "quantizer": _rvq(sd, "quantizer.", input_dim, cb.shape[1]),
            "decoder": _vocos_backbone(sd, "decoder.0."),
            "dec_proj": _dense(sd, "decoder.1"),
        }
    )


def codec_encoder_params_from_torch(state_dict, num_blocks: int = 4) -> dict:
    """CodecEncoder state dict -> params for audio/acoustic.py CodecEncoder.

    Reference layout (acoustic/codec.py:152-168): one Sequential ``block``:
    [0]=WNConv1d k=7 in, [1..n]=EncoderBlock, [n+1]=Snake1d, [n+2]=WNConv1d
    k=3 out. EncoderBlock.block = [ResidualUnit x3, Snake1d, down-WNConv1d];
    ResidualUnit.block = [Snake1d, conv k=7 dilated, Snake1d, conv k=1].
    """
    sd = fold_weight_norm(_np(state_dict))

    def res_unit(p):
        return {
            "snake1": _snake(sd, f"{p}.block.0"),
            "conv1": _conv(sd, f"{p}.block.1"),
            "snake2": _snake(sd, f"{p}.block.2"),
            "conv2": _conv(sd, f"{p}.block.3"),
        }

    params = {"conv_in": _conv(sd, "block.0")}
    for i in range(num_blocks):
        b = f"block.{i + 1}.block"
        params[f"block_{i}"] = {
            "res1": res_unit(f"{b}.0"),
            "res2": res_unit(f"{b}.1"),
            "res3": res_unit(f"{b}.2"),
            "snake": _snake(sd, f"{b}.3"),
            "down": _conv(sd, f"{b}.4"),
        }
    params["snake_out"] = _snake(sd, f"block.{num_blocks + 1}")
    params["conv_out"] = _conv(sd, f"block.{num_blocks + 2}")
    return _as_jax(params)


def _conv_transpose(sd, p):
    """torch ConvTranspose1d [in,out,k] -> UpsampleConv {kernel [k,in,out]}.

    torch's transposed conv equals an input-dilated CORRELATION with the
    spatially flipped kernel, so the k axis is reversed here."""
    out = {"kernel": np.ascontiguousarray(sd[f"{p}.weight"].transpose(2, 0, 1)[::-1])}
    if f"{p}.bias" in sd:
        out["bias"] = sd[f"{p}.bias"]
    return out


def _conv_decoder(sd, prefix):
    """Reference conv decoder Sequential (codec.py:303-324) -> ConvDecoder."""

    def res_unit(p):
        return {
            "snake1": _snake(sd, f"{p}.block.0"),
            "conv1": _conv(sd, f"{p}.block.1"),
            "snake2": _snake(sd, f"{p}.block.2"),
            "conv2": _conv(sd, f"{p}.block.3"),
        }

    params = {"conv_in": _conv(sd, f"{prefix}0")}
    i = 1
    while f"{prefix}{i}.block.1.weight" in sd:
        b = f"{prefix}{i}.block"
        params[f"block_{i - 1}"] = {
            "snake": _snake(sd, f"{b}.0"),
            "up": _conv_transpose(sd, f"{b}.1"),
            "res1": res_unit(f"{b}.2"),
            "res2": res_unit(f"{b}.3"),
            "res3": res_unit(f"{b}.4"),
        }
        i += 1
    params["snake_out"] = _snake(sd, f"{prefix}{i}")
    params["conv_out"] = _conv(sd, f"{prefix}{i + 1}")
    return params


def codec_decoder_params_from_torch(state_dict) -> dict:
    """CodecDecoder state dict -> params for audio/acoustic.py CodecDecoder.

    Handles both decoder variants. For use_vocos=True the reference decode
    path stops at Vocos backbone hidden states (acoustic/codec.py:324-331;
    defect noted in SURVEY.md §7) so its checkpoints carry no waveform
    head — merge the returned tree over initialized params to keep this
    framework's trained ``head``:

        params["params"].update(converted["params"])   # quantizer + model

    The conv variant (use_vocos=False) converts completely (it ends in a
    waveform).
    """
    sd = fold_weight_norm(_np(state_dict))
    cb = sd["quantizer.quantizers.0.codebook.weight"]
    if "model.embed.weight" in sd:  # vocos variant
        input_dim = sd["model.embed.weight"].shape[1]
        model = _vocos_backbone(sd, "model.")
    else:
        input_dim = sd["model.0.weight"].shape[1]
        model = _conv_decoder(sd, "model.")
    return _as_jax(
        {
            "quantizer": _rvq(sd, "quantizer.", input_dim, cb.shape[1]),
            "model": model,
        }
    )


def _diffllama(sd: dict, prefix: str) -> dict:
    """DiffLlama/DiffLlamaPrefix weights under ``prefix`` -> NARDenoiser /
    PrefixNARDenoiser param tree (llama_nar.py:130,355). cond_mlp is
    optional (DiffLlamaPrefix with use_phone_cond=False has none)."""
    denoiser = {
        "t0": _dense(sd, f"{prefix}diff_step_mlp.0"),
        "t1": _dense(sd, f"{prefix}diff_step_mlp.2"),
        "final_norm": {"to_weight": _dense(sd, f"{prefix}norm.to_weight")},
    }
    if f"{prefix}cond_mlp.0.weight" in sd:
        denoiser["c0"] = _dense(sd, f"{prefix}cond_mlp.0")
        denoiser["c1"] = _dense(sd, f"{prefix}cond_mlp.2")
    i = 0
    while f"{prefix}layers.{i}.self_attn.q_proj.weight" in sd:
        L = f"{prefix}layers.{i}"
        qkv = np.concatenate(
            [
                sd[f"{L}.self_attn.q_proj.weight"].T,
                sd[f"{L}.self_attn.k_proj.weight"].T,
                sd[f"{L}.self_attn.v_proj.weight"].T,
            ],
            axis=1,
        )
        denoiser[f"layers_{i}"] = {
            "qkv": {"kernel": qkv},
            "out": {"kernel": sd[f"{L}.self_attn.o_proj.weight"].T},
            "gate": {"kernel": sd[f"{L}.mlp.gate_proj.weight"].T},
            "up": {"kernel": sd[f"{L}.mlp.up_proj.weight"].T},
            "down": {"kernel": sd[f"{L}.mlp.down_proj.weight"].T},
            "input_norm": {"to_weight": _dense(sd, f"{L}.input_layernorm.to_weight")},
            "post_attn_norm": {
                "to_weight": _dense(sd, f"{L}.post_attention_layernorm.to_weight")
            },
        }
        i += 1
    return denoiser


def diffllama_params_from_torch(state_dict, prefix: str = "") -> dict:
    """Standalone DiffLlama/DiffLlamaPrefix state dict -> denoiser params."""
    return _as_jax(_diffllama(_np(state_dict), prefix))


def s2a_params_from_torch(state_dict) -> dict:
    """MaskGCT_S2A state dict -> params for audio/s2a.py S2AModel.

    Reference layout (maskgct_s2a.py:112-135 + llama_nar.py:130-180):
    per-quantizer ``token_emb.{l}``/``to_logits.{l}`` modules (stacked here
    into [Q,...] arrays), ``mask_emb`` a 1-row Embedding (squeezed here), and
    the ``diff_estimator`` DiffLlama with HF-Llama q/k/v/o + gate/up/down
    projections (q/k/v fused into one ``qkv`` kernel here), adaptive
    RMSNorms (``to_weight`` Linear each), and cond/diff-step MLPs.
    """
    sd = _np(state_dict)

    q = 0
    while f"token_emb.{q}.weight" in sd:
        q += 1

    denoiser = _diffllama(sd, "diff_estimator.")
    return _as_jax(
        {
            "layer_emb": sd["layer_emb.weight"],
            "mask_emb": sd["mask_emb.weight"][0],
            "token_emb": np.stack([sd[f"token_emb.{l}.weight"] for l in range(q)]),
            "to_logits_w": np.stack(
                [sd[f"to_logits.{l}.weight"].T for l in range(q)]
            ),
            "to_logits_b": np.stack([sd[f"to_logits.{l}.bias"] for l in range(q)]),
            "cond_emb": sd["cond_emb.weight"],
            "denoiser": denoiser,
        }
    )
