"""Zero-shot TTS pipeline: text + prompt audio -> waveform, all on-device.

Counterpart of reference maskgct/full_inference.py (MaskGCTInference:14) +
the fork's intended LM-driven flow (SURVEY.md §3.4):

    prompt wav 16k --SemanticTokenizer--> prompt semantic tokens
    prompt wav 24k --AcousticCodec.tokenize--> prompt acoustic tokens
    [e_<BT>] text [e_<BA>] + prompt semantic  --decoder-LM-->  semantic tokens
    (prompt+generated semantic, prompt acoustic) --S2A reverse diffusion-->
        acoustic tokens --CodecDecoder--> waveform 24k

Unlike the reference (torch on host, no waveform head, NotImplementedError
data path), every stage here is a jitted JAX computation; text-in/audio-out
never leaves the device between stages.
"""

from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from maxtext_indextts2_tpu.audio.acoustic import AcousticCodec
from maxtext_indextts2_tpu.audio.s2a import S2AConfig, S2AModel
from maxtext_indextts2_tpu.audio.semantic_tokenizer import SemanticTokenizer
from maxtext_indextts2_tpu.config import Config
from maxtext_indextts2_tpu.infer.engine import Engine
from maxtext_indextts2_tpu.train.data.audio_iterator import _default_mapping
from maxtext_indextts2_tpu.train.data.tokenizer import build_tokenizer
from maxtext_indextts2_tpu.utils.dispatch_lock import device_dispatch
from maxtext_indextts2_tpu.vocab.mapping import AudioVocabMapping


def _roundup(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


@dataclasses.dataclass
class TTSPipeline:
    cfg: Config
    engine: Engine
    semantic_tokenizer: SemanticTokenizer
    s2a: S2AModel
    s2a_params: dict
    codec: AcousticCodec
    codec_params: dict
    mapping: AudioVocabMapping = None
    tokenizer=None

    def __post_init__(self):
        if self.mapping is None:
            self.mapping = _default_mapping(self.cfg)
        if self.tokenizer is None:
            self.tokenizer = build_tokenizer(self.cfg)
        self._e2a = self.mapping.embedding_to_audio_array(self.cfg.vocab_size)
        self._jit_s2a = jax.jit(
            lambda params, cond, prompt, rng: self.s2a.apply(
                params, cond, prompt, rng,
                method=self.s2a.reverse_diffusion,
                n_timesteps=tuple(self.cfg.s2a_timesteps)[: self.s2a.cfg.num_quantizers],
                cfg=self.cfg.s2a_cfg_scale,
                cfg_until=self.cfg.s2a_cfg_until,
            )
        )
        self._jit_s2a_masked = jax.jit(
            lambda params, cond, prompt, rng, x_mask, prompt_mask: self.s2a.apply(
                params, cond, prompt, rng,
                method=self.s2a.reverse_diffusion,
                n_timesteps=tuple(self.cfg.s2a_timesteps)[: self.s2a.cfg.num_quantizers],
                cfg=self.cfg.s2a_cfg_scale,
                cfg_until=self.cfg.s2a_cfg_until,
                x_mask=x_mask, prompt_mask=prompt_mask,
            )
        )
        self._jit_detok = jax.jit(
            lambda params, idx: self.codec.apply(params, idx, method=self.codec.detokenize)
        )
        # fused back-end: masked S2A sampling + vocoder decode in ONE XLA
        # program — one dispatch + one fetch per serving batch instead of
        # two (~40 ms/dispatch through a relay-attached host), and XLA can
        # overlap the vocoder's convs with the sampler's tail (VERDICT r4
        # item #5: the S2A+vocoder stage carried 67% of the measured
        # capacity mix)
        def _s2a_vocoder_impl(s2a_params, codec_params, cond, prompt, rng,
                              x_mask, prompt_mask):
            acoustic = self.s2a.apply(
                s2a_params, cond, prompt, rng,
                method=self.s2a.reverse_diffusion,
                n_timesteps=tuple(self.cfg.s2a_timesteps)[: self.s2a.cfg.num_quantizers],
                cfg=self.cfg.s2a_cfg_scale,
                cfg_until=self.cfg.s2a_cfg_until,
                x_mask=x_mask, prompt_mask=prompt_mask,
            )
            return self.codec.apply(
                codec_params, jnp.transpose(acoustic, (2, 0, 1)),
                method=self.codec.detokenize,
            )

        self._jit_s2a_vocoder = jax.jit(_s2a_vocoder_impl)
        self._jit_tok = jax.jit(
            lambda params, wav: self.codec.apply(params, wav, method=self.codec.tokenize)
        )

        # fused frontend: semantic tokenize + acoustic codec encode in ONE
        # XLA program — one dispatch + one host fetch per length bucket
        # instead of two dispatches + three fetches (each ~40 ms through a
        # relay-attached host; measured 31.5% of the closed-loop serving
        # pass before fusion, PERF.md round 4)
        def _frontend_impl(tok_params, codec_params, wav16, lens16, wav24):
            ids, feat_lengths = self.semantic_tokenizer._tokenize_impl(
                tok_params, wav16, lens16
            )
            ac = self.codec.apply(codec_params, wav24, method=self.codec.tokenize)
            return ids, feat_lengths, jnp.transpose(ac, (1, 2, 0))  # [B, P, Q]

        self._jit_frontend = jax.jit(_frontend_impl)

    # ------------------------------------------------------- weight porting
    def load_torch_audio_weights(
        self,
        s2a_state_dict=None,
        codec_encoder_state_dict=None,
        codec_decoder_state_dict=None,
        semantic_encoder_state_dict=None,
        semantic_repcodec_state_dict=None,
        semantic_stats=None,
    ):
        """Port reference torch checkpoints into the running pipeline.

        Accepts any subset of the reference's audio weight artifacts
        (converters in audio/torch_ckpt.py): the MaskGCT_S2A state dict, the
        acoustic CodecEncoder/CodecDecoder state dicts, and the semantic
        tokenizer trio (HF w2v-BERT state dict + RepCodec state dict +
        wav2vec2bert_stats.pt dict). The acoustic decoder's ISTFT head has no
        reference counterpart (the reference stops at backbone hidden
        states, SURVEY.md §7) and keeps its current params.
        """
        from maxtext_indextts2_tpu.audio import torch_ckpt as tc

        if s2a_state_dict is not None:
            got = tc.s2a_kwargs_from_torch(s2a_state_dict)
            want = dict(
                num_quantizers=self.s2a.cfg.num_quantizers,
                hidden_size=self.s2a.cfg.hidden_size,
                num_layers=self.s2a.cfg.num_layers,
                codebook_size=self.s2a.cfg.codebook_size,
                cond_codebook_size=self.s2a.cfg.cond_codebook_size,
            )
            if got != want:
                # flax silently IGNORES surplus per-layer params — a larger
                # checkpoint would run truncated and produce garbage
                raise ValueError(
                    f"S2A checkpoint dims {got} != configured {want}; set the "
                    "s2a_* config keys to match (cli synthesize infers them)"
                )
            p = tc.s2a_params_from_torch(s2a_state_dict)
            if self.s2a.cfg.int8_matmul == "offline":
                from maxtext_indextts2_tpu.audio.s2a import quantize_s2a_params

                t = 16
                init_args = (
                    jnp.zeros((1, t, self.s2a.cfg.num_quantizers), jnp.int32),
                    jnp.ones((1, t), jnp.int32),
                    jnp.zeros((1, t), jnp.int32),
                    jax.random.PRNGKey(0),
                )
                p = quantize_s2a_params(p, self.s2a, init_args)
            if self.s2a.cfg.int8_matmul:
                # bf16 residual stream halves the bytes the activation-quant
                # pass reads — measured -11% vs int8 alone (PERF.md queue)
                from maxtext_indextts2_tpu.audio.s2a import cast_denoiser_params

                p = cast_denoiser_params(p)
            self.s2a_params = p
        if codec_encoder_state_dict is not None:
            got = tc.codec_encoder_kwargs_from_torch(codec_encoder_state_dict)
            want = dict(d_model=self.codec.d_model,
                        strides=tuple(self.codec.strides),
                        out_channels=self.codec.latent_dim)
            if got != want:
                raise ValueError(
                    f"codec encoder checkpoint dims {got} != configured {want}"
                )
            enc = tc.codec_encoder_params_from_torch(
                codec_encoder_state_dict, num_blocks=len(self.codec.strides)
            )
            self.codec_params = {
                "params": {**self.codec_params["params"], "encoder": enc["params"]}
            }
        if codec_decoder_state_dict is not None:
            got = tc.codec_decoder_kwargs_from_torch(codec_decoder_state_dict)
            dc = self.codec.decoder if hasattr(self.codec, "decoder") else None
            want = dict(
                in_channels=self.codec.latent_dim,
                num_quantizers=self.codec.num_quantizers,
                codebook_size=self.codec.codebook_size,
                codebook_dim=dc.codebook_dim if dc is not None else got["codebook_dim"],
                vocos_dim=dc.vocos_dim if dc is not None else got["vocos_dim"],
                vocos_intermediate_dim=(
                    dc.vocos_intermediate_dim if dc is not None
                    else got["vocos_intermediate_dim"]
                ),
                vocos_num_layers=(
                    dc.vocos_num_layers if dc is not None else got["vocos_num_layers"]
                ),
            )
            if got != want:
                raise ValueError(
                    f"codec decoder checkpoint dims {got} != configured {want}"
                )
            dec = tc.codec_decoder_params_from_torch(codec_decoder_state_dict)
            merged = {**self.codec_params["params"]["decoder"], **dec["params"]}
            self.codec_params = {
                "params": {**self.codec_params["params"], "decoder": merged}
            }
        if semantic_encoder_state_dict is not None or semantic_repcodec_state_dict is not None:
            if semantic_encoder_state_dict is not None and semantic_repcodec_state_dict is not None:
                self.semantic_tokenizer.load_torch_weights(
                    semantic_encoder_state_dict,
                    semantic_repcodec_state_dict,
                    semantic_stats,
                )
            elif semantic_encoder_state_dict is not None:
                mean = std = None
                if semantic_stats is not None:
                    mean = np.asarray(semantic_stats["mean"], np.float32)
                    std = np.sqrt(np.asarray(semantic_stats["var"], np.float32))
                self.semantic_tokenizer.load_hf_encoder(
                    semantic_encoder_state_dict, mean, std
                )
            else:
                self.semantic_tokenizer.load_torch_repcodec(
                    semantic_repcodec_state_dict
                )
        if semantic_stats is not None and semantic_encoder_state_dict is None:
            # stats without encoder weights still apply to the current encoder
            self.semantic_tokenizer.set_stats(semantic_stats)

    # ------------------------------------------------------------ stages
    def text_and_prompt_to_lm_prompt(self, text: str, prompt_semantic: np.ndarray) -> np.ndarray:
        m = self.mapping
        ids = [m.audio_to_embedding(m.marker_bt_audio_id)]
        ids += [m.token_to_embedding(t) for t in self.tokenizer.encode(text)]
        ids += [m.audio_to_embedding(m.marker_ba_audio_id)]
        ids += [m.audio_to_embedding(int(a)) for a in prompt_semantic]
        return np.asarray(ids, np.int32)

    def map_semantic(
        self, out_embedding_ids: list[int], force_frames: bool = False
    ) -> list[int]:
        """LM embedding ids -> audio ids, stopping at the first non-audio.

        ``force_frames`` is a load-testing knob (benchmarks/tts_slo.py):
        non-audio ids are folded into the codebook instead of terminating,
        so every stream carries its full requested frame budget even with
        random LM weights — serving latency/throughput are shape-determined,
        and an untrained LM would otherwise emit a terminating id within a
        few tokens, making the measured load a fraction of the offered one.
        """
        audio_ids = []
        for e in out_embedding_ids:
            a = int(self._e2a[e]) if 0 <= e < len(self._e2a) else -1
            if a < 0 or a >= self.mapping.codebook_size:
                if not force_frames:
                    break  # EOS / non-audio token terminates generation
                a = abs(int(e)) % self.mapping.codebook_size
            audio_ids.append(a)
        return audio_ids

    def generate_semantic(self, lm_prompt: np.ndarray, max_new_tokens: int) -> list[int]:
        return self.map_semantic(self.engine.generate_stream(lm_prompt, max_new_tokens))

    # ------------------------------------------------------------ pipeline
    def synthesize(
        self,
        text: str,
        prompt_wav_16k: np.ndarray,
        prompt_wav_24k: np.ndarray,
        max_new_tokens: int = 256,
        rng: jax.Array | None = None,
    ) -> tuple[np.ndarray, dict]:
        """Returns (wav24k [T], timing/info dict)."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        t0 = time.perf_counter()

        sem_prompt, sem_len = self.semantic_tokenizer.tokenize(prompt_wav_16k[None])
        sem_prompt = np.asarray(sem_prompt)[0, : int(np.asarray(sem_len)[0])]

        ac_prompt = self._jit_tok(self.codec_params, jnp.asarray(prompt_wav_24k)[None])
        ac_prompt = jnp.transpose(ac_prompt, (1, 2, 0))  # [B, P, Q]

        lm_prompt = self.text_and_prompt_to_lm_prompt(text, sem_prompt)
        t1 = time.perf_counter()
        gen_semantic = self.generate_semantic(lm_prompt, max_new_tokens)
        t2 = time.perf_counter()

        # align prompt lengths: semantic tokens are 50 Hz, acoustic tokens 50 Hz
        p = min(ac_prompt.shape[1], len(sem_prompt))
        cond = jnp.concatenate(
            [jnp.asarray(sem_prompt[:p], jnp.int32), jnp.asarray(gen_semantic, jnp.int32)]
        )[None, :]
        acoustic = self._jit_s2a(self.s2a_params, cond, ac_prompt[:, :p], rng)
        t3 = time.perf_counter()

        wav = self._jit_detok(self.codec_params, jnp.transpose(acoustic, (2, 0, 1)))
        wav = np.asarray(wav[0])
        t4 = time.perf_counter()

        dur = len(wav) / 24_000.0
        info = {
            "semantic_tokens": len(gen_semantic),
            "audio_seconds": dur,
            "t_lm": t2 - t1,
            "t_s2a": t3 - t2,
            "t_vocoder": t4 - t3,
            "t_total": t4 - t0,
            "rtf": (t4 - t0) / max(dur, 1e-6),
        }
        return wav, info

    def synthesize_batch(
        self,
        requests: list[dict],
        rng: jax.Array | None = None,
        length_bucket: int = 64,
        generate_fn=None,
        pad_to_batch: int | None = None,
    ) -> list[tuple[np.ndarray, dict]]:
        """Batched synthesis of heterogeneous requests — ONE masked S2A pass.

        ``requests``: dicts with text, prompt_wav_16k, prompt_wav_24k and
        optional max_new_tokens. Requests are padded to shared (P, T)
        buckets (``length_bucket`` target tokens, so compile count stays
        bounded) and run through reverse_diffusion with per-row
        x_mask/prompt_mask; the vocoder decodes the batch and each wav is
        truncated to its row's true length. Batch-8 S2A is the measured
        serving operating point (PERF.md) — the per-request path runs S2A
        at batch 1, ~5x below it.

        ``generate_fn(lm_prompts, max_tokens) -> list[list[int]]`` overrides
        the LM stage (raw embedding ids) — the server passes an
        Orchestrator-backed one so the batch's generations share the
        continuous-batching decode slots instead of running serially.

        ``pad_to_batch`` pads the S2A/vocoder batch dimension with dummy
        rows (1 valid position) up to a fixed size so the sampler compiles
        for ONE batch shape regardless of how many requests the batching
        window collected — without it, every distinct arrival-batch size
        triggers a multi-minute sampler compile mid-serving.
        """
        t0 = time.perf_counter()
        sems, acs = self.frontend_batch(requests)
        t1 = time.perf_counter()
        lm_prompts = [
            self.text_and_prompt_to_lm_prompt(r["text"], sem)
            for r, sem in zip(requests, sems)
        ]
        mnts = [int(r.get("max_new_tokens", 256)) for r in requests]
        if generate_fn is None:
            with device_dispatch():
                outs = [self.engine.generate_stream(pr, m)
                        for pr, m in zip(lm_prompts, mnts)]
        else:
            outs = generate_fn(lm_prompts, mnts)
        gens = [
            self.map_semantic(o, force_frames=bool(r.get("force_frames")))
            for o, r in zip(outs, requests)
        ]
        t2 = time.perf_counter()
        return self.s2a_vocoder_batch(
            requests, sems, acs, gens, rng=rng, length_bucket=length_bucket,
            pad_to_batch=pad_to_batch,
            timings={"t_frontend": t1 - t0, "t_lm": t2 - t1, "t_start": t0},
        )

    def frontend_batch(
        self, requests: list[dict], pad_to_batch: int | None = None
    ) -> tuple[list[np.ndarray], list[np.ndarray]]:
        """Stage 0 (device): prompt wavs -> (semantic tokens, acoustic
        tokens) per request. Split out so the serving batcher can run it as
        a device-loop thunk (infer/server.py Orchestrator.run_on_loop).

        BATCHED: requests are bucketed by wav length padded to 0.5 s
        multiples, and each bucket runs ONE semantic-tokenize dispatch
        (per-row true lengths drive the conformer pad mask) and ONE
        codec-encode dispatch (rows sliced to their true frame count). The
        per-request loop cost 2 dispatches per request — measured 52% of
        the whole closed-loop serving pass through a ~40 ms/dispatch relay
        (PERF.md round 4). Rows whose length is not an exact bucket
        multiple see zero-padding inside the codec convs' tail receptive
        field; their last 1-2 prompt frames can differ marginally from the
        per-request result (the S2A prompt conditioning is insensitive to
        this; bucket-exact rows are bit-identical)."""
        n = len(requests)
        w16s = [np.asarray(r["prompt_wav_16k"], np.float32) for r in requests]
        w24s = [np.asarray(r["prompt_wav_24k"], np.float32) for r in requests]
        hop = int(np.prod(self.codec.strides))
        sems: list[np.ndarray | None] = [None] * n
        acs: list[np.ndarray | None] = [None] * n

        def bucket(t: int, rate: int) -> int:
            step = rate // 2
            return max(step, -(-t // step) * step)

        groups: dict[tuple[int, int], list[int]] = {}
        for i in range(n):
            key = (bucket(len(w16s[i]), 16_000), bucket(len(w24s[i]), 24_000))
            groups.setdefault(key, []).append(i)

        with device_dispatch():
            for (l16, l24), idx in groups.items():
                # batch dim padded to a power of two (or straight to
                # ``pad_to_batch`` — the serving batcher passes its window
                # max so ONE executable covers every arrival-batch size):
                # a mid-serving frontend compile costs ~45 s through the
                # relay and showed up as 29% of the first measured capacity
                # windows (PERF.md round 4)
                bp = 1
                while bp < len(idx):
                    bp *= 2
                if pad_to_batch is not None:
                    bp = max(bp, pad_to_batch)
                wav16 = np.zeros((bp, l16), np.float32)
                lens = np.full(bp, l16, np.int32)
                wav24 = np.zeros((bp, l24), np.float32)
                for j, i in enumerate(idx):
                    wav16[j, : len(w16s[i])] = w16s[i]
                    lens[j] = len(w16s[i])
                    wav24[j, : len(w24s[i])] = w24s[i]
                # one dispatch, one fetch
                sem, sem_len, ac = jax.device_get(self._jit_frontend(
                    self.semantic_tokenizer.params, self.codec_params,
                    jnp.asarray(wav16), jnp.asarray(lens), jnp.asarray(wav24),
                ))
                for j, i in enumerate(idx):
                    sems[i] = sem[j, : int(sem_len[j])]
                    acs[i] = ac[j, : len(w24s[i]) // hop]
        return sems, acs

    def s2a_vocoder_batch(
        self,
        requests: list[dict],
        sems: list[np.ndarray],
        acs: list[np.ndarray],
        gens: list[list[int]],
        rng: jax.Array | None = None,
        length_bucket: int = 64,
        pad_to_batch: int | None = None,
        timings: dict | None = None,
    ) -> list[tuple[np.ndarray, dict]]:
        """Stages 2+3 (device): batched masked S2A pass + vocoder decode,
        with per-row padding to shared (P, T) buckets. See synthesize_batch
        for the contract; split out for the device-loop serving path."""
        hop = int(np.prod(self.codec.strides))
        t2 = time.perf_counter()
        b = len(requests)
        bp = max(b, pad_to_batch or 0)
        q = self.s2a.cfg.num_quantizers
        p_rows = [min(a.shape[0], len(s)) for a, s in zip(acs, sems)]
        t_rows = [len(g) for g in gens]
        pb = max(_roundup(max(p_rows), 16), 16)
        tb = max(_roundup(max(max(t_rows), 1), length_bucket), length_bucket)

        cond = np.zeros((bp, pb + tb), np.int32)
        prompt = np.zeros((bp, pb, q), np.int32)
        x_mask = np.zeros((bp, tb), np.int32)
        p_mask = np.zeros((bp, pb), np.int32)
        for i, (sem, ac, gen) in enumerate(zip(sems, acs, gens)):
            p_i, t_i = p_rows[i], t_rows[i]
            cond[i, :p_i] = sem[:p_i]
            cond[i, pb:pb + t_i] = gen
            prompt[i, :p_i] = np.asarray(ac)[:p_i]
            p_mask[i, :p_i] = 1
            x_mask[i, :t_i] = 1
        # dummy rows: one valid prompt/target position keeps the per-row
        # re-masking counts non-degenerate; outputs are dropped below
        x_mask[b:, 0] = 1
        p_mask[b:, 0] = 1

        with device_dispatch():
            # PRNGKey is itself a device computation — keep it on the
            # device thread/lock too
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            # ONE fused dispatch: sampler + vocoder (t_s2a below carries the
            # fused time; t_vocoder is 0 by construction)
            wavs = np.asarray(self._jit_s2a_vocoder(
                self.s2a_params, self.codec_params, jnp.asarray(cond),
                jnp.asarray(prompt), rng,
                jnp.asarray(x_mask), jnp.asarray(p_mask),
            ))
        t3 = t4 = time.perf_counter()

        timings = timings or {}
        t0 = timings.get("t_start", t2)
        out = []
        for i, t_i in enumerate(t_rows):
            wav = wavs[i, : t_i * hop]
            dur = len(wav) / 24_000.0
            out.append((wav, {
                "semantic_tokens": t_i,
                "audio_seconds": dur,
                "batch": b,
                "t_frontend": timings.get("t_frontend", 0.0),
                "t_lm": timings.get("t_lm", 0.0),
                "t_s2a": t3 - t2,
                "t_vocoder": t4 - t3,
                "t_total": t4 - t0,
                "batch_rtf": (t4 - t0) / max(sum(t_rows) / 50.0, 1e-6),
            }))
        return out


def build_tiny_pipeline(
    cfg: Config,
    rng: jax.Array | None = None,
    codec_kwargs: dict | None = None,
    semantic_encoder_cfg=None,
    semantic_repcodec_kwargs: dict | None = None,
) -> TTSPipeline:
    """Randomly-initialized pipeline (tests / benches before real weights).

    The optional kwargs size individual stages to match external checkpoints
    (cli synthesize infers them from torch state dicts); defaults stay tiny.
    """
    from maxtext_indextts2_tpu.audio.conformer import ConformerConfig

    rng = rng if rng is not None else jax.random.PRNGKey(0)
    engine = Engine(cfg)
    engine.load_params()

    st = SemanticTokenizer(
        encoder_cfg=semantic_encoder_cfg or ConformerConfig(
            hidden_size=cfg.s2a_hidden_size // 4 if cfg.s2a_hidden_size >= 256 else 64,
            num_layers=2, num_heads=4, intermediate_size=256, output_layer=2,
        ),
        repcodec_kwargs=semantic_repcodec_kwargs or dict(
            codebook_size=cfg.semantic_codebook_size,
            vocos_dim=64, vocos_intermediate_dim=128, vocos_num_layers=2,
        ),
    )
    st.init_params()

    from maxtext_indextts2_tpu.audio.s2a import (
        cast_denoiser_params, quantize_s2a_params, serving_s2a_config,
    )

    s2a_cfg = S2AConfig(
        num_quantizers=cfg.s2a_num_quantizers,
        hidden_size=cfg.s2a_hidden_size,
        num_layers=cfg.s2a_num_layers,
        num_heads=cfg.s2a_num_heads,
        codebook_size=cfg.s2a_codebook_size,
        cond_codebook_size=cfg.s2a_cond_codebook_size,
    )
    serve_cfg = serving_s2a_config(s2a_cfg, cfg.s2a_serving_dtype)
    s2a = S2AModel(serve_cfg)
    t = 16
    r1, r2 = jax.random.split(rng)
    init_args = (
        jnp.zeros((1, t, s2a_cfg.num_quantizers), jnp.int32),
        jnp.ones((1, t), jnp.int32),
        jnp.zeros((1, t), jnp.int32),
        r2,
    )
    # init (or restore) the float tree, then convert for the serving mode
    s2a_params = S2AModel(dataclasses.replace(serve_cfg, int8_matmul=False)).init(
        r1, *init_args
    )
    if serve_cfg.int8_matmul == "offline":
        s2a_params = quantize_s2a_params(s2a_params, s2a, init_args)
    if serve_cfg.int8_matmul:
        # bf16 residual stream: measured-best int8 combo (PERF.md queue)
        s2a_params = cast_denoiser_params(s2a_params)

    codec = AcousticCodec(**(codec_kwargs or dict(
        d_model=32, latent_dim=64,
        num_quantizers=cfg.s2a_num_quantizers,
        codebook_size=cfg.s2a_codebook_size,
        vocos_dim=64, vocos_intermediate_dim=128, vocos_num_layers=2,
    )))
    wav_len = int(np.prod(codec.strides)) * 2  # two latent frames
    codec_params = codec.init(r2, jnp.zeros((1, wav_len)))

    return TTSPipeline(
        cfg=cfg, engine=engine, semantic_tokenizer=st,
        s2a=s2a, s2a_params=s2a_params, codec=codec, codec_params=codec_params,
    )
