"""Inference engine: prefill / insert / generate continuous-batching slots.

TPU-native counterpart of the reference's MaxEngine
(MaxText/maxengine.py:100: prefill:533, insert:1166, generate:838,
init_decode_state:1370). All three phases are separate jitted programs with
donated decode state; the decode state is a pytree:

    {"cache": <per-layer KV pytree, batch dim = num_slots>,
     "tokens": [slots] int32 last sampled token,
     "pos": [slots] int32 next position,
     "active": [slots] bool}

Slot semantics: `prefill` runs the model over one prompt (padded to a
bucket), returning a prefix (cache with batch=1 + first token); `insert`
copies that prefix into slot i of the decode state; `generate` advances every
active slot one token. This is exactly the JetStream-style engine loop the
reference serves with, minus the gRPC scaffolding (see infer/server.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from maxtext_indextts2_tpu.config import Config
from maxtext_indextts2_tpu.infer.sampling import sample_tokens
from maxtext_indextts2_tpu.models import (
    MODE_AUTOREGRESSIVE,
    MODE_PREFILL,
    Transformer,
)
from maxtext_indextts2_tpu.parallel import create_device_mesh, tree_logical_to_sharding


def unroll_scanned_params(params):
    """Split scan-stacked layer params ({"layers": leaves [L, ...]}) into the
    unrolled module layout ({"layers_0": ...}, inverse of nn.scan's param
    stacking). Region names match models/decoder.py _run_region."""
    regions = ("layers", "dense_layers", "moe_layers")

    def walk(node):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            if k in regions and isinstance(v, dict) and jax.tree.leaves(v):
                n_layers = jax.tree.leaves(v)[0].shape[0]
                for i in range(n_layers):
                    out[f"{k}_{i}"] = jax.tree.map(lambda x, _i=i: x[_i], v)
            else:
                out[k] = walk(v)
        return out

    return walk(params)


def stack_unrolled_params(params):
    """Inverse of unroll_scanned_params: gather per-layer {"layers_0", ...}
    subtrees into the scan-stacked layout ({"layers": leaves [L, ...]})."""
    regions = ("layers", "dense_layers", "moe_layers")

    def walk(node):
        if not isinstance(node, dict):
            return node
        out = {}
        groups: dict[str, dict[int, dict]] = {}
        for k, v in node.items():
            base, _, idx = k.rpartition("_")
            if base in regions and idx.isdigit():
                groups.setdefault(base, {})[int(idx)] = v
            else:
                out[k] = walk(v)
        for base, items in groups.items():
            ordered = [items[i] for i in range(len(items))]
            out[base] = jax.tree.map(lambda *xs: jnp.stack(xs), *ordered)
        return out

    return walk(params)


class Engine:
    def __init__(self, cfg: Config, mesh=None, model: Transformer | None = None, params=None):
        # Decode with unrolled layers (each layer's KV cache a separate
        # in-place buffer): scanned decode spends more on per-layer cache
        # dynamic-slice/copy/update than on its matmuls (PERF.md anatomy).
        # Only auto-unroll when we own model+params construction; scanned
        # checkpoints are unstacked at load_params time.
        unroll = (
            model is None and params is None
            and cfg.scan_layers and cfg.serve_unroll_layers
        )
        if unroll:
            import dataclasses

            cfg = dataclasses.replace(cfg, scan_layers=False)
        # scan-stacked on disk: training checkpoints follow cfg.scan_layers;
        # quantized serving checkpoints (tools/quantize_checkpoint.py) are
        # written from an engine and already carry the engine's layout
        self._ckpt_scanned = unroll and not cfg.checkpoint_is_quantized
        if cfg.paged_attention:
            # _insert_paged scatters the dense [1, S, nkv, d] prefill KV into
            # the page pool: scanned ([L, ...]) layouts and int8-quantized
            # caches (codes + separate scale leaves) have no scatter path.
            assert not cfg.scan_layers, (
                "paged_attention=true requires scan_layers=false "
                "(per-layer page pools; scanned caches carry a leading layer "
                "axis the page scatter cannot address)"
            )
            assert not cfg.quantize_kvcache, (
                "paged_attention=true is incompatible with quantize_kvcache "
                "(the page pool stores raw KV; int8 codes + scales would be "
                "scattered without dequantization)"
            )
        if (cfg.ici_context_autoregressive_parallelism > 1
                or cfg.dcn_context_autoregressive_parallelism > 1):
            # Sequence-sharded KV cache (cache_sequence ->
            # context_autoregressive, parallel/sharding.py): only the XLA
            # dot_product decode path supports it — GSPMD partitions the
            # attention contraction over the sequence shards and inserts
            # the softmax collectives. The Pallas ragged/bucketed/paged
            # decode kernels run under shard_map with each device holding a
            # slot's FULL cache and cannot read a sequence-sharded buffer.
            # (Reference axis: base.yml:318,405,417 context_autoregressive.)
            assert cfg.decode_attention == "dot_product", (
                "ici/dcn_context_autoregressive_parallelism > 1 requires "
                f"decode_attention=dot_product, got {cfg.decode_attention!r}"
            )
            assert not cfg.paged_attention, (
                "context_autoregressive parallelism is incompatible with "
                "paged_attention (page pool is not sequence-sharded)"
            )
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else create_device_mesh(cfg)
        self.model = model or Transformer(cfg=cfg, mesh=self.mesh)
        self.params = params
        self.num_slots = int(cfg.per_device_batch_size * cfg.num_devices)
        self.rng = jax.random.PRNGKey(cfg.seed)
        self._p_prefill = None
        self._p_prefill_chunk = None
        self._p_prefill_insert = {}
        self._p_generate = None
        self._p_generate_n = {}
        self._p_insert = None
        self._p_release = None
        self._p_release_many = None

    # ------------------------------------------------------------- params
    def param_shardings(self):
        """Shardings of this engine's param tree on ITS mesh (unboxed).

        Used by cross-mesh weight movement (train mesh -> inference mesh):
        device_put-ing a train-state param tree onto these shardings is the
        framework's stand-in for the reference's pathways_reshard
        (experimental/rl/grpo_utils.py:154)."""
        import flax.linen as nn

        cfg = self.cfg
        rng = jax.random.PRNGKey(cfg.init_weights_seed)
        dummy = jnp.zeros((1, cfg.max_prefill_predict_length), jnp.int32)
        abstract = jax.eval_shape(
            lambda r: self.model.init(r, dummy, dummy, dummy)["params"], rng
        )
        return nn.meta.unbox(
            tree_logical_to_sharding(nn.get_partition_spec(abstract), self.mesh)
        )

    def load_params(self, path: str | None = None, cast_dtype=None):
        """Restore params-only checkpoint, or random-init when absent.

        cast_dtype: cast weights for serving (bf16 halves HBM reads per decode
        step vs f32 masters; reference quantize_params:318 goes further to
        int8 via AQT conversion)."""
        cfg = self.cfg
        serve_quant = (
            cfg.quantization == "int8w_serve" and not cfg.checkpoint_is_quantized
        )
        if serve_quant:
            # checkpoints are float: load/init through an unquantized twin,
            # then convert into the int8+scale serving structure.
            import dataclasses as _dc

            cfg = _dc.replace(cfg, quantization="")
            model = Transformer(cfg=cfg, mesh=self.mesh)
        else:
            model = self.model
        rng = jax.random.PRNGKey(cfg.init_weights_seed)
        dummy = jnp.zeros((1, cfg.max_prefill_predict_length), jnp.int32)

        def init_fn(rng):
            return model.init(rng, dummy, dummy, dummy)["params"]

        import flax.linen as nn

        abstract = jax.eval_shape(init_fn, rng)
        shardings = tree_logical_to_sharding(nn.get_partition_spec(abstract), self.mesh)
        path = path or cfg.load_parameters_path
        if path:
            from maxtext_indextts2_tpu.train.checkpointing import (
                load_params_only,
                params_checkpoint_is_scanned,
            )

            # compare the engine's module layout with the on-disk layout and
            # convert when they differ (either direction). Detection reads
            # the Orbax tree metadata; if it cannot tell, fall back to the
            # convention that float checkpoints use the training layout.
            module_scanned = cfg.scan_layers
            on_disk = params_checkpoint_is_scanned(path)
            ckpt_scanned = (
                (self._ckpt_scanned or module_scanned) if on_disk is None else on_disk
            )
            convert = None
            if ckpt_scanned != module_scanned:
                # restore through a twin in the checkpoint's layout, then
                # convert into the engine's (keeping the module shardings)
                import dataclasses as _dc

                module_shardings = shardings
                twin = Transformer(
                    cfg=_dc.replace(cfg, scan_layers=ckpt_scanned), mesh=self.mesh
                )
                abstract = jax.eval_shape(
                    lambda r: twin.init(r, dummy, dummy, dummy)["params"], rng
                )
                shardings = tree_logical_to_sharding(
                    nn.get_partition_spec(abstract), self.mesh
                )
                convert = (
                    unroll_scanned_params if ckpt_scanned else stack_unrolled_params
                )
            abstract_unboxed = nn.meta.unbox(abstract)
            target = jax.tree.map(
                lambda x, s: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s),
                abstract_unboxed,
                nn.meta.unbox(shardings),
            )
            self.params = load_params_only(path, target)
            if convert is not None:
                with self.mesh:
                    self.params = jax.jit(
                        convert,
                        out_shardings=nn.meta.unbox(module_shardings),
                    )(self.params)
        else:
            with self.mesh:
                self.params = nn.meta.unbox(
                    jax.jit(init_fn, out_shardings=shardings)(rng)
                )
        if serve_quant:
            from maxtext_indextts2_tpu.ops.quantization import (
                quantize_params_for_serving,
            )

            abstract_q = nn.meta.unbox(
                jax.eval_shape(
                    lambda r: self.model.init(r, dummy, dummy, dummy)["params"],
                    rng,
                )
            )
            with self.mesh:
                self.params = quantize_params_for_serving(self.params, abstract_q)
        if cast_dtype is None and self.cfg.serve_params_dtype:
            cast_dtype = jnp.dtype(self.cfg.serve_params_dtype)
        if cast_dtype is not None:
            self.params = jax.tree_util.tree_map_with_path(
                lambda p, x: x
                if (not hasattr(x, "dtype") or x.dtype != jnp.float32
                    or any("scale" in str(k) for k in p))  # keep quant scales f32
                else x.astype(cast_dtype),
                self.params,
            )
        return self.params

    def aot_compile(self):
        """AOT-compile prefill + generate against abstract inputs (reference:
        maxengine.py:197 aot_compile). Returns {name: compiled} — inspect
        .memory_analysis(), serialize, or call directly."""
        cfg = self.cfg
        if self.params is None:
            self.load_params()
        p = cfg.max_prefill_predict_length
        prefill_ab = (
            self.params,
            jax.ShapeDtypeStruct((1, p), jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
            jax.ShapeDtypeStruct((2,), jnp.uint32),
        )
        compiled = {}
        with self.mesh:
            compiled["prefill"] = (
                jax.jit(self._prefill_impl).lower(*prefill_ab).compile()
            )
            state_ab = jax.eval_shape(self.init_decode_state)
            compiled["generate"] = (
                jax.jit(self._generate_impl, donate_argnums=(1,))
                .lower(self.params, state_ab, jax.ShapeDtypeStruct((2,), jnp.uint32))
                .compile()
            )
        return compiled

    # ------------------------------------------------------------- prefill
    def _prefill_impl(self, params, tokens, true_length, rng,
                      vision_embeddings=None):
        """tokens: [1, P] padded prompt; true_length: [1];
        vision_embeddings: [1, T_img, E] soft tokens fused at
        cfg.image_token_id positions (multimodal serving)."""
        cfg = self.cfg
        p = tokens.shape[1]
        positions = jnp.broadcast_to(jnp.arange(p, dtype=jnp.int32)[None, :], tokens.shape)
        segs = (jnp.arange(p, dtype=jnp.int32)[None, :] < true_length[:, None]).astype(jnp.int32)
        logits, vars_ = self.model.apply(
            {"params": params},
            tokens,
            positions,
            segs,
            mode=MODE_PREFILL,
            mutable=["cache"],
            vision_embeddings=vision_embeddings,
        )
        last = jnp.take_along_axis(
            logits, (true_length - 1)[:, None, None].astype(jnp.int32), axis=1
        )[:, 0]  # [1, V]
        first_token = sample_tokens(
            last, rng, cfg.decode_sampling_strategy,
            cfg.decode_sampling_temperature, cfg.decode_sampling_top_k,
            cfg.decode_sampling_nucleus_p,
        )
        prefix = {
            "cache": vars_["cache"],
            "token": first_token,
            "pos": true_length,
            "logits": last,
        }
        return prefix, first_token

    def refresh_decode(self):
        """Drop cached decode-path executables (generate/generate_n/insert/
        release) so the next call loads fresh ones — same rationale as
        refresh_prefill: after a runtime blip a LOADED executable can keep
        erroring while freshly loaded programs work."""
        self._p_generate = None
        self._p_generate_n = {}
        self._p_insert = None
        self._p_release = None
        self._p_release_many = None
        self._p_prefill_insert = {}

    def refresh_prefill(self):
        """Drop cached prefill executables so the next call re-jits.

        Relay-failure recovery: a wedged runtime channel can leave one loaded
        executable persistently erroring ('TPU backend error (Internal)')
        while every other program on the chip keeps working — observed in
        the full-pipeline serving bench (decode + S2A fine, prefill dead).
        Re-jitting loads a fresh executable; the persistent compile cache
        makes it cheap."""
        self._p_prefill = None
        self._p_prefill_chunk = None
        self._p_prefill_insert = {}

    def prefill(self, tokens: np.ndarray, true_length: int,
                vision_embeddings=None):
        """Host API: pad to the prefill bucket and run the jitted prefill."""
        cfg = self.cfg
        if self._p_prefill is None:
            self._p_prefill = jax.jit(self._prefill_impl)
        p = cfg.max_prefill_predict_length
        padded = np.zeros((1, p), np.int32)
        padded[0, :true_length] = tokens[:true_length]
        self.rng, rng = jax.random.split(self.rng)
        if vision_embeddings is not None:
            with self.mesh:
                return self._p_prefill(
                    self.params, jnp.asarray(padded),
                    jnp.asarray([true_length], jnp.int32), rng,
                    jnp.asarray(vision_embeddings),
                )
        with self.mesh:
            return self._p_prefill(
                self.params, jnp.asarray(padded), jnp.asarray([true_length], jnp.int32), rng
            )

    def prefill_multisampling(self, tokens: np.ndarray, true_length: int,
                              num_samples: int):
        """One prefill, N independently-sampled first tokens (reference:
        maxengine.py:595 prefill_multisampling). The cache prefix is shared;
        each sample can then be inserted into its own slot."""
        prefix, _ = self.prefill(tokens, true_length)
        self.rng, rng = jax.random.split(self.rng)
        cfg = self.cfg
        logits = jnp.broadcast_to(
            prefix["logits"], (num_samples,) + prefix["logits"].shape[1:]
        )
        toks = sample_tokens(
            logits, rng, cfg.decode_sampling_strategy,
            cfg.decode_sampling_temperature, cfg.decode_sampling_top_k,
            cfg.decode_sampling_nucleus_p,
        )
        return prefix, np.asarray(toks)

    def load_lora_adapter(self, lora_params, alpha: float = 16.0):
        """Merge a LoRA adapter into the loaded base params (reference:
        maxengine.py:282-317 LoRA adapter loading). Adapter leaves mirror the
        params tree with `lora_a` [in, r] / `lora_b` [r, out] under the same
        module path as each adapted kernel; merged as
        w += (a @ b) * alpha / r reshaped to the kernel's shape."""
        assert self.params is not None, "load_params first"

        def merge(node, lora):
            if not isinstance(node, dict):
                return node
            has_adapter = (
                isinstance(lora, dict) and "lora_a" in lora and "lora_b" in lora
            )
            out = {}
            for k, v in node.items():
                if k == "kernel" and has_adapter:
                    a, b = lora["lora_a"], lora["lora_b"]
                    r = a.shape[-1]
                    delta = (a @ b) * (alpha / r)
                    out[k] = v + delta.reshape(v.shape).astype(v.dtype)
                else:
                    sub = lora.get(k, {}) if isinstance(lora, dict) else {}
                    out[k] = merge(v, sub)
            return out

        self.params = merge(self.params, lora_params)
        return self.params

    def prefill_concat(self, prompts: list[np.ndarray]):
        """Packed multi-prompt prefill: several short prompts share ONE
        prefill call via sequence packing (segment ids + restarted
        positions), then each prompt's KV span is sliced out into its own
        prefix (reference: maxengine.py:719 prefill_concat +
        prefill_packing.py). Returns a list of (prefix, first_token)."""
        cfg = self.cfg
        p = cfg.max_prefill_predict_length
        lengths = [len(t) for t in prompts]
        assert sum(lengths) <= p, f"prompts ({sum(lengths)}) exceed bucket {p}"

        inputs = np.zeros((1, p), np.int32)
        positions = np.zeros((1, p), np.int32)
        segs = np.zeros((1, p), np.int32)
        starts = []
        off = 0
        for i, t in enumerate(prompts):
            n = len(t)
            starts.append(off)
            inputs[0, off : off + n] = t
            positions[0, off : off + n] = np.arange(n)
            segs[0, off : off + n] = i + 1
            off += n

        logits, vars_ = self.model.apply(
            {"params": self.params},
            jnp.asarray(inputs), jnp.asarray(positions), jnp.asarray(segs),
            mode=MODE_PREFILL, mutable=["cache"],
        )
        cache = vars_["cache"]

        out = []
        self.rng, rng = jax.random.split(self.rng)
        for i, (start, length) in enumerate(zip(starts, lengths)):
            prefix_cache = jax.tree_util.tree_map_with_path(
                lambda path, leaf, s=start, ln=length: self._extract_prefix_leaf(
                    path, leaf, s, ln
                ),
                cache,
            )
            last = logits[:, start + length - 1]
            tok = sample_tokens(
                last, jax.random.fold_in(rng, i), cfg.decode_sampling_strategy,
                cfg.decode_sampling_temperature, cfg.decode_sampling_top_k,
                cfg.decode_sampling_nucleus_p,
            )
            out.append((
                {"cache": prefix_cache, "token": tok,
                 "pos": jnp.asarray([length], jnp.int32), "logits": last},
                tok,
            ))
        return out

    @staticmethod
    def _extract_prefix_leaf(leaf_path, leaf, start, length):
        """Slice one packed prompt's span out of a packed-prefill cache leaf:
        shift the span to position 0 and zero the rest. `start`/`length` may
        be traced (used inside the fused admission program)."""
        name = leaf_path[-1].key if hasattr(leaf_path[-1], "key") else str(leaf_path[-1])
        ndim = leaf.ndim
        if name in ("cached_key", "cached_value"):
            seq_axis = ndim - 3
        elif name == "cached_segment_ids":
            seq_axis = ndim - 1
        elif name == "cache_index":
            return jnp.full(leaf.shape, length, jnp.int32)
        else:
            return leaf
        rolled = jnp.roll(leaf, -start, axis=seq_axis)
        idx = jnp.arange(leaf.shape[seq_axis])
        keep = idx < length
        shape = [1] * ndim
        shape[seq_axis] = -1
        return jnp.where(keep.reshape(shape), rolled, jnp.zeros_like(rolled))

    def _prefill_insert_impl(self, params, decode_state, inputs, positions,
                             segs, starts, lengths, slots, rng):
        """Fused admission: ONE XLA program that prefills k packed prompts,
        extracts each prompt's prefix, inserts it into its decode slot, and
        samples each first token. inputs/positions/segs are [1, P] packed
        (segment ids 1..k); starts/lengths/slots are [k] (k static per
        compile). Returns (new_decode_state, first_tokens [k])."""
        cfg = self.cfg
        k = starts.shape[0]
        logits, vars_ = self.model.apply(
            {"params": params}, inputs, positions, segs,
            mode=MODE_PREFILL, mutable=["cache"],
        )
        cache = vars_["cache"]
        state = decode_state
        toks = []
        for i in range(k):
            start, length = starts[i], lengths[i]
            prefix_cache = jax.tree_util.tree_map_with_path(
                lambda path, leaf: self._extract_prefix_leaf(
                    path, leaf, start, length
                ),
                cache,
            )
            last = jnp.take_along_axis(
                logits, (start + length - 1)[None, None, None].astype(jnp.int32),
                axis=1,
            )[:, 0]  # [1, V]
            tok = sample_tokens(
                last, jax.random.fold_in(rng, i), cfg.decode_sampling_strategy,
                cfg.decode_sampling_temperature, cfg.decode_sampling_top_k,
                cfg.decode_sampling_nucleus_p,
            )
            prefix = {
                "cache": prefix_cache,
                "token": tok,
                "pos": jnp.reshape(length, (1,)).astype(jnp.int32),
            }
            state = self._insert_impl(state, prefix, slots[i])
            toks.append(tok[0])
        return state, jnp.stack(toks)

    def prefill_insert_many(self, decode_state, prompts: list[np.ndarray],
                            slots: list[int], bucket: int | None = None):
        """Host API for fused admission (continuous-batching steady state):
        pack k short prompts into one prefill bucket and run prefill +
        k-way prefix extraction + k slot insertions as ONE device dispatch.

        The unfused path costs 2k dispatches (prefill + insert per stream) —
        through a relay-attached host at ~40 ms/dispatch, admitting 8
        streams costs ~0.7 s of dispatch overhead alone; fused it is one.
        Reference capability anchor: prefill_packing.py BatchedPrefillProcessor
        (packs prompts) — this additionally fuses the inserts, which the
        reference issues separately.

        Compiles once per (k, packed-length bucket) — callers should bucket
        group sizes AND pass a power-of-two ``bucket`` so a lone short
        prompt is not padded to the full max_prefill_predict_length (at
        trickle arrival rates that padding waste dominated admission cost —
        round-5 soak). Returns (new_decode_state, first_tokens [k] on
        device). decode_state is donated."""
        cfg = self.cfg
        p = bucket or cfg.max_prefill_predict_length
        assert p <= cfg.max_prefill_predict_length, (p, cfg.max_prefill_predict_length)
        k = len(prompts)
        assert k == len(slots) and k >= 1
        lengths = [len(t) for t in prompts]
        assert sum(lengths) <= p, f"prompts ({sum(lengths)}) exceed bucket {p}"

        inputs = np.zeros((1, p), np.int32)
        positions = np.zeros((1, p), np.int32)
        segs = np.zeros((1, p), np.int32)
        starts = []
        off = 0
        for i, t in enumerate(prompts):
            n = len(t)
            starts.append(off)
            inputs[0, off:off + n] = t
            positions[0, off:off + n] = np.arange(n)
            segs[0, off:off + n] = i + 1
            off += n

        if k not in self._p_prefill_insert:
            self._p_prefill_insert[k] = jax.jit(
                self._prefill_insert_impl, donate_argnums=(1,)
            )
        self.rng, rng = jax.random.split(self.rng)
        with self.mesh:
            return self._p_prefill_insert[k](
                self.params, decode_state, jnp.asarray(inputs),
                jnp.asarray(positions), jnp.asarray(segs),
                jnp.asarray(starts, jnp.int32), jnp.asarray(lengths, jnp.int32),
                jnp.asarray(list(slots), jnp.int32), rng,
            )

    def prefill_chunked(self, tokens: np.ndarray, true_length: int, chunk_size: int):
        """Chunked prefill: process the prompt in fixed-size chunks, each
        attending to previously cached KV (reference: maxengine.py chunked
        prefill with ExistingPrefix; benchmark_chunked_prefill.py). One jitted
        program per chunk width; lower peak memory than full-width prefill."""
        cfg = self.cfg
        if self._p_prefill_chunk is None:
            def chunk_impl(variables, chunk, positions, segs, offset):
                return self.model.apply(
                    variables, chunk, positions, segs,
                    mode=MODE_PREFILL, mutable=["cache"],
                    cache_offset=offset,
                )

            self._p_prefill_chunk = jax.jit(chunk_impl)

        padded_total = ((true_length + chunk_size - 1) // chunk_size) * chunk_size
        padded = np.zeros((1, padded_total), np.int32)
        padded[0, :true_length] = tokens[:true_length]

        cache = None
        logits = None
        with self.mesh:
            for off in range(0, padded_total, chunk_size):
                chunk = jnp.asarray(padded[:, off : off + chunk_size])
                positions = jnp.arange(off, off + chunk_size, dtype=jnp.int32)[None, :]
                valid = (
                    jnp.arange(off, off + chunk_size)[None, :] < true_length
                ).astype(jnp.int32)
                variables = {"params": self.params}
                if cache is not None:
                    variables["cache"] = cache
                logits, vars_ = self._p_prefill_chunk(
                    variables, chunk, positions, valid, jnp.asarray(off, jnp.int32)
                )
                cache = vars_["cache"]

        last_rel = (true_length - 1) % chunk_size
        last = logits[:, last_rel]
        self.rng, rng = jax.random.split(self.rng)
        first_token = sample_tokens(
            last, rng, cfg.decode_sampling_strategy,
            cfg.decode_sampling_temperature, cfg.decode_sampling_top_k,
            cfg.decode_sampling_nucleus_p,
        )
        prefix = {
            "cache": cache,
            "token": first_token,
            "pos": jnp.asarray([true_length], jnp.int32),
            "logits": last,
        }
        return prefix, first_token

    def prefill_cached(self, tokens: np.ndarray, true_length: int,
                       prefix_cache):
        """Chunked prefill that resumes from the longest cached prefix and
        stores new chunk-aligned snapshots (reference: maxengine prefix
        caching / insert_partial). `prefix_cache` is an
        infer.prefix_cache.PrefixCache."""
        cfg = self.cfg
        chunk_size = prefix_cache.chunk_size
        if self._p_prefill_chunk is None:
            def chunk_impl(variables, chunk, positions, segs, offset):
                return self.model.apply(
                    variables, chunk, positions, segs,
                    mode=MODE_PREFILL, mutable=["cache"],
                    cache_offset=offset,
                )

            self._p_prefill_chunk = jax.jit(chunk_impl)

        start, cache = prefix_cache.lookup(tokens, true_length)
        padded_total = ((true_length + chunk_size - 1) // chunk_size) * chunk_size
        padded = np.zeros((1, padded_total), np.int32)
        padded[0, :true_length] = tokens[:true_length]

        logits = None
        with self.mesh:
            for off in range(start, padded_total, chunk_size):
                chunk = jnp.asarray(padded[:, off : off + chunk_size])
                positions = jnp.arange(off, off + chunk_size, dtype=jnp.int32)[None, :]
                valid = (
                    jnp.arange(off, off + chunk_size)[None, :] < true_length
                ).astype(jnp.int32)
                variables = {"params": self.params}
                if cache is not None:
                    variables["cache"] = cache
                logits, vars_ = self._p_prefill_chunk(
                    variables, chunk, positions, valid, jnp.asarray(off, jnp.int32)
                )
                cache = vars_["cache"]
                if off + chunk_size <= true_length - 1:
                    prefix_cache.insert(tokens, off + chunk_size, cache)

        last_rel = (true_length - 1) % chunk_size
        last = logits[:, last_rel]
        self.rng, rng = jax.random.split(self.rng)
        first_token = sample_tokens(
            last, rng, cfg.decode_sampling_strategy,
            cfg.decode_sampling_temperature, cfg.decode_sampling_top_k,
            cfg.decode_sampling_nucleus_p,
        )
        prefix = {
            "cache": cache,
            "token": first_token,
            "pos": jnp.asarray([true_length], jnp.int32),
            "logits": last,
        }
        return prefix, first_token

    # ------------------------------------------------------- decode state
    @property
    def _tokens_per_page(self) -> int:
        return int(self.cfg.pagedattn_tokens_per_page)

    @property
    def _max_pages_per_slot(self) -> int:
        tpp = self._tokens_per_page
        return (int(self.cfg.max_target_length) + tpp - 1) // tpp

    def init_decode_state(self):
        cfg = self.cfg
        slots = self.num_slots
        paged = cfg.paged_attention
        if paged:
            from maxtext_indextts2_tpu.infer.page_manager import init_page_state

            assert cfg.pagedattn_num_pages > slots, (
                "page pool must exceed the slot count "
                f"({cfg.pagedattn_num_pages} pages, {slots} slots)"
            )

        def init_fn():
            dummy = jnp.zeros((slots, 1), jnp.int32)
            ps = (
                init_page_state(
                    cfg.pagedattn_num_pages, slots, self._max_pages_per_slot
                )
                if paged
                else None
            )
            _, vars_ = self.model.apply(
                {"params": self.params},
                dummy,
                dummy,
                jnp.ones((slots, 1), jnp.int32),
                mode=MODE_AUTOREGRESSIVE,
                mutable=["cache"],
                page_state=ps,
            )
            cache = jax.tree.map(jnp.zeros_like, vars_["cache"])
            state = {
                "cache": cache,
                "tokens": jnp.zeros((slots,), jnp.int32),
                "pos": jnp.zeros((slots,), jnp.int32),
                "active": jnp.zeros((slots,), jnp.bool_),
            }
            if paged:
                state["page_state"] = ps
            return state

        with self.mesh:
            return jax.jit(init_fn)()

    # ------------------------------------------------------------- insert
    @staticmethod
    def _insert_leaf(full, pre, slot):
        """Write prefix leaf (batch=1) into `slot` along the slot axis of the
        decode leaf; works for scanned ([L, B, ...]) and unscanned ([B, ...])
        cache layouts by locating the axis where shapes differ."""
        if full.shape == pre.shape:
            # Equal shapes means the slot axis has extent 1 on both sides
            # (num_slots == 1, single-prompt prefill) — the prefix IS the
            # whole decode leaf. Returning `full` here would silently drop
            # the prefill cache_index/segment leaves and restart decode at
            # cache position 0.
            return pre.astype(full.dtype)
        axis = next(
            i for i, (a, b) in enumerate(zip(full.shape, pre.shape)) if a != b
        )
        start = [0] * full.ndim
        start[axis] = slot
        return jax.lax.dynamic_update_slice(full, pre.astype(full.dtype), tuple(start))

    def _insert_impl(self, decode_state, prefix, slot):
        if self.cfg.paged_attention:
            cache, page_state = self._insert_paged(decode_state, prefix, slot)
        else:
            cache = jax.tree.map(
                lambda full, pre: self._insert_leaf(full, pre, slot),
                decode_state["cache"],
                prefix["cache"],
            )
            page_state = None
        out = {
            "cache": cache,
            "tokens": jax.lax.dynamic_update_index_in_dim(
                decode_state["tokens"], prefix["token"][0], slot, 0
            ),
            "pos": jax.lax.dynamic_update_index_in_dim(
                decode_state["pos"], prefix["pos"][0], slot, 0
            ),
            "active": jax.lax.dynamic_update_index_in_dim(
                decode_state["active"], True, slot, 0
            ),
        }
        if page_state is not None:
            out["page_state"] = page_state
        return out

    def _insert_paged(self, decode_state, prefix, slot):
        """Allocate pages for the prefilled prompt and scatter its dense
        prefix KV ([1, S, nkv, d] per layer) into the page pool. Only the
        prefill bucket's pages are touched — decode grows pages as needed."""
        from maxtext_indextts2_tpu.infer.page_manager import allocate_prefill

        cfg = self.cfg
        tpp = self._tokens_per_page
        true_len = prefix["pos"][0]
        page_state, page_ids = allocate_prefill(
            decode_state["page_state"], slot, true_len, tpp, self._max_pages_per_slot
        )
        # prompts never exceed the prefill bucket; scatter only those pages
        bucket = min(
            ((cfg.max_prefill_predict_length + tpp - 1) // tpp) * tpp,
            cfg.max_target_length,
        )
        n_pages = bucket // tpp

        def scatter(pages, dense):
            tiles = dense[0, :bucket].reshape(n_pages, tpp, *dense.shape[2:])
            return pages.at[page_ids[:n_pages]].set(tiles.astype(pages.dtype))

        def walk(dec, pre):
            if not isinstance(dec, dict):
                return dec
            out = {}
            for name, v in dec.items():
                if name == "key_pages":
                    out[name] = scatter(v, pre["cached_key"])
                elif name == "value_pages":
                    out[name] = scatter(v, pre["cached_value"])
                else:
                    out[name] = walk(v, pre.get(name, {})) if isinstance(v, dict) else v
            return out

        return walk(decode_state["cache"], prefix["cache"]), page_state

    def insert(self, prefix, decode_state, slot: int):
        if self._p_insert is None:
            self._p_insert = jax.jit(self._insert_impl, donate_argnums=(0,))
        with self.mesh:
            return self._p_insert(decode_state, prefix, jnp.asarray(slot, jnp.int32))

    def _release_impl(self, decode_state, slot):
        out = dict(decode_state)
        out["active"] = jax.lax.dynamic_update_index_in_dim(
            decode_state["active"], False, slot, 0
        )
        if self.cfg.paged_attention:
            from maxtext_indextts2_tpu.infer.page_manager import release_slot

            out["page_state"] = release_slot(decode_state["page_state"], slot)
        return out

    def release_slot(self, decode_state, slot: int):
        """Mark a finished request's slot inactive and (paged mode) return
        its pages to the pool. Without this, a finished slot keeps its pages
        until the slot is reused by a later prefill."""
        if self._p_release is None:
            self._p_release = jax.jit(self._release_impl, donate_argnums=(0,))
        with self.mesh:
            return self._p_release(decode_state, jnp.asarray(slot, jnp.int32))

    def release_slots(self, decode_state, slots):
        """Batched release: clear several finished slots' device-side active
        flags in ONE dispatch (the event-loop server finishes streams in
        dispatch-sized batches). A finished-but-active slot not only wastes
        ragged-attention work — its pos would advance forever, which before
        the _generate_impl saturation guard halted the device once it
        crossed max_target_length. Paged configs take the per-slot path
        (page bookkeeping is per-slot)."""
        if self.cfg.paged_attention:
            for s in slots:
                decode_state = self.release_slot(decode_state, s)
            return decode_state
        if self._p_release_many is None:
            def impl(state, mask):
                out = dict(state)
                out["active"] = state["active"] & ~mask
                return out

            self._p_release_many = jax.jit(impl, donate_argnums=(0,))
        mask = np.zeros(self.num_slots, bool)
        mask[list(slots)] = True
        with self.mesh:
            return self._p_release_many(decode_state, jnp.asarray(mask))

    # ------------------------------------------------------------ generate
    def _generate_impl(self, params, decode_state, rng):
        cfg = self.cfg
        tokens = decode_state["tokens"][:, None]
        pos = decode_state["pos"][:, None]
        page_state = None
        if cfg.paged_attention:
            from maxtext_indextts2_tpu.infer.page_manager import allocate_decode_step

            # advance every active slot one token (growing pages at
            # boundaries) BEFORE the model call: the write position inside
            # attention is seq_lens - 1. Finished slots (active=False) stop
            # consuming pages.
            page_state = allocate_decode_step(
                decode_state["page_state"], self._tokens_per_page,
                active=decode_state["active"],
            )
        logits, vars_ = self.model.apply(
            {"params": params, "cache": decode_state["cache"]},
            tokens,
            pos,
            jnp.ones_like(tokens),
            mode=MODE_AUTOREGRESSIVE,
            mutable=["cache"],
            page_state=page_state,
        )
        new_tokens = sample_tokens(
            logits[:, 0], rng, cfg.decode_sampling_strategy,
            cfg.decode_sampling_temperature, cfg.decode_sampling_top_k,
            cfg.decode_sampling_nucleus_p,
        )
        active = decode_state["active"]
        new_state = {
            "cache": vars_["cache"],
            "tokens": jnp.where(active, new_tokens, decode_state["tokens"]),
            # SATURATE at the cache end: a slot whose stream finished
            # host-side but was never released keeps active=True and would
            # otherwise advance past max_target_length — the ragged decode
            # kernel then DMAs past the cache and HALTS the device ('TPU
            # backend error (Internal)' on every later dispatch, process
            # unrecoverable). Found round 5: deterministic serving death at
            # 64 spd-16 dispatches = 1024 = max_target_length.
            "pos": jnp.minimum(
                decode_state["pos"] + active.astype(jnp.int32),
                cfg.max_target_length - 1,
            ),
            "active": active,
        }
        if page_state is not None:
            new_state["page_state"] = page_state
        return new_state, new_tokens

    def generate(self, decode_state):
        if self._p_generate is None:
            self._p_generate = jax.jit(self._generate_impl, donate_argnums=(1,))
        self.rng, rng = jax.random.split(self.rng)
        with self.mesh:
            return self._p_generate(self.params, decode_state, rng)

    def generate_n(self, decode_state, n: int):
        """n decode steps in ONE dispatch (lax.scan) — amortizes per-call
        host overhead for the continuous-batching loop. Returns
        (state, tokens [n, slots])."""
        if n not in self._p_generate_n:
            def impl(params, state, rng):
                def body(carry, _):
                    s, r = carry
                    r, sub = jax.random.split(r)
                    s, toks = self._generate_impl(params, s, sub)
                    return (s, r), toks
                (s, _), toks = jax.lax.scan(body, (state, rng), None, length=n)
                return s, toks

            self._p_generate_n[n] = jax.jit(impl, donate_argnums=(1,))
        self.rng, rng = jax.random.split(self.rng)
        with self.mesh:
            return self._p_generate_n[n](self.params, decode_state, rng)

    # --------------------------------------------------------- convenience
    def generate_stream(self, prompt_tokens: np.ndarray, max_new_tokens: int):
        """Single-stream decode helper: prefill -> insert(0) -> generate loop."""
        prefix, first = self.prefill(prompt_tokens, len(prompt_tokens))
        state = self.init_decode_state()
        state = self.insert(prefix, state, 0)
        out = [int(np.asarray(first)[0])]
        for _ in range(max_new_tokens - 1):
            state, toks = self.generate(state)
            out.append(int(np.asarray(toks)[0]))
        return out
