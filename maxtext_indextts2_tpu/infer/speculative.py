"""Speculative decoding: small draft model proposes, target verifies.

Goes beyond the reference (MaxText has MTP training + acceptance-rate math,
layers/multi_token_prediction.py:277, but no speculative serving path). One
speculative round is a single jitted program:

1. Draft: lax.scan of K autoregressive steps of the draft model (its own KV
   cache) proposing tokens d_1..d_K.
2. Verify: ONE target forward over [t_0, d_1..d_K] (K+1 positions) in
   MODE_VERIFY — KV written at [pos, pos+K+1) per slot, cache_index left
   untouched (models/attention.py MODE_VERIFY).
3. Accept: greedy longest-prefix match (d_j == target argmax m_{j-1});
   emit accepted drafts + one bonus token m_a, advance pos by a+1, then set
   every cache_index leaf (both models) to the new pos.

Guarantee (tested): with greedy sampling the emitted stream is EXACTLY the
target model's greedy decode, for ANY draft model — the draft only changes
speed. Per round the target does one (K+1)-token pass (matmul-efficient,
reads weights once) instead of a+1 single-token passes.

The KV-cache discipline relies on every decode read being bounded by
cache_index (or by the verify positions themselves), so stale entries from
rejected drafts are dead until overwritten. Works with quantized KV, sliding
windows, and MLA latent caches (models/mla.py MODE_VERIFY); paged caches are
not wired up.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from maxtext_indextts2_tpu.config import Config
from maxtext_indextts2_tpu.infer.engine import Engine
from maxtext_indextts2_tpu.models import MODE_VERIFY


def _set_cache_index(cache, new_pos):
    """Set every cache_index leaf ([slots]) to new_pos (committed length)."""
    def fix(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "cache_index":
            # scanned layouts carry a leading layer axis; broadcast over it
            return jnp.broadcast_to(new_pos, leaf.shape).astype(leaf.dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(fix, cache)


class SpeculativeEngine:
    """Two-Engine wrapper: target + draft with lockstep slot states."""

    def __init__(self, cfg: Config, draft_cfg: Config, mesh=None,
                 num_draft_tokens: int = 4):
        assert cfg.decode_sampling_strategy == "greedy" and \
            draft_cfg.decode_sampling_strategy == "greedy", \
            "speculative v1 is greedy-only (rejection sampling: future work)"
        assert cfg.vocab_size == draft_cfg.vocab_size
        assert cfg.max_target_length == draft_cfg.max_target_length
        assert cfg.per_device_batch_size == draft_cfg.per_device_batch_size
        self.target = Engine(cfg, mesh=mesh)
        self.draft = Engine(draft_cfg, mesh=self.target.mesh)
        self.cfg = cfg
        self.K = int(num_draft_tokens)
        self.num_slots = self.target.num_slots
        self.mesh = self.target.mesh
        self._p_spec = None

    def load_params(self, target_path: str | None = None,
                    draft_path: str | None = None):
        self.target.load_params(target_path)
        self.draft.load_params(draft_path)

    # ----------------------------------------------------------- lifecycle
    def prefill(self, tokens: np.ndarray, true_length: int):
        """Prefill BOTH models; first token comes from the target."""
        t_prefix, first = self.target.prefill(tokens, true_length)
        d_prefix, _ = self.draft.prefill(tokens, true_length)
        return {"target": t_prefix, "draft": d_prefix}, first

    def init_decode_state(self):
        return {
            "target": self.target.init_decode_state(),
            "draft": self.draft.init_decode_state(),
        }

    def insert(self, prefix, state, slot: int):
        t = self.target.insert(prefix["target"], state["target"], slot)
        d = self.draft.insert(prefix["draft"], state["draft"], slot)
        # lockstep: the shared stream token/pos live in the target state
        return {"target": t, "draft": d}

    # ------------------------------------------------------------- decode
    def _spec_impl(self, t_params, d_params, state, rng):
        """One speculative round. Returns (state, tokens [slots, K+1],
        n_new [slots]) — per slot, tokens[:, :n_new] are newly committed."""
        cfg = self.cfg
        K = self.K
        tstate, dstate = state["target"], state["draft"]
        t0 = tstate["tokens"]  # [S] last committed token
        pos0 = tstate["pos"]  # [S] == cache_index of both models
        active = tstate["active"]

        # ---- 1. draft K tokens (scan over the draft model's own cache)
        def body(carry, _):
            dcache, tok, pos = carry
            logits, vars_ = self.draft.model.apply(
                {"params": d_params, "cache": dcache},
                tok[:, None], pos[:, None], jnp.ones((tok.shape[0], 1), jnp.int32),
                mode="autoregressive", mutable=["cache"],
            )
            ntok = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
            return (vars_["cache"], ntok, pos + 1), ntok

        (dcache, _, _), drafts = jax.lax.scan(
            body, (dstate["cache"], t0, pos0), None, length=K
        )
        drafts = drafts.T  # [S, K]

        # ---- 2. verify: one target pass over [t0, d_1..d_K]
        tokens_v = jnp.concatenate([t0[:, None], drafts], axis=1)  # [S, K+1]
        positions_v = pos0[:, None] + jnp.arange(K + 1, dtype=jnp.int32)[None, :]
        positions_v = jnp.minimum(positions_v, cfg.max_target_length - 1)
        logits_v, tvars = self.target.model.apply(
            {"params": t_params, "cache": tstate["cache"]},
            tokens_v, positions_v, jnp.ones_like(tokens_v),
            mode=MODE_VERIFY, mutable=["cache"],
        )
        preds = jnp.argmax(logits_v, axis=-1).astype(jnp.int32)  # [S, K+1]

        # ---- 3. accept longest matching prefix + bonus token
        match = (drafts == preds[:, :K]).astype(jnp.int32)  # [S, K]
        acc = jnp.sum(jnp.cumprod(match, axis=1), axis=1)  # [S] in [0, K]
        # never run past the context: cap commits so pos stays < max_length
        room = jnp.maximum(cfg.max_target_length - 1 - pos0, 1)
        n_new = jnp.minimum(acc + 1, room)  # [S]
        acc = n_new - 1
        bonus = jnp.take_along_axis(preds, acc[:, None], axis=1)[:, 0]
        j = jnp.arange(K + 1, dtype=jnp.int32)[None, :]
        out_tokens = jnp.where(
            j < acc[:, None],
            jnp.pad(drafts, ((0, 0), (0, 1))),
            jnp.where(j == acc[:, None], preds, 0),
        )
        out_tokens = jnp.where(j < n_new[:, None], out_tokens, 0)

        n_new = jnp.where(active, n_new, 0)
        new_pos = pos0 + n_new
        last = jnp.where(active, jnp.where(acc > 0, bonus, preds[:, 0]), t0)
        # (acc==0: bonus == preds[:,0]; kept explicit for clarity)

        new_state = {
            "target": {
                "cache": _set_cache_index(tvars["cache"], new_pos),
                "tokens": last,
                "pos": new_pos,
                "active": active,
            },
            "draft": {
                "cache": _set_cache_index(dcache, new_pos),
                "tokens": last,
                "pos": new_pos,
                "active": active,
            },
        }
        return new_state, out_tokens, n_new

    def generate(self, state):
        """One speculative round for every active slot (jitted+donated)."""
        if self._p_spec is None:
            self._p_spec = jax.jit(self._spec_impl, donate_argnums=(2,))
        self.target.rng, rng = jax.random.split(self.target.rng)
        with self.mesh:
            return self._p_spec(self.target.params, self.draft.params, state, rng)

    # --------------------------------------------------------- convenience
    def generate_stream(self, prompt_tokens: np.ndarray, max_new_tokens: int):
        """Single-stream helper; returns (tokens, rounds) — rounds counts
        target dispatches, so max_new_tokens/rounds is the speedup factor
        vs one-token-per-step decoding."""
        prefix, first = self.prefill(prompt_tokens, len(prompt_tokens))
        state = self.init_decode_state()
        state = self.insert(prefix, state, 0)
        out = [int(np.asarray(first)[0])]
        rounds = 0
        while len(out) < max_new_tokens:
            state, toks, n_new = self.generate(state)
            rounds += 1
            n = int(np.asarray(n_new)[0])
            out.extend(int(t) for t in np.asarray(toks)[0, :n])
        return out[:max_new_tokens], rounds
