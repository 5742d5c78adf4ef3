"""Pipeline parallelism: vmapped stages + microbatch rotation via lax.scan.

TPU-native redesign of the reference Pipeline (MaxText/layers/pipeline.py:34:
vmap over stages, circular repeats, circ storage, delayed activation
forwarding). Differences:

- Unit (= ``layers_per_stage`` decoder layers) params are created once by an
  ``nn.vmap`` over all S*R units in **stage-major order** (u = s*R + r), so
  sharding the unit axis over the "stage" mesh axis keeps every stage's
  repeat weights local — the per-iteration repeat gather never crosses ICI.
- The schedule itself is a plain functional lax.scan over
  M*R + S - 1 iterations, with the per-stage microbatch/repeat bookkeeping
  done by index arithmetic; stage compute is jax.vmap of
  ``DecoderLayer.apply`` over gathered per-stage params.
- Inactive (bubble) stages compute garbage that is simply never written to
  outputs/circ-storage — no masking inside the layer.
- Known limitation: sown intermediates (MoE load-balance loss) are dropped
  inside the pipelined region — pair PP with dense layers or add the aux
  loss at the router level if MoE+PP is required (reference has the same
  coupling constraints).

Correctness bar (matching the reference's pipeline_parallelism_test.py):
output AND gradient equality vs the scanned non-pipelined decoder.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from maxtext_indextts2_tpu.config import Config
from maxtext_indextts2_tpu.parallel.sharding import shard


class Pipeline(nn.Module):
    cfg: Config
    block: Any
    mesh: Any = None
    use_moe: bool = False

    @property
    def num_stages(self) -> int:
        return self.cfg.ici_stage_parallelism * self.cfg.dcn_stage_parallelism

    @nn.compact
    def __call__(self, x, positions, segment_ids, mode, deterministic):
        from maxtext_indextts2_tpu.models.decoder import DecoderLayer

        cfg = self.cfg
        S = self.num_stages
        R = cfg.num_pipeline_repeats
        M = cfg.num_pipeline_microbatches
        U = S * R
        B, L, E = x.shape
        assert B % M == 0, f"batch {B} must divide into {M} microbatches"
        mb = B // M

        layer_kwargs = dict(cfg=cfg, block=self.block, mesh=self.mesh, use_moe=self.use_moe)

        # ---- params: one vmapped container over all units (stage-major)
        vmapped = nn.vmap(
            DecoderLayer,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=(0, 0, 0, None, None),
            out_axes=0,
            axis_size=U,
            metadata_params={nn.PARTITION_NAME: "layers"},
        )
        units = vmapped(**layer_kwargs, name="layers")

        if self.is_initializing():
            dummy = jnp.broadcast_to(x[:1][None], (U, 1) + x.shape[1:]).astype(x.dtype)
            dpos = jnp.broadcast_to(positions[:1][None], (U, 1) + positions.shape[1:])
            dseg = jnp.broadcast_to(segment_ids[:1][None], (U, 1) + segment_ids.shape[1:])
            units(dummy, dpos, dseg, mode, deterministic)
            # init only needs params + output shape
            return x

        params = nn.meta.unbox(self.variables["params"]["layers"])
        template = DecoderLayer(**layer_kwargs)

        def unit_apply(p_slice, xs, pos, seg):
            out, _ = template.apply({"params": p_slice}, xs, pos, seg, mode, deterministic)
            return out

        stage_apply = jax.vmap(unit_apply)

        # ---- microbatch views
        x_mb = x.reshape(M, mb, L, E)
        pos_mb = positions.reshape(M, mb, L)
        seg_mb = segment_ids.reshape(M, mb, L)

        # pipeline_delay_activation_forwarding: each stage hop costs TWO
        # iterations — stage s consumes the output stage s-1 produced two
        # iterations earlier, letting XLA overlap the inter-stage ppermute
        # with the next microbatch's compute (reference: pipeline.py
        # delay_activation_forwarding; bubble grows to 2(S-1)).
        d = 2 if cfg.pipeline_delay_activation_forwarding else 1
        T = M * R + d * (S - 1)
        stage_ids = jnp.arange(S)

        def body(carry, i):
            shift, shift_prev, circ, outputs = carry
            # stage s processes microbatch (i-d*s) % M of repeat (i-d*s) // M
            virt = i - d * stage_ids  # [S]
            mb_ids = jnp.mod(virt, M)
            r_ids = jnp.clip(virt // M, 0, R - 1)
            u_ids = stage_ids * R + r_ids  # stage-major unit index

            # stage 0 input: fresh microbatch on repeat 0, else circ storage
            first_in = jnp.where(
                (i // M) == 0, x_mb[i % M], circ[i % M] if R > 1 else x_mb[i % M]
            )
            feed = shift_prev if d == 2 else shift
            stage_in = jnp.concatenate([first_in[None], feed[:-1]], axis=0)
            stage_in = shard(stage_in, "activation_stage", "activation_batch",
                             "activation_length", "activation_embed")

            gathered = jax.tree.map(lambda w: jnp.take(w, u_ids, axis=0), params)
            pos_s = jnp.take(pos_mb, mb_ids, axis=0)
            seg_s = jnp.take(seg_mb, mb_ids, axis=0)

            out_stages = stage_apply(gathered, stage_in, pos_s, seg_s)

            # last stage bookkeeping
            v_last = i - d * (S - 1)
            m_last = jnp.mod(v_last, M)
            r_last = v_last // M
            o_last = out_stages[-1]
            done = (r_last == R - 1) & (v_last >= 0)
            recirc = (r_last < R - 1) & (v_last >= 0)

            outputs = outputs.at[m_last].set(
                jnp.where(done, o_last, outputs[m_last])
            )
            if R > 1:
                circ = circ.at[m_last].set(jnp.where(recirc, o_last, circ[m_last]))

            return (out_stages, shift, circ, outputs), None

        shift0 = jnp.zeros((S, mb, L, E), x.dtype)
        circ0 = jnp.zeros((M, mb, L, E), x.dtype) if R > 1 else jnp.zeros((1,), x.dtype)
        out0 = jnp.zeros((M, mb, L, E), x.dtype)

        if cfg.scan_pipeline_iterations:
            (_, _, _, outputs), _ = jax.lax.scan(
                body, (shift0, shift0, circ0, out0), jnp.arange(T)
            )
        else:
            carry = (shift0, shift0, circ0, out0)
            for i in range(T):
                carry, _ = body(carry, i)
            outputs = carry[3]

        return outputs.reshape(B, L, E)
