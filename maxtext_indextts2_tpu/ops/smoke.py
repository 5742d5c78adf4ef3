"""On-chip Pallas kernel smoke checks: real-Mosaic vs jnp-reference parity.

Why this exists: CI runs every Pallas kernel in interpret mode on the CPU
mesh (tests/conftest.py), and interpret mode has twice missed real Mosaic
lowering failures (PERF.md round-3: the s2a "heads" variant and a bf16
logistic). These checks run each kernel FOR REAL on the attached device on
tiny shapes and assert numerical parity against a pure-jnp reference — the
automated form of the "every new Pallas kernel needs one real-TPU smoke"
policy (reference discipline anchor: MaxText pytest.ini:15-22 tpu_only
markers + end_to_end/tpu smoke scripts).

Consumers:
  - tests/test_tpu_smoke.py   (@pytest.mark.tpu; run with MTT_TPU_TESTS=1)
  - bench.py MTT_BENCH=smoke  (pre-flight before any on-chip measurement)

Each check returns {"name", "max_rel_err", "tol", "ok"}; run_all() runs
every registered check and never raises (a compile failure is recorded as
ok=False with the error string) so one broken kernel cannot hide the rest.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

CHECKS = {}


def _register(fn):
    CHECKS[fn.__name__] = fn
    return fn


def _rel_err(got, want) -> float:
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    denom = float(np.max(np.abs(want))) + 1e-6
    return float(np.max(np.abs(got - want))) / denom


def _result(name: str, err: float, tol: float) -> dict:
    return {"name": name, "max_rel_err": round(err, 6), "tol": tol,
            "ok": bool(err <= tol)}


def _naive_attention(q, k, v, causal: bool, scale: float):
    # q,k,v: [B, H, S, D] f32
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    if causal:
        sq = q.shape[2]
        mask = jnp.tril(jnp.ones((sq, sq), bool))
        s = jnp.where(mask[None, None], s, -jnp.inf)
    return jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, axis=-1), v)


@_register
def flash_fwd():
    from maxtext_indextts2_tpu.ops.flash_attention import flash_attention

    rng = np.random.default_rng(0)
    b, h, s, d = 1, 4, 512, 128
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
               for _ in range(3))
    pos = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s))
    seg = jnp.ones((b, s), jnp.int32)
    out = flash_attention(q, k, v, pos, pos, seg, seg, causal=True,
                          block_q=256, block_kv=256)
    ref = _naive_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                           v.astype(jnp.float32), True, 1.0 / np.sqrt(d))
    return _result("flash_fwd", _rel_err(out, ref), 0.03)


@_register
def flash_bwd():
    from maxtext_indextts2_tpu.ops.flash_attention import flash_attention

    rng = np.random.default_rng(1)
    b, h, s, d = 1, 2, 256, 128
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
               for _ in range(3))
    g = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    pos = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s))
    seg = jnp.ones((b, s), jnp.int32)

    def f(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, pos, pos, seg, seg, causal=True,
                            block_q=128, block_kv=128) * g)

    def f_ref(q, k, v):
        return jnp.sum(
            _naive_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                             v.astype(jnp.float32), True, 1.0 / np.sqrt(d))
            * g.astype(jnp.float32))

    grads = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    refs = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    err = max(_rel_err(a, b_) for a, b_ in zip(grads, refs))
    return _result("flash_bwd", err, 0.05)


def _ragged_inputs(seed=2, b=4, s=256, nkv=2, group=4, d=128):
    from maxtext_indextts2_tpu.ops.ragged_decode_attention import (
        ragged_decode_attention_reference,
    )

    rng = np.random.default_rng(seed)
    nq = nkv * group
    q = jnp.asarray(rng.standard_normal((b, nq, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, s, nkv, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, s, nkv, d)), jnp.bfloat16)
    lengths = jnp.asarray([s, 100, 17, 1][:b], jnp.int32)
    ref = ragged_decode_attention_reference(
        q.astype(jnp.float32), k.astype(jnp.float32),
        v.astype(jnp.float32), lengths)
    return q, k, v, lengths, ref


@_register
def ragged_v1():
    from maxtext_indextts2_tpu.ops.ragged_decode_attention import (
        ragged_decode_attention,
    )

    q, k, v, lengths, ref = _ragged_inputs()
    out = ragged_decode_attention(q, k, v, lengths, block_kv=64)
    return _result("ragged_v1", _rel_err(out, ref), 0.03)


@_register
def ragged_v2():
    from maxtext_indextts2_tpu.ops.ragged_decode_attention import (
        ragged_decode_attention_v2,
    )

    q, k, v, lengths, ref = _ragged_inputs(seed=3)
    out = ragged_decode_attention_v2(q, k, v, lengths, block_kv=64)
    return _result("ragged_v2", _rel_err(out, ref), 0.03)


@_register
def ragged_v2_int8():
    from maxtext_indextts2_tpu.ops.ragged_decode_attention import (
        ragged_decode_attention_v2,
    )

    q, k, v, lengths, ref = _ragged_inputs(seed=4)
    # per-(b, s, h) symmetric absmax int8, as the serving KV cache stores it
    def quant(x):
        xf = x.astype(jnp.float32)
        scale = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
        xq = jnp.round(xf / jnp.maximum(scale, 1e-9)).astype(jnp.int8)
        return xq, scale[..., 0]

    kq, ks = quant(k)
    vq, vs = quant(v)
    out = ragged_decode_attention_v2(q, kq, vq, lengths, block_kv=64,
                                     k_scale=ks, v_scale=vs)
    # int8 KV adds ~1/127 quantization noise on top of bf16 rounding
    return _result("ragged_v2_int8", _rel_err(out, ref), 0.06)


@_register
def paged_v2():
    from maxtext_indextts2_tpu.ops.ragged_decode_attention import (
        paged_decode_attention_v2,
        ragged_decode_attention_reference,
    )

    rng = np.random.default_rng(5)
    b, nkv, group, d = 2, 2, 4, 128
    tpp, pages_per_slot = 16, 8
    s = tpp * pages_per_slot
    num_pages = b * pages_per_slot + 4
    nq = nkv * group
    q = jnp.asarray(rng.standard_normal((b, nq, d)), jnp.bfloat16)
    kc = jnp.asarray(rng.standard_normal((b, s, nkv, d)), jnp.bfloat16)
    vc = jnp.asarray(rng.standard_normal((b, s, nkv, d)), jnp.bfloat16)
    lengths = jnp.asarray([s, 37], jnp.int32)
    # scatter the contiguous caches into shuffled pages
    perm = rng.permutation(num_pages)[: b * pages_per_slot]
    page_map = jnp.asarray(perm.reshape(b, pages_per_slot), jnp.int32)
    kp = np.zeros((num_pages, tpp, nkv, d), np.float32)
    vp = np.zeros((num_pages, tpp, nkv, d), np.float32)
    for i in range(b):
        for j in range(pages_per_slot):
            kp[perm[i * pages_per_slot + j]] = np.asarray(
                kc[i, j * tpp:(j + 1) * tpp], np.float32)
            vp[perm[i * pages_per_slot + j]] = np.asarray(
                vc[i, j * tpp:(j + 1) * tpp], np.float32)
    out = paged_decode_attention_v2(
        q, jnp.asarray(kp, jnp.bfloat16), jnp.asarray(vp, jnp.bfloat16),
        page_map, lengths)
    ref = ragged_decode_attention_reference(
        q.astype(jnp.float32), kc.astype(jnp.float32),
        vc.astype(jnp.float32), lengths)
    return _result("paged_v2", _rel_err(out, ref), 0.03)


@_register
def inplace_update():
    from maxtext_indextts2_tpu.ops.inplace_update import inplace_row_update

    rng = np.random.default_rng(6)
    b, s, d, span = 2, 64, 128, 8
    cache = rng.standard_normal((b, s, d)).astype(np.float32)
    kv = rng.standard_normal((b, span, d)).astype(np.float32)
    idx = np.asarray([5, 40], np.int32)
    out = inplace_row_update(jnp.asarray(cache), jnp.asarray(kv),
                             jnp.asarray(idx))
    want = cache.copy()
    for i in range(b):
        want[i, idx[i]:idx[i] + span] = kv[i]
    return _result("inplace_update", _rel_err(out, want), 1e-6)


@_register
def ada_rmsnorm():
    from maxtext_indextts2_tpu.ops.ada_rmsnorm import ada_rmsnorm as op

    rng = np.random.default_rng(7)
    b, s, d = 2, 64, 256
    x = jnp.asarray(rng.standard_normal((b, s, d)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((b, d)), jnp.bfloat16)
    out = op(x, w)
    xf = x.astype(jnp.float32)
    ref = xf * jax.lax.rsqrt(
        jnp.mean(xf * xf, -1, keepdims=True) + 1e-6
    ) * w.astype(jnp.float32)[:, None, :]
    return _result("ada_rmsnorm", _rel_err(out, ref), 0.03)


def _quant_ref(y):
    amax = jnp.max(jnp.abs(y), axis=-1)
    scale = amax / 127.0
    q = jnp.round(y / jnp.maximum(scale, 1e-9)[..., None])
    return q.astype(jnp.int8), scale


@_register
def row_quantize():
    from maxtext_indextts2_tpu.ops.quant_kernels import row_quantize_int8

    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((2, 64, 256)), jnp.float32)
    q, sc = row_quantize_int8(x)
    qr, sr = _quant_ref(x)
    # compare DEQUANTIZED values: rounding ties may legally flip one LSB
    err = max(
        _rel_err(q.astype(jnp.float32) * sc[..., None],
                 qr.astype(jnp.float32) * sr[..., None]),
        _rel_err(sc, sr),
    )
    return _result("row_quantize", err, 0.02)


@_register
def ada_rmsnorm_quantize():
    from maxtext_indextts2_tpu.ops.ada_rmsnorm import ada_rmsnorm as norm_op
    from maxtext_indextts2_tpu.ops.quant_kernels import ada_rmsnorm_quantize as op

    rng = np.random.default_rng(9)
    b, s, d = 2, 64, 256
    x = jnp.asarray(rng.standard_normal((b, s, d)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((b, d)), jnp.bfloat16)
    q, sc = op(x, w)
    y = norm_op(x, w).astype(jnp.float32)
    err = _rel_err(q.astype(jnp.float32) * sc[..., None], y)
    return _result("ada_rmsnorm_quantize", err, 0.03)


@_register
def silu_mul_quantize():
    from maxtext_indextts2_tpu.ops.quant_kernels import silu_mul_quantize as op

    rng = np.random.default_rng(10)
    g = jnp.asarray(rng.standard_normal((2, 64, 256)), jnp.bfloat16)
    u = jnp.asarray(rng.standard_normal((2, 64, 256)), jnp.bfloat16)
    q, sc = op(g, u)
    gf = g.astype(jnp.float32)
    y = gf * jax.nn.sigmoid(gf) * u.astype(jnp.float32)
    err = _rel_err(q.astype(jnp.float32) * sc[..., None], y)
    return _result("silu_mul_quantize", err, 0.03)


@_register
def s2a_attention():
    from maxtext_indextts2_tpu.ops.s2a_attention import s2a_attention as op

    rng = np.random.default_rng(11)
    b, s, n, d = 2, 96, 4, 64
    scale = 1.0 / np.sqrt(d)
    q = jnp.asarray(rng.standard_normal((b, s, n, d)) * scale, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, s, n, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, s, n, d)), jnp.bfloat16)
    out = op(q, k, v, variant="bn")
    qf, kf, vf = (x.astype(jnp.float32) for x in (q, k, v))
    scores = jnp.einsum("bqnd,bknd->bnqk", qf, kf)
    ref = jnp.einsum("bnqk,bknd->bqnd", jax.nn.softmax(scores, -1), vf)
    return _result("s2a_attention", _rel_err(out, ref), 0.03)


def run_all() -> list[dict]:
    """Run every registered check; a crash becomes ok=False, not an abort."""
    out = []
    for name, fn in CHECKS.items():
        try:
            out.append(fn())
        except Exception as e:  # noqa: BLE001 — recorded per-kernel
            out.append({"name": name, "max_rel_err": None, "tol": None,
                        "ok": False, "error": repr(e)[:300]})
    return out
