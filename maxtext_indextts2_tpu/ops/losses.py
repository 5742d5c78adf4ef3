"""Loss ops.

Cross-entropy with z-loss as a custom-VJP op (reference:
MaxText/max_utils.py:565-656 cross_entropy_with_logits). Unlike the
reference's one-hot formulation, the forward gathers the target logit
directly (no [B,S,V] one-hot materialization) and the backward rebuilds the
softmax and applies a scatter-subtract — saving HBM at 264k-row audio vocabs.

z-loss (ST-MoE, arXiv:2202.08906) regularizes log Z toward 0, keeping logits
from drifting and stabilizing bf16 training.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@jax.custom_vjp
def cross_entropy_with_logits(logits: jax.Array, targets: jax.Array, z_loss: float):
    """Per-token CE + z-loss.

    Args:
      logits: [..., V] float.
      targets: [...] int token ids.
      z_loss: scalar coefficient for log(Z)^2 regularization.

    Returns:
      (total_loss, ce_loss): each [...] float32.
    """
    total, ce, _ = _ce_fwd_impl(logits, targets, z_loss)
    return total, ce


def _ce_fwd_impl(logits, targets, z_loss):
    logits = logits.astype(jnp.float32)
    max_logit = jax.lax.stop_gradient(jnp.max(logits, axis=-1, keepdims=True))
    shifted = logits - max_logit
    sum_exp = jnp.sum(jnp.exp(shifted), axis=-1)
    log_z = jnp.log(sum_exp) + jnp.squeeze(max_logit, -1)
    target_logit = jnp.take_along_axis(
        logits, targets[..., None].astype(jnp.int32), axis=-1
    )[..., 0]
    ce = log_z - target_logit
    total = ce + z_loss * jnp.square(log_z)
    return total, ce, (shifted, sum_exp, log_z, targets)


def _ce_fwd(logits, targets, z_loss):
    total, ce, res = _ce_fwd_impl(logits, targets, z_loss)
    return (total, ce), (res, z_loss)


def _ce_bwd(saved, g):
    (shifted, sum_exp, log_z, targets), z_loss = saved
    g_total, g_ce = g
    # d total / d logits = softmax - onehot(target) + 2*z_loss*log_z*softmax
    softmax = jnp.exp(shifted) / sum_exp[..., None]
    coeff = (g_total + g_ce)[..., None]
    dlogits = coeff * softmax
    dlogits += (g_total * 2.0 * z_loss * log_z)[..., None] * softmax
    # scatter-subtract the one-hot term
    onehot_grad = (g_total + g_ce)[..., None]
    dlogits = _scatter_sub(dlogits, targets, onehot_grad[..., 0])
    return dlogits, None, None


def _scatter_sub(x, idx, val):
    flat = x.reshape(-1, x.shape[-1])
    fidx = idx.reshape(-1).astype(jnp.int32)
    fval = val.reshape(-1)
    rows = jnp.arange(flat.shape[0])
    flat = flat.at[rows, fidx].add(-fval)
    return flat.reshape(x.shape)


cross_entropy_with_logits.defvjp(_ce_fwd, _ce_bwd)


def chunked_unembed_cross_entropy(
    y: jax.Array,
    kernel: jax.Array,
    targets: jax.Array,
    weights: jax.Array,
    z_loss: float = 0.0,
    chunk: int = 512,
    soft_cap: float = 0.0,
    scale: float = 1.0,
    compute_dtype=None,
    logits_dtype=None,
) -> tuple[jax.Array, jax.Array]:
    """Vocab projection fused INTO the loss: the [B,S,V] logits never
    materialize.

    At the flagship's 264,192-row vocab, full logits are the training step's
    dominant HBM object (batch 4 x seq 2048 x 264k = 8.6 GB in f32, held
    through the backward). Here the flattened [B*S] rows are processed in
    ``chunk``-row slices: each slice's logits [chunk, V] are produced,
    reduced to a loss partial, and discarded; ``jax.checkpoint`` recomputes
    them in the backward, so peak logits memory is one chunk in each
    direction. dW accumulates across the lax.scan (kernel is a scan
    constant). Reference regime: MaxText vocab_expansion/expand_embedder.py
    + maxtext_utils CE — the reference materializes full logits.

    Args:
      y: [B, S, E] final-normed hidden states (Transformer.prelogits output).
      kernel: [E, V] unembedding matrix (logits_dense kernel, or the tied
        embedding transposed).
      targets: [B, S] int ids; weights: [B, S] (0 masks a token).
      soft_cap / scale: final_logits_soft_cap and the tied-embedding
        1/sqrt(E) normalizer — applied exactly as Transformer._unembed does.
      compute_dtype: matmul dtype (cfg.dtype, or f32 when logits_dot_in_fp32).

    Returns (mean_loss, total_weight) — identical contract (and values, see
    tests/test_train.py parity test) to unfused masked_cross_entropy over
    Transformer's logits.
    """
    b, s, e = y.shape
    n = b * s
    yf = y.reshape(n, e)
    tf = targets.reshape(n).astype(jnp.int32)
    wf = weights.reshape(n).astype(jnp.float32)
    pad = (-n) % chunk
    if pad:
        yf = jnp.pad(yf, ((0, pad), (0, 0)))
        tf = jnp.pad(tf, (0, pad))
        wf = jnp.pad(wf, (0, pad))  # padded rows carry weight 0
    yc = yf.reshape(-1, chunk, e)
    tc = tf.reshape(-1, chunk)
    wc = wf.reshape(-1, chunk)
    dt = compute_dtype or y.dtype
    ldt = jnp.dtype(logits_dtype) if logits_dtype else jnp.float32

    @jax.checkpoint
    def chunk_loss_sum(y_c, t_c, w_c, kern):
        # the [chunk, V] logits slice is the step's dominant HBM transient
        # at 264k vocab; logits_dtype=bfloat16 halves its write+read bytes
        # (the CE reductions upcast to f32 in-register)
        logits = jnp.dot(
            y_c.astype(dt), kern.astype(dt), preferred_element_type=ldt
        ).astype(jnp.float32)
        if scale != 1.0:
            logits = logits * scale
        if soft_cap > 0.0:
            logits = soft_cap * jnp.tanh(logits / soft_cap)
        total, _ = cross_entropy_with_logits(logits, t_c, z_loss)
        return jnp.sum(total * w_c)

    def body(acc, xs):
        y_c, t_c, w_c = xs
        return acc + chunk_loss_sum(y_c, t_c, w_c, kernel), None

    loss_sum, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), (yc, tc, wc))
    denom = jnp.maximum(jnp.sum(wf), 1e-6)
    return loss_sum / denom, denom


def _pick_vocab_tile(v: int, max_tile: int) -> int:
    """Largest lane-aligned divisor of ``v`` that is <= max_tile (falls back
    to the whole vocab when none exists — streaming degenerates to one tile)."""
    for t in range(min(v, max_tile), 127, -1):
        if v % t == 0 and t % 128 == 0:
            return t
    return v


def streaming_unembed_cross_entropy(
    y: jax.Array,
    kernel: jax.Array,
    targets: jax.Array,
    weights: jax.Array,
    z_loss: float = 0.0,
    max_tile: int = 8192,
    soft_cap: float = 0.0,
    scale: float = 1.0,
    compute_dtype=None,
) -> tuple[jax.Array, jax.Array]:
    """Vocab-STREAMING fused unembed+CE: same contract as
    chunked_unembed_cross_entropy, restructured so the unembed matrix moves
    through HBM a constant number of times per step.

    The chunked variant scans ROW chunks with the kernel closed over as a
    scan constant — its AD re-reads the full [E,V] kernel every chunk and,
    worse, accumulates dW by rewriting the whole [E,V] f32 gradient buffer
    once per chunk (~4.3 GB of HBM traffic per chunk at the flagship's
    264k vocab). Here the loop runs over VOCAB tiles with all rows resident:
    the forward reads each kernel tile once (online log-sum-exp across
    tiles, flash-attention-style rescaling); the custom backward recomputes
    each tile's logits from the saved per-row lse, writes that tile's dW
    exactly once (dynamic_update_slice into the carry — in-place under XLA),
    and accumulates only the small [N,E] dy carry. Reference regime anchor:
    MaxText materializes full logits (maxtext_utils.py:475 counts the
    unembed flops; vocab_expansion/ is the 264k regime).

    Args/returns: identical to chunked_unembed_cross_entropy, with
    ``max_tile`` bounding the [N, tile] transient instead of ``chunk``.
    """
    b, s, e = y.shape
    n = b * s
    yf = y.reshape(n, e)
    tf = targets.reshape(n).astype(jnp.int32)
    wf = weights.reshape(n).astype(jnp.float32)
    dt = compute_dtype or y.dtype
    v = kernel.shape[1]
    vt = _pick_vocab_tile(v, max_tile)
    loss_sum = _stream_ce(yf, kernel, tf, wf, z_loss, vt, soft_cap, scale, dt)
    denom = jnp.maximum(jnp.sum(wf), 1e-6)
    return loss_sum / denom, denom


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _stream_ce(yf, kernel, tf, wf, z_loss, vt, soft_cap, scale, dt):
    loss_sum, _ = _stream_ce_fwd_impl(
        yf, kernel, tf, wf, z_loss, vt, soft_cap, scale, dt
    )
    return loss_sum


def _tile_logits(yf, kernel, i, vt, soft_cap, scale, dt):
    wt = jax.lax.dynamic_slice_in_dim(kernel, i * vt, vt, axis=1)
    logits = jnp.dot(
        yf.astype(dt), wt.astype(dt), preferred_element_type=jnp.float32
    )
    if scale != 1.0:
        logits = logits * scale
    if soft_cap > 0.0:
        logits = soft_cap * jnp.tanh(logits / soft_cap)
    return wt, logits


def _stream_ce_fwd_impl(yf, kernel, tf, wf, z_loss, vt, soft_cap, scale, dt):
    n = yf.shape[0]
    v = kernel.shape[1]
    num_tiles = v // vt

    def body(i, carry):
        m, l, tgt = carry
        _, logits = _tile_logits(yf, kernel, i, vt, soft_cap, scale, dt)
        tile_max = jnp.max(logits, axis=-1)
        m_new = jnp.maximum(m, tile_max)
        l = l * jnp.exp(m - m_new) + jnp.sum(
            jnp.exp(logits - m_new[:, None]), axis=-1
        )
        loc = tf - i * vt
        inb = (loc >= 0) & (loc < vt)
        tl = jnp.take_along_axis(
            logits, jnp.clip(loc, 0, vt - 1)[:, None], axis=-1
        )[:, 0]
        tgt = jnp.where(inb, tl, tgt)
        return m_new, l, tgt

    init = (
        jnp.full((n,), -jnp.inf, jnp.float32),
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), jnp.float32),
    )
    m, l, tgt = jax.lax.fori_loop(0, num_tiles, body, init)
    lse = jnp.log(l) + m
    ce = lse - tgt
    total = ce + z_loss * jnp.square(lse)
    return jnp.sum(total * wf), lse


def _stream_ce_fwd(yf, kernel, tf, wf, z_loss, vt, soft_cap, scale, dt):
    loss_sum, lse = _stream_ce_fwd_impl(
        yf, kernel, tf, wf, z_loss, vt, soft_cap, scale, dt
    )
    return loss_sum, (yf, kernel, tf, wf, lse)


def _stream_ce_bwd(z_loss, vt, soft_cap, scale, dt, res, g):
    yf, kernel, tf, wf, lse = res
    n, e = yf.shape
    v = kernel.shape[1]
    num_tiles = v // vt
    # d total/d logits_j = coef * (p_j * (1 + 2*z*lse) - onehot_j)
    coef = (wf * g).astype(jnp.float32)
    pz = coef * (1.0 + 2.0 * z_loss * lse)

    def body(i, carry):
        dy, dw = carry
        wt, logits = _tile_logits(yf, kernel, i, vt, soft_cap, scale, dt)
        p = jnp.exp(logits - lse[:, None])
        dlog = p * pz[:, None]
        loc = tf - i * vt
        inb = (loc >= 0) & (loc < vt)
        onehot_rows = jnp.where(inb, coef, 0.0)
        dlog = dlog.at[
            jnp.arange(n), jnp.clip(loc, 0, vt - 1)
        ].add(-onehot_rows)
        if soft_cap > 0.0:
            dlog = dlog * (1.0 - jnp.square(logits / soft_cap))
        if scale != 1.0:
            dlog = dlog * scale
        dlog_c = dlog.astype(dt)
        dy = dy + jnp.dot(
            dlog_c, wt.astype(dt).T, preferred_element_type=jnp.float32
        )
        dwt = jnp.dot(
            yf.astype(dt).T, dlog_c, preferred_element_type=jnp.float32
        )
        dw = jax.lax.dynamic_update_slice_in_dim(
            dw, dwt.astype(dw.dtype), i * vt, axis=1
        )
        return dy, dw

    init = (
        jnp.zeros((n, e), jnp.float32),
        jnp.zeros((e, v), kernel.dtype),
    )
    dy, dw = jax.lax.fori_loop(0, num_tiles, body, init)
    return dy.astype(yf.dtype), dw, None, None


_stream_ce.defvjp(_stream_ce_fwd, _stream_ce_bwd)


def _rowq8(x):
    """Per-row symmetric absmax int8: x [..., K] -> (int8, f32 scale [...])."""
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1), 1e-30) / 127.0
    q = jnp.round(xf / s[..., None]).astype(jnp.int8)
    return q, s


def _colq8(k):
    """Per-column absmax int8 for the [E, V] unembed kernel."""
    kf = k.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(kf), axis=0), 1e-30) / 127.0
    q = jnp.round(kf / s[None, :]).astype(jnp.int8)
    return q, s


def chunked_unembed_cross_entropy_int8(
    y: jax.Array,
    kernel: jax.Array,
    targets: jax.Array,
    weights: jax.Array,
    z_loss: float = 0.0,
    chunk: int = 512,
    soft_cap: float = 0.0,
    scale: float = 1.0,
    logits_dtype="bfloat16",
) -> tuple[jax.Array, jax.Array]:
    """int8 fused unembed+CE with the kernel quantized ONCE per step.

    Same contract as chunked_unembed_cross_entropy, but the unembed matmuls
    run int8 x int8 on the MXU with AQT semantics (dynamic per-row activation
    scales, per-column kernel scales, straight-through kernel gradient).
    AQT's own dot_general would re-quantize the [E, V] kernel inside every
    chunk — at 264k vocab that is 1.08 GB of bf16 reads plus an int8
    round-trip PER CHUNK, which is why cfg.quantization=int8 deliberately
    does not reach the fused CE (benchmarks/mfu_flagship.py). Here the
    custom VJP hoists quantization: kq/sk are computed once, saved as
    residuals, and every forward/recompute/dy matmul streams the int8
    kernel (half the bytes, double the MXU rate). dW accumulates in the
    kernel dtype via one bf16 matmul per chunk, exactly like the AD path.
    Reference regime anchor: MaxText AQT int8 training (README int8 blog);
    the reference has no fused-CE equivalent to quantize.
    """
    b, s, e = y.shape
    n = b * s
    yf = y.reshape(n, e)
    tf = targets.reshape(n).astype(jnp.int32)
    wf = weights.reshape(n).astype(jnp.float32)
    pad = (-n) % chunk
    if pad:
        yf = jnp.pad(yf, ((0, pad), (0, 0)))
        tf = jnp.pad(tf, (0, pad))
        wf = jnp.pad(wf, (0, pad))
    yc = yf.reshape(-1, chunk, e)
    tc = tf.reshape(-1, chunk)
    wc = wf.reshape(-1, chunk)
    loss_sum = _q8_ce(yc, kernel, tc, wc, z_loss, soft_cap, scale,
                      str(logits_dtype))
    denom = jnp.maximum(jnp.sum(wf), 1e-6)
    return loss_sum / denom, denom


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _q8_ce(yc, kernel, tc, wc, z_loss, soft_cap, scale, ldt):
    loss_sum, _ = _q8_ce_fwd_impl(yc, kernel, tc, wc, z_loss, soft_cap,
                                  scale, ldt)
    return loss_sum


def _q8_logits(y_c, kq, sk, soft_cap, scale, ldt):
    yq, sy = _rowq8(y_c)
    acc = jax.lax.dot_general(
        yq, kq, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.dtype(ldt),
    ).astype(jnp.float32)
    logits = acc * (sy[:, None] * sk[None, :])
    if scale != 1.0:
        logits = logits * scale
    if soft_cap > 0.0:
        logits = soft_cap * jnp.tanh(logits / soft_cap)
    return logits


def _q8_ce_fwd_impl(yc, kernel, tc, wc, z_loss, soft_cap, scale, ldt):
    kq, sk = _colq8(kernel)

    def body(acc, xs):
        y_c, t_c, w_c = xs
        logits = _q8_logits(y_c, kq, sk, soft_cap, scale, ldt)
        m = jnp.max(logits, axis=-1)
        l = jnp.sum(jnp.exp(logits - m[:, None]), axis=-1)
        lse = jnp.log(l) + m
        tl = jnp.take_along_axis(logits, t_c[:, None], axis=-1)[:, 0]
        total = (lse - tl) + z_loss * jnp.square(lse)
        return acc + jnp.sum(total * w_c), lse

    loss_sum, lse = jax.lax.scan(
        body, jnp.zeros((), jnp.float32), (yc, tc, wc)
    )
    return loss_sum, (kq, sk, lse)


def _q8_ce_fwd(yc, kernel, tc, wc, z_loss, soft_cap, scale, ldt):
    loss_sum, (kq, sk, lse) = _q8_ce_fwd_impl(
        yc, kernel, tc, wc, z_loss, soft_cap, scale, ldt
    )
    return loss_sum, (yc, kq, sk, tc, wc, lse,
                      jnp.zeros((), kernel.dtype))  # dtype sentinel


def _q8_ce_bwd(z_loss, soft_cap, scale, ldt, res, g):
    yc, kq, sk, tc, wc, lse, ksent = res
    kdtype = ksent.dtype
    t_chunks, c, e = yc.shape
    v = kq.shape[1]

    def body(dw, xs):
        y_c, t_c, w_c, lse_c = xs
        logits = _q8_logits(y_c, kq, sk, soft_cap, scale, ldt)
        p = jnp.exp(logits - lse_c[:, None])
        coef = w_c * g
        pz = coef * (1.0 + 2.0 * z_loss * lse_c)
        if soft_cap > 0.0:
            # logits holds the POST-cap value: logits/cap = tanh(x), and
            # d(cap*tanh(x/cap))/dx = 1 - tanh^2
            capchain = 1.0 - jnp.square(logits / soft_cap)
        else:
            capchain = None
        # dlog splits into the SMOOTH softmax part and the one-hot target
        # spike. The spike's magnitude (~coef) sets the int8 absmax scale,
        # which would crush the ~1/V-sized softmax terms to the quantization
        # step — so only the smooth part is quantized for the dy matmul and
        # the spike's dy contribution is applied EXACTLY via an [E]-column
        # gather of the int8 kernel (E*chunk values, free next to the
        # matmul).
        dsoft = p * pz[:, None]
        if capchain is not None:
            dsoft = dsoft * capchain
        if scale != 1.0:
            dsoft = dsoft * scale
        # fold the per-column sk INTO the operand so the matmul itself is
        # int8 x int8 (sk sits inside the V-contraction)
        gq, sg = _rowq8(dsoft * sk[None, :])
        dy_c = jax.lax.dot_general(
            gq, kq, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sg[:, None]
        # exact one-hot correction: row r subtracts
        # coef_r * capchain[r, t_r] * scale * W_deq[:, t_r]
        spike = -coef * scale
        if capchain is not None:
            spike = spike * jnp.take_along_axis(
                capchain, t_c[:, None], axis=-1)[:, 0]
        w_t = jnp.take(kq, t_c, axis=1).astype(jnp.float32).T  # [C, E]
        dy_c = dy_c + (spike * sk[t_c])[:, None] * w_t
        # full dlog only for the bf16 dW matmul (no quantization issue: the
        # matmul contracts over rows, not within them)
        dlog = dsoft.at[jnp.arange(c), t_c].add(spike)
        # dW w.r.t. the RAW kernel (straight-through past quantization)
        dwt = jax.lax.dot_general(
            y_c.astype(jnp.bfloat16), dlog.astype(jnp.bfloat16),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        return dw + dwt.astype(dw.dtype), dy_c

    dw0 = jnp.zeros((e, v), kdtype)
    dw, dy = jax.lax.scan(body, dw0, (yc, tc, wc, lse))
    return dy.astype(yc.dtype), dw, None, None


_q8_ce.defvjp(_q8_ce_fwd, _q8_ce_bwd)


def masked_cross_entropy(
    logits: jax.Array,
    targets: jax.Array,
    weights: jax.Array,
    z_loss: float = 0.0,
) -> tuple[jax.Array, jax.Array]:
    """Weighted mean CE over valid tokens.

    Returns (mean_loss, total_weight). ``weights`` is typically the segment
    mask (1 for real tokens, 0 for padding).
    """
    total, _ = cross_entropy_with_logits(logits, targets, z_loss)
    total = total * weights
    denom = jnp.maximum(jnp.sum(weights), 1e-6)
    return jnp.sum(total) / denom, denom
