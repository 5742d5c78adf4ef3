"""Extended vector quantizers: EMA Euclidean codebook (kmeans init,
dead-code expiry), plain/simple codebooks, and lookup-free quantization.

Counterpart of reference maskgct/acoustic/quantize_extended.py
(EuclideanCodebook:76, SimpleCodebook:~200, VectorQuantize:258,
LookupFreeQuantize:404). TPU-first choices:

- All nearest-neighbor searches and k-means steps are MXU matmuls
  (||x||^2 - 2 x.c + ||c||^2 expansion and one-hot-matmul scatter) — never
  the [N, K, D] broadcast the reference materializes.
- EMA state (embed / embed_avg / cluster_size / initted) lives in a flax
  variable collection ``"codebook"``; training steps run fully under jit
  with ``mutable=["codebook"]``. K-means init on the first batch is a
  ``lax.cond`` on the ``initted`` flag — no python branching on tensors.
- Dead-code expiry resamples batch rows with an explicit rng (the reference
  uses global torch randomness).

Known reference defects NOT carried: SimpleCodebook.forward passes the
Embedding *module* to F.embedding (TypeError at runtime); here lookups use
the weight array. Layout is [B, T, D] channels-last throughout (the torch
reference is [B, D, T]).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from maxtext_indextts2_tpu.audio.quantize import QuantizeResult, _l2norm


def _sq_dist_neg(flat: jax.Array, embed: jax.Array) -> jax.Array:
    """-(||x - c||^2) as [N, K] via one matmul (embed: [K, D])."""
    return -(
        jnp.sum(jnp.square(flat), axis=1, keepdims=True)
        - 2.0 * flat @ embed.T
        + jnp.sum(jnp.square(embed), axis=1)[None, :]
    )


def sample_vectors(rng: jax.Array, samples: jax.Array, num: int) -> jax.Array:
    """num rows from samples [N, D]: permutation when N >= num else with
    replacement (reference quantize_extended.py:35)."""
    n = samples.shape[0]
    if n >= num:
        idx = jax.random.permutation(rng, n)[:num]
    else:
        idx = jax.random.randint(rng, (num,), 0, n)
    return jnp.take(samples, idx, axis=0)


def kmeans(
    rng: jax.Array,
    samples: jax.Array,
    num_clusters: int,
    num_iters: int = 10,
    use_cosine_sim: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Lloyd iterations, jittable with static num_iters.

    Returns (means [K, D], bins [K]). Assignment and the per-cluster mean
    are both matmuls (one-hot [N, K]); empty clusters keep their old mean
    (reference quantize_extended.py:45-73).
    """
    k = num_clusters
    means = sample_vectors(rng, samples, k)

    def step(_, means):
        if use_cosine_sim:
            dists = samples @ means.T
        else:
            dists = _sq_dist_neg(samples, means)
        onehot = jax.nn.one_hot(jnp.argmax(dists, axis=-1), k, dtype=samples.dtype)
        bins = jnp.sum(onehot, axis=0)  # [K]
        new_means = onehot.T @ samples / jnp.maximum(bins, 1.0)[:, None]
        if use_cosine_sim:
            new_means = _l2norm(new_means)
        return jnp.where((bins == 0)[:, None], means, new_means)

    means = jax.lax.fori_loop(0, num_iters, step, means)
    if use_cosine_sim:
        dists = samples @ means.T
    else:
        dists = _sq_dist_neg(samples, means)
    onehot = jax.nn.one_hot(jnp.argmax(dists, axis=-1), k, dtype=samples.dtype)
    return means, jnp.sum(onehot, axis=0)


class EuclideanCodebook(nn.Module):
    """EMA codebook (reference quantize_extended.py:76).

    State in the ``"codebook"`` collection; call with
    ``mutable=["codebook"]`` and ``train=True`` to run the EMA/expiry
    updates under jit.
    """

    dim: int
    codebook_size: int
    kmeans_init: bool = False
    kmeans_iters: int = 10
    decay: float = 0.8
    eps: float = 1e-5
    threshold_ema_dead_code: float = 2.0

    def setup(self):
        k, d = self.codebook_size, self.dim
        init_rng = jax.random.PRNGKey(0)
        self.initted = self.variable(
            "codebook", "initted",
            lambda: jnp.asarray(not self.kmeans_init, jnp.bool_),
        )
        self.cluster_size = self.variable(
            "codebook", "cluster_size", lambda: jnp.zeros((k,), jnp.float32)
        )
        self.embed = self.variable(
            "codebook", "embed", lambda: jax.random.normal(init_rng, (k, d))
        )
        self.embed_avg = self.variable(
            "codebook", "embed_avg", lambda: self.embed.value
        )
        # step counter: keeps the no-rng fallback deterministic but VARYING
        # (a constant fallback key would resample the same expiry rows every
        # training step)
        self.step = self.variable(
            "codebook", "step", lambda: jnp.zeros((), jnp.int32)
        )

    def _maybe_kmeans_init(self, flat, rng):
        def do_init(_):
            means, bins = kmeans(rng, flat, self.codebook_size, self.kmeans_iters)
            return means, means, bins, jnp.asarray(True)

        def keep(_):
            return (
                self.embed.value, self.embed_avg.value,
                self.cluster_size.value, self.initted.value,
            )

        embed, avg, csize, initted = jax.lax.cond(
            self.initted.value, keep, do_init, operand=None
        )
        self.embed.value, self.embed_avg.value = embed, avg
        self.cluster_size.value, self.initted.value = csize, initted

    def __call__(self, x, train: bool = False, rng: jax.Array | None = None):
        """x: [..., dim] -> (quantized [..., dim], indices [...])."""
        flat = x.reshape(-1, self.dim)
        if train:
            if rng is None:
                rng = jax.random.fold_in(jax.random.PRNGKey(0), self.step.value)
            self.step.value = self.step.value + 1
            r_init, r_expire = jax.random.split(rng)
            self._maybe_kmeans_init(flat, r_init)

        embed = self.embed.value
        dist = _sq_dist_neg(flat, embed)
        idx_flat = jnp.argmax(dist, axis=-1).astype(jnp.int32)
        indices = idx_flat.reshape(x.shape[:-1])
        quantize = jnp.take(embed, indices, axis=0)

        if train:
            onehot = jax.nn.one_hot(idx_flat, self.codebook_size, dtype=jnp.float32)
            counts = jnp.sum(onehot, axis=0)
            csize = self.cluster_size.value * self.decay + counts * (1 - self.decay)
            embed_sum = onehot.T @ flat  # [K, D] one matmul
            avg = self.embed_avg.value * self.decay + embed_sum * (1 - self.decay)
            smoothed = (
                (csize + self.eps) / (csize.sum() + self.codebook_size * self.eps)
            ) * csize.sum()
            new_embed = avg / smoothed[:, None]
            # dead-code expiry (reference expire_codes_:126)
            if self.threshold_ema_dead_code > 0:
                expired = csize < self.threshold_ema_dead_code
                new_embed = jnp.where(
                    expired[:, None],
                    sample_vectors(r_expire, flat, self.codebook_size),
                    new_embed,
                )
            self.cluster_size.value = csize
            self.embed_avg.value = avg
            self.embed.value = new_embed

        return quantize, indices

    def vq2emb(self, indices):
        return jnp.take(self.embed.value, indices, axis=0)

    def latent2dist(self, x):
        flat = x.reshape(-1, self.dim)
        dist = _sq_dist_neg(flat, self.embed.value)
        idx = jnp.argmax(dist, axis=-1).astype(jnp.int32).reshape(x.shape[:-1])
        return (
            dist.reshape(*x.shape[:-1], -1),
            idx,
            jnp.take(self.embed.value, idx, axis=0),
        )


class SimpleCodebook(nn.Module):
    """Learned (gradient-trained) codebook, optional l2-normalized search."""

    dim: int
    codebook_size: int
    use_l2_normalize: bool = False

    def setup(self):
        self.embed = self.param(
            "embed", nn.initializers.normal(1.0),
            (self.codebook_size, self.dim), jnp.float32,
        )

    def __call__(self, x):
        flat = x.reshape(-1, self.dim)
        cb = self.embed
        if self.use_l2_normalize:
            flat, cb = _l2norm(flat), _l2norm(cb)
        idx = (
            jnp.argmax(_sq_dist_neg(flat, cb), axis=-1)
            .astype(jnp.int32)
            .reshape(x.shape[:-1])
        )
        return jnp.take(self.embed, idx, axis=0), idx

    def vq2emb(self, indices):
        return jnp.take(self.embed, indices, axis=0)


class VectorQuantize(nn.Module):
    """Projected VQ over an EMA or simple codebook
    (reference quantize_extended.py:258). API mirrors
    audio/quantize.py FactorizedVectorQuantize; layout [B, T, D]."""

    input_dim: int
    codebook_size: int
    codebook_dim: int
    commitment: float = 0.005
    codebook_loss_weight: float = 1.0
    use_l2_normalize: bool = False
    codebook_type: str = "euclidean"  # "euclidean" | "simple"
    kmeans_init: bool = False
    kmeans_iters: int = 10
    decay: float = 0.8
    eps: float = 1e-5
    threshold_ema_dead_code: float = 2.0

    def setup(self):
        if self.input_dim != self.codebook_dim:
            self.in_proj = nn.Dense(self.codebook_dim, name="in_proj")
            self.out_proj = nn.Dense(self.input_dim, name="out_proj")
        if self.codebook_type == "euclidean":
            self.codebook = EuclideanCodebook(
                self.codebook_dim, self.codebook_size,
                kmeans_init=self.kmeans_init, kmeans_iters=self.kmeans_iters,
                decay=self.decay, eps=self.eps,
                threshold_ema_dead_code=self.threshold_ema_dead_code,
            )
        elif self.codebook_type == "simple":
            self.codebook = SimpleCodebook(
                self.codebook_dim, self.codebook_size,
                use_l2_normalize=self.use_l2_normalize,
            )
        else:
            raise NotImplementedError(self.codebook_type)

    def _project_in(self, x):
        return self.in_proj(x) if self.input_dim != self.codebook_dim else x

    def _project_out(self, z):
        return self.out_proj(z) if self.input_dim != self.codebook_dim else z

    def __call__(self, x, train: bool = False, rng=None) -> QuantizeResult:
        z_e = self._project_in(x)
        if self.codebook_type == "euclidean":
            z_q, indices = self.codebook(z_e, train=train, rng=rng)
        else:
            z_q, indices = self.codebook(z_e)

        commit = jnp.mean(jnp.square(z_e - jax.lax.stop_gradient(z_q)))
        codebook = jnp.mean(jnp.square(jax.lax.stop_gradient(z_e) - z_q))
        z_q = z_e + jax.lax.stop_gradient(z_q - z_e)
        return QuantizeResult(
            self._project_out(z_q), indices,
            commit * self.commitment, codebook * self.codebook_loss_weight,
        )

    def vq2emb(self, indices):
        return self._project_out(self.codebook.vq2emb(indices))


class LookupFreeQuantize(nn.Module):
    """LFQ: binary round in sigmoid space; the code IS the index bits
    (reference quantize_extended.py:404). codebook_size must be
    2**codebook_dim."""

    input_dim: int
    codebook_size: int
    codebook_dim: int

    def setup(self):
        assert 2 ** self.codebook_dim == self.codebook_size
        if self.input_dim != self.codebook_dim:
            self.in_proj = nn.Dense(self.codebook_dim, name="in_proj")
            self.out_proj = nn.Dense(self.input_dim, name="out_proj")

    def _project_in(self, x):
        return self.in_proj(x) if self.input_dim != self.codebook_dim else x

    def _project_out(self, z):
        return self.out_proj(z) if self.input_dim != self.codebook_dim else z

    def __call__(self, x) -> QuantizeResult:
        z_e = jax.nn.sigmoid(self._project_in(x))
        z_q = z_e + jax.lax.stop_gradient(jnp.round(z_e) - z_e)
        bits = (2 ** jnp.arange(self.codebook_dim, dtype=jnp.int32))[None, None, :]
        indices = jnp.sum(
            jnp.round(jax.lax.stop_gradient(z_e)).astype(jnp.int32) * bits, axis=-1
        )
        zero = jnp.zeros((), jnp.float32)
        return QuantizeResult(self._project_out(z_q), indices, zero, zero)

    def vq2emb(self, indices, out_proj: bool = True):
        bits = jnp.stack(
            [(indices // (2 ** i)) % 2 for i in range(self.codebook_dim)], axis=-1
        ).astype(jnp.float32)
        return self._project_out(bits) if out_proj else bits
