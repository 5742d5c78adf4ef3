"""Extended quantizer tests: EMA Euclidean codebook, VectorQuantize, LFQ.

Oracle: the reference's quantize_extended.py modules run as-is (pure torch),
so training-step and eval parity are checked directly against them.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from test_torch_ckpt import load_ref_maskgct  # noqa: E402

from maxtext_indextts2_tpu.audio.quantize_extended import (  # noqa: E402
    EuclideanCodebook,
    LookupFreeQuantize,
    VectorQuantize,
    kmeans,
)


def _ref_ext():
    import importlib.util
    import sys

    name = "refmaskgct.quantize_extended"
    if name not in sys.modules:
        load_ref_maskgct()
        spec = importlib.util.spec_from_file_location(
            name,
            "/root/reference/MaxText/input_pipeline/maskgct/acoustic/quantize_extended.py",
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
    return sys.modules[name]


def test_kmeans_blobs():
    """k-means assigns every point and every occupied mean sits on a blob.

    (Plain Lloyd — like the reference's — can leave a blob uncovered under
    an unlucky random init, so full coverage is not asserted.)
    """
    rng = np.random.default_rng(0)
    centers = np.array([[0, 0], [10, 10], [-10, 10], [10, -10]], np.float32)
    pts = np.concatenate(
        [c + 0.1 * rng.standard_normal((50, 2)).astype(np.float32) for c in centers]
    )
    means, bins = jax.jit(lambda r, s: kmeans(r, s, 4, 20))(
        jax.random.PRNGKey(1), jnp.asarray(pts)
    )
    means, bins = np.asarray(means), np.asarray(bins)
    assert int(bins.sum()) == 200
    # Lloyd fixed point: every occupied mean is the centroid of its points
    assign = np.argmin(
        np.linalg.norm(pts[:, None] - means[None], axis=-1), axis=1
    )
    for k in range(4):
        if bins[k] > 0:
            np.testing.assert_allclose(
                pts[assign == k].mean(axis=0), means[k], atol=1e-3
            )
            assert (assign == k).sum() == bins[k]
    # and the clustering separates at least two of the true blobs
    assert len({int(np.argmin(np.linalg.norm(m - centers, axis=-1)))
                for m in means[bins > 0]}) >= 2


def test_euclidean_codebook_train_step_matches_torch():
    """One EMA training step (quantize + cluster-size/embed updates) matches
    the reference EuclideanCodebook bit-for-bit (expiry disabled — it is
    rng-dependent)."""
    ext = _ref_ext()
    torch.manual_seed(0)
    ref = ext.EuclideanCodebook(
        dim=6, codebook_size=10, kmeans_init=False, decay=0.8,
        threshold_ema_dead_code=0,
    ).train()

    ours = EuclideanCodebook(dim=6, codebook_size=10, decay=0.8,
                             threshold_ema_dead_code=0.0)
    x = np.random.default_rng(1).standard_normal((4, 7, 6)).astype(np.float32)
    variables = {
        "codebook": {
            "initted": jnp.asarray(True),
            "cluster_size": jnp.zeros(10),
            "embed": jnp.asarray(ref.embed.numpy()),
            "embed_avg": jnp.asarray(ref.embed_avg.numpy()),
            "step": jnp.zeros((), jnp.int32),
        }
    }
    (q, idx), upd = ours.apply(
        variables, jnp.asarray(x), train=True, rng=jax.random.PRNGKey(0),
        mutable=["codebook"],
    )
    with torch.no_grad():
        tq, tidx = ref(torch.from_numpy(x))
    np.testing.assert_array_equal(np.asarray(idx), tidx.numpy())
    np.testing.assert_allclose(np.asarray(q), tq.numpy(), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(upd["codebook"]["cluster_size"]),
        ref.cluster_size.numpy(), atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(upd["codebook"]["embed_avg"]), ref.embed_avg.numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(upd["codebook"]["embed"]), ref.embed.numpy(),
        atol=1e-5, rtol=1e-5,
    )


def test_euclidean_dead_code_expiry():
    """Codes with EMA cluster size below threshold are resampled from the
    batch; live codes keep their EMA update."""
    ours = EuclideanCodebook(dim=4, codebook_size=8, decay=0.5,
                             threshold_ema_dead_code=2.0)
    rng = np.random.default_rng(2)
    # all points near one codebook row -> other rows starve
    base = np.array([5.0, 5.0, 5.0, 5.0], np.float32)
    x = (base + 0.01 * rng.standard_normal((1, 64, 4))).astype(np.float32)
    embed0 = np.eye(8, 4, dtype=np.float32) * 10
    embed0[0] = base
    variables = {
        "codebook": {
            "initted": jnp.asarray(True),
            "cluster_size": jnp.zeros(8),
            "embed": jnp.asarray(embed0),
            "embed_avg": jnp.asarray(embed0),
            "step": jnp.zeros((), jnp.int32),
        }
    }
    (_, idx), upd = ours.apply(
        variables, jnp.asarray(x), train=True, rng=jax.random.PRNGKey(3),
        mutable=["codebook"],
    )
    assert (np.asarray(idx) == 0).all()
    new_embed = np.asarray(upd["codebook"]["embed"])
    # starved rows were replaced by batch vectors (near `base`), not EMA
    assert np.abs(new_embed[1:] - base).max() < 1.0


def test_vector_quantize_matches_torch_eval():
    """Projected euclidean VQ (weight-normed 1x1 projections) eval parity
    with the reference VectorQuantize."""
    ext = _ref_ext()
    from maxtext_indextts2_tpu.audio.torch_ckpt import (
        _conv1x1_as_dense,
        fold_weight_norm,
    )

    torch.manual_seed(1)
    ref = ext.VectorQuantize(
        input_dim=12, codebook_size=16, codebook_dim=4,
        codebook_type="euclidean", kmeans_init=False,
        threshold_ema_dead_code=0,
    ).eval()
    with torch.no_grad():
        ref.codebook.embed.mul_(2.0)

    sd = fold_weight_norm({k: v.numpy() for k, v in ref.state_dict().items()})
    variables = {
        "params": {
            "in_proj": _conv1x1_as_dense(sd, "in_project"),
            "out_proj": _conv1x1_as_dense(sd, "out_project"),
        },
        "codebook": {
            "codebook": {
                "initted": jnp.asarray(True),
                "cluster_size": jnp.asarray(sd["codebook.cluster_size"]),
                "embed": jnp.asarray(sd["codebook.embed"]),
                "embed_avg": jnp.asarray(sd["codebook.embed_avg"]),
                "step": jnp.zeros((), jnp.int32),
            }
        },
    }
    ours = VectorQuantize(input_dim=12, codebook_size=16, codebook_dim=4,
                          codebook_type="euclidean",
                          threshold_ema_dead_code=0.0)

    x = np.random.default_rng(3).standard_normal((2, 9, 12)).astype(np.float32)
    res = ours.apply(variables, jnp.asarray(x))
    with torch.no_grad():
        z_q, _, _, t_idx, _ = ref(torch.from_numpy(x.transpose(0, 2, 1)))
    np.testing.assert_array_equal(np.asarray(res.indices), t_idx.numpy())
    np.testing.assert_allclose(
        np.asarray(res.quantized), z_q.numpy().transpose(0, 2, 1),
        atol=2e-5, rtol=1e-4,
    )
    # vq2emb round trip
    emb = ours.apply(variables, res.indices, method=VectorQuantize.vq2emb)
    t_emb = ref.vq2emb(t_idx.long())
    np.testing.assert_allclose(
        np.asarray(emb), t_emb.detach().numpy().transpose(0, 2, 1),
        atol=2e-5, rtol=1e-4,
    )


def test_lfq_matches_torch():
    """Lookup-free quantization parity: sigmoid-space binary rounding and
    bit-packed indices."""
    ext = _ref_ext()
    from maxtext_indextts2_tpu.audio.torch_ckpt import (
        _conv1x1_as_dense,
        fold_weight_norm,
    )

    torch.manual_seed(2)
    ref = ext.LookupFreeQuantize(input_dim=10, codebook_size=16, codebook_dim=4).eval()
    sd = fold_weight_norm({k: v.numpy() for k, v in ref.state_dict().items()})
    variables = {
        "params": {
            "in_proj": _conv1x1_as_dense(sd, "in_project"),
            "out_proj": _conv1x1_as_dense(sd, "out_project"),
        }
    }
    ours = LookupFreeQuantize(input_dim=10, codebook_size=16, codebook_dim=4)

    x = np.random.default_rng(4).standard_normal((2, 6, 10)).astype(np.float32)
    res = ours.apply(variables, jnp.asarray(x))
    with torch.no_grad():
        z_q, _, _, t_idx, _ = ref(torch.from_numpy(x.transpose(0, 2, 1)))
    np.testing.assert_array_equal(np.asarray(res.indices), t_idx.numpy())
    np.testing.assert_allclose(
        np.asarray(res.quantized), z_q.numpy().transpose(0, 2, 1),
        atol=2e-5, rtol=1e-4,
    )
    assert 0 <= int(np.asarray(res.indices).min())
    assert int(np.asarray(res.indices).max()) < 16


def test_euclidean_kmeans_init_under_jit():
    """kmeans_init=True initializes from the first batch inside a jitted
    training step (lax.cond path) and marks initted."""
    ours = EuclideanCodebook(dim=4, codebook_size=6, kmeans_init=True,
                             kmeans_iters=5, threshold_ema_dead_code=0.0)
    x = np.random.default_rng(5).standard_normal((2, 16, 4)).astype(np.float32)
    variables = ours.init(
        jax.random.PRNGKey(0), jnp.asarray(x), train=False
    )
    assert not bool(variables["codebook"]["initted"])

    @jax.jit
    def step(v, x):
        return ours.apply(v, x, train=True, rng=jax.random.PRNGKey(1),
                          mutable=["codebook"])

    (_, idx), upd = step(variables, jnp.asarray(x))
    assert bool(upd["codebook"]["initted"])
    # initialized means come from the data's neighborhood
    assert np.abs(np.asarray(upd["codebook"]["embed"])).max() < 5.0
    assert int(np.asarray(idx).max()) < 6


# ---------------------------------------------------------------- masking


def test_masking_schedules_match_reference():
    """Schedule values match the reference formulas (masking_utils.py:9)."""
    import importlib.util
    import sys

    from maxtext_indextts2_tpu.audio import masking

    name = "refmaskgct.masking_utils"
    if name not in sys.modules:
        load_ref_maskgct()
        spec = importlib.util.spec_from_file_location(
            name, "/root/reference/MaxText/input_pipeline/maskgct/s2a/masking_utils.py"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
    ref = sys.modules[name]

    for sched in ("linear", "cosine", "arccos"):
        np.testing.assert_allclose(
            masking.get_mask_layer_schedule(sched, 12),
            ref.get_mask_layer_schedule(sched, 12), atol=1e-6,
        )
    assert masking.get_layer_mask_prob(3, masking.get_mask_layer_schedule("linear", 12)) == pytest.approx(
        ref.get_layer_mask_prob(3, ref.get_mask_layer_schedule("linear", 12))
    )
    # mask builders agree with the torch reference on the same inputs
    lengths = np.array([3, 5])
    np.testing.assert_array_equal(
        np.asarray(masking.create_padding_mask(jnp.asarray(lengths), 6)),
        ref.create_padding_mask(torch.from_numpy(lengths), 6).numpy(),
    )
    np.testing.assert_array_equal(
        np.asarray(masking.create_causal_mask(5)),
        ref.create_causal_mask(5).numpy(),
    )
    seq = np.arange(12).reshape(2, 6)
    m = np.zeros((2, 6), bool); m[0, 1] = m[1, 4] = True
    np.testing.assert_array_equal(
        np.asarray(masking.apply_mask_to_sequence(jnp.asarray(seq), jnp.asarray(m), 99)),
        ref.apply_mask_to_sequence(torch.from_numpy(seq), torch.from_numpy(m), 99).numpy(),
    )
    # masked CE equals the reference's ignore_index cross entropy
    rng = np.random.default_rng(7)
    logits = rng.standard_normal((2, 6, 10)).astype(np.float32)
    targets = rng.integers(0, 10, (2, 6))
    ours = float(masking.compute_masked_loss(
        jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(m)))
    theirs = float(ref.compute_masked_loss(
        torch.from_numpy(logits), torch.from_numpy(targets), torch.from_numpy(m)))
    assert ours == pytest.approx(theirs, abs=1e-5)


def test_structured_mask_coverage():
    """Span mask is jittable, span-shaped, and covers roughly mask_prob."""
    from maxtext_indextts2_tpu.audio import masking

    mask = jax.jit(
        lambda r: masking.create_structured_mask(r, (8, 256), 0.4, 2, 10)
    )(jax.random.PRNGKey(0))
    mask = np.asarray(mask)
    frac = mask.mean()
    assert 0.2 < frac < 0.7
    # spans: the number of 0->1 transitions is far below the masked count
    transitions = np.diff(mask.astype(np.int8), axis=1) == 1
    assert transitions.sum() < mask.sum() / 1.5
