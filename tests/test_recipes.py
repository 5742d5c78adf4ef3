"""Recipe regression tests (reference: benchmarks/recipes/ CI recipes).

Each recipe is a runnable module with a run(argv)->dict contract; these
drive them at reduced step counts on the CPU test mesh.
"""

import pytest

from benchmarks.recipes import elastic_training, long_running


@pytest.mark.slow
def test_elastic_training_recipe():
    out = elastic_training.run(["steps=10"])
    assert out["ok"], out
    assert out["recoveries"] == 2


@pytest.mark.slow
def test_long_running_recipe():
    out = long_running.run(["steps=12", "checkpoint_period=5"])
    assert out["ok"], out
    assert out["checkpoints"] >= 2


@pytest.mark.slow
def test_full_tts_train_recipe_plumbing():
    """Reduced-size drive of the trained-weights end-to-end loop: all three
    stages train, the engine decodes semantics from text, S2A + codec
    produce audio, MCD is scored. The quality gate needs full step counts
    (recorded pass: lm_sem_accuracy 1.0, MCD == oracle — PERF.md); here we
    assert the structural contract only."""
    from benchmarks.recipes import full_tts_train

    out = full_tts_train.run([
        "codec_steps=30", "s2a_steps=30", "lm_steps=60", "pool=64",
    ])
    for key in ("lm_sem_accuracy", "mcd_e2e_db", "mcd_oracle_db", "ok"):
        assert key in out
    assert out["mcd_e2e_db"] > 0 and out["mcd_oracle_db"] > 0


def test_workload_generator_commands():
    """Workload generation (reference: benchmarks/maxtext_xpk_runner.py):
    commands are well-formed and EVERY tuned model's overrides validate
    through the real config schema on its target topology — the libraries
    cannot drift from the config."""
    import shlex

    import benchmarks.workload_gen as wg
    from maxtext_indextts2_tpu.config import load_config

    cmds = wg.generate_sweep("v5e", "v5e-256", (1, 2))
    assert len(cmds) == 2 * len(wg.V5E_MODELS)
    for cmd in cmds:
        assert cmd.startswith("xpk workload create ")
        assert "--device-type=v5e-256" in cmd
        assert "python -m maxtext_indextts2_tpu.train.train" in cmd

    topology = {"v5e": "v5e-256", "v5p": "v5p-512", "v6e": "v6e-256"}
    for platform, library in wg.PLATFORM_LIBRARIES.items():
        for model in library.values():
            overrides = [f"{k}={v}" for k, v in model.overrides.items()]
            cfg = load_config(overrides + [
                f"compile_topology={topology[platform]}",
            ])
            assert cfg.global_batch_size_to_train_on > 0

    wl = wg.WorkloadConfig(model=wg.V5E_MODELS["tts-1b-bf16"],
                           topology="v5e-8")
    mh = wg.generate_multihost_cmd(wl)
    assert "multihost_runner.py" in mh and "--tpu-prefix=" in mh
    # the embedded train command round-trips through shlex
    assert any("train.train" in tok for tok in shlex.split(mh))
