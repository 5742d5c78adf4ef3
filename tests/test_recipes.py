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
