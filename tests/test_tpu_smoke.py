"""On-chip Pallas kernel smoke tests (@pytest.mark.tpu).

Skipped on the CPU test mesh (tests/conftest.py); run for real with

    MTT_TPU_TESTS=1 python -m pytest tests/test_tpu_smoke.py -q

on a machine with an attached TPU. Each test compiles one Pallas kernel
with Mosaic on the real chip and asserts numerical parity against a
pure-jnp reference on tiny shapes — interpret mode has twice missed real
lowering failures (PERF.md), so this is the regression net the CI suite
cannot provide. Same checks power the `MTT_BENCH=smoke` bench pre-flight.
(Reference discipline anchor: MaxText pytest.ini:15-22 tpu_only markers.)
"""

import pytest

from maxtext_indextts2_tpu.ops import smoke

pytestmark = pytest.mark.tpu


@pytest.mark.parametrize("name", sorted(smoke.CHECKS))
def test_kernel_parity_on_chip(name):
    import jax

    assert jax.default_backend() == "tpu", (
        "tpu-marked smoke must run on a real chip (MTT_TPU_TESTS=1)"
    )
    res = smoke.CHECKS[name]()
    assert res["ok"], res
