"""Cluster workload generation: tuned model libraries + launch commands.

Reference capability: benchmarks/maxtext_xpk_runner.py (WorkloadConfig:86,
generate_xpk_workload_cmd:578) + the per-platform tuned model libraries
(maxtext_v5e_model_configs.py, maxtext_v5p_model_configs.py,
maxtext_trillium_model_configs.py) — ~4.8k LoC of workload plumbing.

Here the same capability in one module:

- ``TunedModel``: a named, per-platform-tuned set of config overrides +
  XLA flags. The libraries below carry THIS repo's measured-best settings
  (PERF.md) rather than translated reference numbers.
- ``WorkloadConfig`` -> ``generate_workload_cmd``: an `xpk workload create`
  command for XPK clusters, or a tools/multihost_runner.py command for
  plain TPU-VM fleets (reference root multihost_runner.py).
- ``generate_sweep``: the cross-product runner the reference drives its
  benchmark tables with.

Every tuned model's overrides are validated against the real config schema
in tests (tests/test_recipes.py) so the libraries cannot drift.
"""

from __future__ import annotations

import dataclasses
import os
import shlex
from typing import Any

# XLA flag sets that matter on TPU fleets (names are standard XLA options).
ASYNC_COLLECTIVES = (
    "--xla_enable_async_all_gather=true "
    "--xla_enable_async_reduce_scatter=true "
    "--xla_tpu_enable_async_collective_fusion=true "
    "--xla_tpu_enable_async_collective_fusion_fuse_all_gather=true"
)
HOST_OFFLOAD = "--xla_tpu_enable_all_experimental_scheduler_features=true"


@dataclasses.dataclass(frozen=True)
class TunedModel:
    name: str
    overrides: dict[str, Any]
    xla_flags: str = ""


def _tts_1b(batch: int, remat: str = "save_attn_and_mlp", **extra) -> dict:
    # measured-best 1B recipe (PERF.md "1B training MFU"): unrolled layers,
    # bf16 masters, selective remat, flash [1024,1024]
    return {
        "model_name": "tts-1b",
        "per_device_batch_size": batch,
        "scan_layers": False,
        "remat_policy": remat,
        "weight_dtype": "bfloat16",
        "cast_logits_to_fp32": False,
        "attention": "flash",
        "flash_block_sizes": "[1024,1024]",
        **extra,
    }


V5E_MODELS = {
    "tts-1b-bf16": TunedModel("tts-1b-bf16", _tts_1b(4), ASYNC_COLLECTIVES),
    "tts-1b-int8": TunedModel(
        "tts-1b-int8", _tts_1b(4, quantization="int8"), ASYNC_COLLECTIVES
    ),
    "tts-flagship-fsdp": TunedModel(
        "tts-flagship-fsdp",
        {
            "model_name": "tts-flagship",
            "per_device_batch_size": 2,
            "ici_fsdp_parallelism": -1,
            "remat_policy": "full",
            "weight_dtype": "bfloat16",
            "attention": "flash",
        },
        ASYNC_COLLECTIVES,
    ),
    "llama3-8b": TunedModel(
        "llama3-8b",
        {
            "model_name": "llama3-8b",
            "per_device_batch_size": 2,
            "ici_fsdp_parallelism": -1,
            "remat_policy": "full",
            "attention": "flash",
        },
        ASYNC_COLLECTIVES,
    ),
}

V5P_MODELS = {
    # v5p: 2x HBM (95GB) and 2x matmul throughput per chip -> bigger batch,
    # lighter remat
    "tts-1b-bf16": TunedModel(
        "tts-1b-bf16", _tts_1b(8, remat="save_attn_and_mlp"), ASYNC_COLLECTIVES
    ),
    "llama2-70b": TunedModel(
        "llama2-70b",
        {
            "model_name": "llama2-70b",
            "per_device_batch_size": 4,
            "ici_fsdp_parallelism": -1,
            "remat_policy": "save_attn_out",
            "attention": "flash",
        },
        ASYNC_COLLECTIVES + " " + HOST_OFFLOAD,
    ),
}

TRILLIUM_MODELS = {
    "tts-1b-bf16": TunedModel(
        "tts-1b-bf16", _tts_1b(8), ASYNC_COLLECTIVES
    ),
    "qwen3-30b-a3b": TunedModel(
        "qwen3-30b-a3b",
        {
            "model_name": "qwen3-30b-a3b",
            "per_device_batch_size": 4,
            "ici_fsdp_parallelism": -1,
            "ici_expert_parallelism": 1,
            "remat_policy": "full",
            "attention": "flash",
        },
        ASYNC_COLLECTIVES,
    ),
}

PLATFORM_LIBRARIES = {
    "v5e": V5E_MODELS,
    "v5p": V5P_MODELS,
    "v6e": TRILLIUM_MODELS,
}


@dataclasses.dataclass
class WorkloadConfig:
    model: TunedModel
    topology: str  # e.g. "v5e-256"
    num_slices: int = 1
    num_steps: int = 20
    base_output_directory: str = "gs://OUTPUT_BUCKET"
    docker_image: str = "maxtext-indextts2-tpu:latest"
    cluster: str = "CLUSTER"
    zone: str = "ZONE"
    project: str = "PROJECT"
    priority: str = "medium"
    max_restarts: int = 0
    run_name: str = ""

    def __post_init__(self):
        if not self.run_name:
            self.run_name = (
                f"{self.model.name}-{self.topology}-{self.num_slices}x"
            ).replace("_", "-")


def _train_command(wl: WorkloadConfig) -> str:
    kv = " ".join(
        f"{k}={shlex.quote(str(v))}" for k, v in wl.model.overrides.items()
    )
    return (
        f"python -m maxtext_indextts2_tpu.train.train {kv}"
        f" steps={wl.num_steps} run_name={wl.run_name}"
        f" base_output_directory={wl.base_output_directory}"
        f" enable_checkpointing=false metrics_file=metrics.jsonl"
    )


def generate_workload_cmd(wl: WorkloadConfig) -> str:
    """`xpk workload create` command (reference generate_xpk_workload_cmd)."""
    env = f"--env XLA_FLAGS={shlex.quote(wl.model.xla_flags)}" if wl.model.xla_flags else ""
    return (
        f"xpk workload create --cluster={wl.cluster} --project={wl.project}"
        f" --zone={wl.zone} --device-type={wl.topology}"
        f" --num-slices={wl.num_slices} --priority={wl.priority}"
        f" --max-restarts={wl.max_restarts}"
        f" --docker-image={wl.docker_image} --workload={wl.run_name} {env}"
        f" --command {shlex.quote(_train_command(wl))}"
    )


def generate_multihost_cmd(wl: WorkloadConfig) -> str:
    """tools/multihost_runner.py command for plain TPU-VM fleets
    (reference root multihost_runner.py)."""
    return (
        f"python tools/multihost_runner.py --tpu-prefix={wl.run_name}"
        f" --project={wl.project} --zone={wl.zone}"
        f" --command {shlex.quote(_train_command(wl))}"
    )


def generate_sweep(platform: str, topology: str, num_slices_list=(1,),
                   models=None, **wl_kwargs) -> list[str]:
    """Cross-product of tuned models x slice counts -> launch commands."""
    library = PLATFORM_LIBRARIES[platform]
    names = models or sorted(library)
    cmds = []
    for name in names:
        for n in num_slices_list:
            wl = WorkloadConfig(
                model=library[name], topology=topology, num_slices=n, **wl_kwargs
            )
            cmds.append(generate_workload_cmd(wl))
    return cmds


def main(argv=None):
    import argparse
    import sys

    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="v5e", choices=sorted(PLATFORM_LIBRARIES))
    ap.add_argument("--topology", default="v5e-256")
    ap.add_argument("--num-slices", type=int, nargs="+", default=[1])
    ap.add_argument("--models", nargs="*", default=None)
    args = ap.parse_args(argv)
    for cmd in generate_sweep(args.platform, args.topology,
                              tuple(args.num_slices), args.models):
        print(cmd)


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
