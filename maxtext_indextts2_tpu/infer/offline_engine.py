"""High-throughput offline batch inference.

Reference: MaxText/inference/offline_engine.py:939 (used by GRPO + MLPerf).
Fills all decode slots, generates until every sequence finishes, refills
from the work queue — maximizing slot occupancy without a server.
"""

from __future__ import annotations

import numpy as np

from maxtext_indextts2_tpu.config import Config
from maxtext_indextts2_tpu.infer.engine import Engine


class OfflineEngine:
    def __init__(self, cfg: Config, engine: Engine | None = None, eos_id: int | None = None):
        self.engine = engine or Engine(cfg)
        self.eos_id = eos_id
        if self.engine.params is None:
            self.engine.load_params()

    def generate_batch(
        self, prompts: list[np.ndarray], max_new_tokens: int
    ) -> list[list[int]]:
        eng = self.engine
        state = eng.init_decode_state()
        results: list[list[int] | None] = [None] * len(prompts)
        slot_req = [-1] * eng.num_slots  # request index per slot
        remaining = np.zeros(eng.num_slots, np.int32)
        next_req = 0
        active = 0

        def admit(state):
            nonlocal next_req, active
            for slot in range(eng.num_slots):
                if slot_req[slot] == -1 and next_req < len(prompts):
                    p = prompts[next_req]
                    prefix, first = eng.prefill(p, len(p))
                    state = eng.insert(prefix, state, slot)
                    results[next_req] = [int(np.asarray(first)[0])]
                    slot_req[slot] = next_req
                    remaining[slot] = max_new_tokens - 1
                    next_req += 1
                    active += 1
            return state

        state = admit(state)
        while active > 0:
            state, toks = eng.generate(state)
            toks = np.asarray(toks)
            refill = False
            for slot in range(eng.num_slots):
                ri = slot_req[slot]
                if ri < 0:
                    continue
                tok = int(toks[slot])
                results[ri].append(tok)
                remaining[slot] -= 1
                if remaining[slot] <= 0 or (self.eos_id is not None and tok == self.eos_id):
                    slot_req[slot] = -1
                    active -= 1
                    refill = True
            if refill:
                state = admit(state)
        return [r if r is not None else [] for r in results]


def main(argv=None):
    """CLI: batch-decode prompts from a JSONL file ({"prompt": [ids...]})
    or a default set (reference: decode_multi / offline inference)."""
    import json
    import sys

    from maxtext_indextts2_tpu.config import load_config

    argv = list(sys.argv[1:] if argv is None else argv)
    prompts_path, max_new = "", 16
    keep = []
    for a in argv:
        if a.startswith("prompts_path="):
            prompts_path = a.split("=", 1)[1]
        elif a.startswith("max_new_tokens="):
            max_new = int(a.split("=", 1)[1])
        else:
            keep.append(a)
    cfg = load_config(keep)
    if prompts_path:
        prompts = [np.asarray(json.loads(l)["prompt"], np.int32)
                   for l in open(prompts_path)]
    else:
        prompts = [np.arange(1, 6, dtype=np.int32), np.arange(7, 15, dtype=np.int32)]
    eng = OfflineEngine(cfg)
    outs = eng.generate_batch(prompts, max_new)
    for p, o in zip(prompts, outs):
        print(json.dumps({"prompt": p.tolist(), "completion": o}))


if __name__ == "__main__":
    main()
