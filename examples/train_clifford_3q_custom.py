#!/usr/bin/env python
"""Train our twin of the reference's `clifford_3q_custom` artifact.

The reference ships three trained artifacts; two (perm_square_3x3,
lf_5_line) have gateset-identical counterparts in this repo, but its
clifford artifact uses a custom gateset (CX both directions + SWAPs + H/S
on qubit 0 only — /root/reference/examples/models/clifford_3q_custom.json)
that our `clifford_3q_line` does not match. For a like-for-like row in the
head-to-head table (bench_vs_reference.py), this trains OUR weights on the
REFERENCE's exact env config — the env JSON is copied verbatim, so the
saved artifact is byte-compatible with the reference schema and the
comparison isolates weight quality.

Usage: python examples/train_clifford_3q_custom.py [minutes]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from qiskit_gym_tpu.envs import CliffordGym
from qiskit_gym_tpu.rl import BasicPolicyConfig, PPOConfig, RLSynthesis

MODELS = os.path.join(os.path.dirname(__file__), "models")
REF_JSON = "/root/reference/examples/models/clifford_3q_custom.json"


def main():
    budget_s = 60 * (float(sys.argv[1]) if len(sys.argv) > 1 else 30.0)
    ref = json.load(open(REF_JSON))
    env = CliffordGym.from_json(ref["env"])
    # reference-default knobs (same as the shipped clifford_3q_line config)
    cfg = PPOConfig(num_episodes=1024, num_epochs=10)
    pol = BasicPolicyConfig()  # 512/[256] — the reference's shape
    out_json = os.path.join(MODELS, "clifford_3q_custom.json")
    out_pt = os.path.join(MODELS, "clifford_3q_custom.pt")
    model_path = out_pt if os.path.exists(out_pt) else None
    rls = RLSynthesis(env, cfg, pol, model_path=model_path)
    rls.trained_with = (
        "clifford_3q_custom: trained from scratch on the REFERENCE's exact "
        "env config (gateset copied verbatim from "
        "/root/reference/examples/models/clifford_3q_custom.json) with "
        "reference-default PPO knobs, for the like-for-like head-to-head "
        "row in docs/QUALITY.md (bench_vs_reference.py)")
    algo = rls.algorithm
    t0 = time.time()
    while time.time() - t0 < budget_s:
        rls.learn(initial_difficulty=max(1, algo.best_difficulty),
                  num_iterations=5, tb_path="runs/clifford_3q_custom")
        print(f"iter {algo.iteration} best_difficulty "
              f"{algo.best_difficulty} ({(time.time() - t0) / 60:.1f} min)",
              flush=True)
        if algo.best_difficulty > 0:
            rls.save(out_json, out_pt, best=True)
        if algo.best_difficulty >= 32:
            break
    print(f"done: best_difficulty {algo.best_difficulty}")
    os._exit(0)  # axon teardown otherwise hangs ~90 s


if __name__ == "__main__":
    main()
