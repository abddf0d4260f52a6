#!/usr/bin/env python
"""Resume an interrupted training run exactly where it stopped.

Rebuilds the RLSynthesis stack from a saved artifact config, then restores
the full training state (params, optimizer state, RNG stream, iteration
counter, curriculum difficulty) from the run directory's
`train_state.msgpack` (written every `checkpoint_freq` iterations).

Usage:
  python examples/resume_training.py CONFIG.json RUN_DIR [minutes] [--fixed-horizon]

The artifact (CONFIG.json and the matching .pt next to it) is re-saved every
outer loop, so this script is itself interruption-proof.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from qiskit_gym_tpu.rl import RLSynthesis


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    cfg_path, run_dir = args[0], args[1]
    budget_s = 60 * (float(args[2]) if len(args) > 2 else 30.0)
    pt_path = cfg_path[:-5] + ".pt" if cfg_path.endswith(".json") else None

    rls = RLSynthesis.from_config_json(cfg_path)
    if "--fixed-horizon" in sys.argv:
        rls.algorithm.fixed_horizon = True
    state_path = os.path.join(run_dir, "train_state.msgpack")
    rls.algorithm.restore_training_state(state_path)
    difficulty = int(rls.env.difficulty)
    print(f"resumed at iteration {rls.algorithm.iteration}, "
          f"difficulty {difficulty}", flush=True)

    t0 = time.time()
    while time.time() - t0 < budget_s:
        rls.learn(initial_difficulty=difficulty, num_iterations=5,
                  tb_path=run_dir)
        difficulty = int(getattr(rls.env, "difficulty", difficulty))
        print(f"[{(time.time() - t0) / 60:5.1f} min] iter "
              f"{rls.algorithm.iteration} difficulty {difficulty}",
              flush=True)
        rls.save(cfg_path, pt_path, best=True)

    print(f"stopped at iteration {rls.algorithm.iteration}, "
          f"difficulty {difficulty}")
    os._exit(0)  # axon teardown otherwise hangs ~90 s


if __name__ == "__main__":
    main()
