#!/usr/bin/env python
"""Measure the whole-step fused Mosaic kernel vs the XLA step on chip.

Families:
- clifford 27q heavy-hex (dim 54, W=2, bitpack default ON) — the target:
  the metrics-chain XLA floor is ~200 us/step (docs/PERF.md).
- permutation / linear-function 27q (dim 27): the dense int8 path wins
  under XLA, but the fused kernel only exists for the bitpacked rep —
  measure forced bitpack (W=1) + fused vs the shipped dense default.

Usage: python scripts/bench_fused.py [B] [K]   (defaults 32768, 128)
Prints one line per (family, variant) and a verdict per family.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from qiskit_gym_tpu.envs import (CliffordGym, LinearFunctionGym,
                                 PermutationGym)
from qiskit_gym_tpu.ops.matrix_env import MatrixEnvCore

from bench import HEAVY_HEX_27, bench_core  # noqa: E402


def run(tag, core, B, K):
    v = bench_core(core, B, K)
    print(f"  {tag:42s} {v / 1e6:8.2f}M steps/s", flush=True)
    return v


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    t0 = time.time()
    results = {}
    for name, gym_cls in (("clifford", CliffordGym),
                          ("permutation", PermutationGym),
                          ("linear", LinearFunctionGym)):
        env = gym_cls.from_coupling_map(HEAVY_HEX_27, max_depth=128)
        base = env.core
        print(f"{name} 27q heavy-hex (dim {base.dim}):", flush=True)
        xla = run(f"xla default (bitpack={base.bitpack})", base, B, K)
        packed = base if base.bitpack else MatrixEnvCore(
            base.num_qubits, base.gateset, name, bitpack=True)
        if not base.bitpack:
            run("xla forced bitpack (W=1)", packed, B, K)
        packed.use_pallas_step = True
        fused = run(f"FUSED pallas step (W={packed.W})", packed, B, K)
        packed.use_pallas_step = False
        results[name] = (xla, fused)
        print(f"  -> fused is {fused / xla:.2f}x the shipped default",
              flush=True)
    print(f"total {time.time() - t0:.0f}s")
    os._exit(0)  # axon teardown otherwise hangs ~90 s


if __name__ == "__main__":
    main()
