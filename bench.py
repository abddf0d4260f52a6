#!/usr/bin/env python
"""Benchmark: batched env steps/sec on one chip.

Headline config: the four env families on the 27-qubit heavy-hex coupling
map (BASELINE.json config #3/#5 scale), full training semantics — metrics/
reward pipeline + 50% random state inversion — stepping B device-resident
envs (B per family, measured-best) inside one jitted scan with on-device
action sampling.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is value / 1e7 (the BASELINE.json north-star steps/sec target).
Per-family numbers go to stderr.
"""

import json
import os
import sys
import time

# fail fast (one actionable line) when jax is configured for the axon TPU
# relay but its port is closed — backend init would otherwise hang forever.
# The probe lives in __graft_entry__ (single source of truth; honors
# QGT_RELAY_PORT). As a script: exit 1. As an import: raise a catchable
# RuntimeError rather than SystemExit'ing the host process.
from __graft_entry__ import _relay_dead_reason

_dead = _relay_dead_reason()
if _dead:
    print(f"bench.py: {_dead}", file=sys.stderr)
    if __name__ == "__main__":
        sys.exit(1)
    raise RuntimeError(_dead)

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from qiskit_gym_tpu.envs import (CliffordGym, LinearFunctionGym, PauliGym,  # noqa: E402
                                 PermutationGym)

HEAVY_HEX_27 = [
    (0, 1), (1, 2), (1, 4), (2, 3), (3, 5), (4, 7), (5, 8), (6, 7), (7, 10),
    (8, 9), (8, 11), (10, 12), (11, 14), (12, 13), (12, 15), (13, 14),
    (14, 16), (15, 18), (16, 19), (17, 18), (18, 21), (19, 20), (19, 22),
    (21, 23), (22, 25), (23, 24), (24, 25), (25, 26),
]

NORTH_STAR = 1e7  # steps/sec (BASELINE.json)


def bench_core(core, B: int, K: int, repeats: int = 3, mesh=None) -> float:
    """Steps/sec for K scanned random-action steps over B envs (full training
    semantics: metrics/reward pipeline + random inversions). Randomness is
    pregenerated in bulk — per-step threefry chains would dominate.
    With `mesh`, the env batch is dp-sharded over the mesh devices (the
    rollout-DP layout of parallel/mesh.py) — the multi-chip headline."""

    def run(state, key):
        k_a, k_f, k_s = jax.random.split(key, 3)
        actions = jax.random.randint(k_a, (K, B), 0, core.num_actions)
        flips = jax.random.bernoulli(k_f, 0.5, (K, B))
        keys = jax.random.split(k_s, K)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from qiskit_gym_tpu.parallel import shard_env_state

            state = shard_env_state(mesh, state)
            dp = NamedSharding(mesh, P(None, "dp"))
            actions = jax.lax.with_sharding_constraint(actions, dp)
            flips = jax.lax.with_sharding_constraint(flips, dp)

        def body(s, xs):
            act, flip, kk = xs
            s = core.step(s, act, kk,
                          invert_override=flip if core.add_inverts else None)
            return s, None

        # unroll amortizes the per-iteration scan overhead, which dominates
        # at these matrix sizes (measured: +34% on the n x n families)
        state, _ = jax.lax.scan(body, state, (actions, flips, keys), unroll=4)
        return state

    run_j = jax.jit(run)
    state = jax.jit(core.reset, static_argnums=(1, 2))(jax.random.key(0), B, 8)
    out = run_j(state, jax.random.key(1))
    jax.block_until_ready(out)
    times = []
    for r in range(repeats):
        t0 = time.perf_counter()
        out = run_j(state, jax.random.key(2 + r))
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return B * K / min(times)


def main():
    B_cli = int(sys.argv[1]) if len(sys.argv) > 1 else None
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    B_mat = B_cli or 32768
    B_pauli = B_cli or 32768

    results = {}

    env = CliffordGym.from_coupling_map(HEAVY_HEX_27, max_depth=128)
    results["clifford_27q_heavy_hex"] = bench_core(env.core, B_mat, K)

    env = LinearFunctionGym.from_coupling_map(HEAVY_HEX_27, max_depth=128)
    results["linear_function_27q"] = bench_core(env.core, B_mat, K)

    env = PermutationGym.from_coupling_map(HEAVY_HEX_27, max_depth=128)
    results["permutation_27q"] = bench_core(env.core, B_mat, K)

    # pauli_diff_scale=8 (the native-core default): the difficulty-8 reset
    # then carries one active rotation per lane, so the measured workload
    # includes rotation tracking (the gym-layer default is 16, under which
    # difficulty 8 would reset rotation-free; cost is shape-static either way)
    env = PauliGym.from_coupling_map(HEAVY_HEX_27, max_depth=128,
                                     max_rotations=5, pauli_diff_scale=8)
    results["pauli_network_27q"] = bench_core(env.core, B_pauli, K)

    for name, v in results.items():
        print(f"  {name}: {v / 1e6:.2f}M steps/s", file=sys.stderr)

    vals = list(results.values())
    geomean = float(np.prod(vals)) ** (1.0 / len(vals))
    print(json.dumps({
        "metric": (
            "batched env steps/sec/chip, geomean over the four 27q "
            "heavy-hex env families (full training semantics incl. "
            "metrics, random inversion, Pauli rotation tracking)"
        ),
        "value": round(geomean, 1),
        "unit": "steps/sec",
        "vs_baseline": round(geomean / NORTH_STAR, 4),
    }))


def main_mesh():
    """`bench.py --mesh`: the same step bench dp-sharded over ALL visible
    devices (parallel/mesh.py rollout-DP layout). One command produces the
    multi-chip headline the moment real hardware appears; on the virtual
    CPU mesh (tests / XLA_FLAGS=--xla_force_host_platform_device_count=8)
    the output is labelled `virtual` — pinned by tests/test_parallel.py."""
    from qiskit_gym_tpu.parallel import make_mesh

    mesh = make_mesh()
    ndev = len(jax.devices())
    plat = jax.devices()[0].platform
    virtual = plat == "cpu"
    # per-device lane width: measured-best 32768/chip; keep the virtual CPU
    # mesh small enough to run in CI time
    B = (2048 if virtual else 32768) * ndev
    K = 32 if virtual else 128

    results = {}
    env = CliffordGym.from_coupling_map(HEAVY_HEX_27, max_depth=128)
    results["clifford_27q_heavy_hex"] = bench_core(env.core, B, K, mesh=mesh)
    env = PermutationGym.from_coupling_map(HEAVY_HEX_27, max_depth=128)
    results["permutation_27q"] = bench_core(env.core, B, K, mesh=mesh)
    env = LinearFunctionGym.from_coupling_map(HEAVY_HEX_27, max_depth=128)
    results["linear_function_27q"] = bench_core(env.core, B, K, mesh=mesh)
    env = PauliGym.from_coupling_map(HEAVY_HEX_27, max_depth=128,
                                     max_rotations=5, pauli_diff_scale=8)
    results["pauli_network_27q"] = bench_core(env.core, B, K, mesh=mesh)

    for name, v in results.items():
        print(f"  {name}: {v / 1e6:.2f}M steps/s", file=sys.stderr)
    vals = list(results.values())
    geomean = float(np.prod(vals)) ** (1.0 / len(vals))
    print(json.dumps({
        "metric": (
            f"batched env steps/sec dp-sharded over {ndev} "
            f"{'VIRTUAL CPU' if virtual else plat.upper()} devices, "
            "geomean over the four 27q heavy-hex env families "
            "(full training semantics)"
        ),
        "value": round(geomean, 1),
        "unit": "steps/sec",
        "devices": ndev,
        "hardware": "virtual-cpu-mesh" if virtual else plat,
        "vs_baseline": round(geomean / NORTH_STAR, 4),
    }))


def scale_sweep():
    """Very-large-instance scaling (stderr only): Clifford at 127q and 433q
    line maps, bitpacked symplectic tableaus (254x254 and 866x866 bits).
    Run with `python bench.py --scale`; batch widths sized to fit HBM."""
    for n, B in ((127, 8192), (433, 1024)):
        line = [(i, i + 1) for i in range(n - 1)]
        env = CliffordGym.from_coupling_map(line, max_depth=128)
        v = bench_core(env.core, B, 32)
        print(f"  clifford_{n}q_line (B={B}): {v / 1e6:.2f}M steps/s",
              file=sys.stderr)


if __name__ == "__main__":
    if "--scale" in sys.argv:
        sys.argv.remove("--scale")
        scale_sweep()
    elif "--mesh" in sys.argv:
        sys.argv.remove("--mesh")
        main_mesh()
    else:
        main()
    # axon PJRT teardown can hang ~90s after the result is already printed;
    # the JSON line is flushed, so exit hard (same pattern as examples/).
    sys.stdout.flush()
    sys.stderr.flush()
    if "axon" in os.environ.get("JAX_PLATFORMS", ""):
        os._exit(0)
