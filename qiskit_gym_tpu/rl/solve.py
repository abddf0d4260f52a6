"""Batched policy-guided solve: N independent rollouts from one target state,
best successful solution wins.

Mirrors the reference solve path (reference rl/synthesis.py:112-126 ->
twisterl solve): set_state -> num_searches parallel episodes -> pick the best
success. "Best" = fewest 2q gates, then fewest gates, then shortest — ranked
by the env's own metric counters. Reconstruction goes through the gym's
solution_from_trace hook (inversion bookkeeping for the matrix envs,
host-side spec replay with packed rotation events for the Pauli env).
"""

from __future__ import annotations

import weakref
from typing import List, Optional

import numpy as np
import jax

from .rollout import collect, solve_temperatures

# Per-core cache of jitted solve programs. synth() used to build a fresh
# lambda per call, which defeats jax.jit's identity-based caching and pays a
# full retrace + compile per target — tens of seconds each over a TPU relay.
# Params flow as call arguments so one compiled program serves every target
# (and every params update). jax.jit still specializes per batch shape.
_JIT_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def cached_solve_jit(core, policy, cache_key, make_fn):
    """cache_key identifies the static solve settings; the policy is held by
    weakref so a garbage-collected policy whose id() gets reused can never
    serve a stale compiled program."""
    per_core = _JIT_CACHE.get(core)
    if per_core is None:
        per_core = {}
        _JIT_CACHE[core] = per_core
    hit = per_core.get(cache_key)
    if hit is not None and hit[0]() is policy:
        return hit[1]
    fn = jax.jit(make_fn())
    per_core[cache_key] = (weakref.ref(policy), fn)
    return fn


def round_up_lanes(n: int, mesh) -> int:
    """Round a lane count up to a multiple of the mesh's 'dp' axis — a
    non-divisible leading dim fails the sharding constraint (e.g. the
    default num_searches=100 on an 8-device mesh). Extra lanes only widen
    the best-of-N search."""
    dp = dict(mesh.shape).get("dp", 1)
    return -(-n // dp) * dp


def best_lane(final_state, traj) -> Optional[int]:
    success = np.asarray(final_state.success)
    if not success.any():
        return None
    n_cnots = np.asarray(final_state.n_cnots)
    n_gates = np.asarray(final_state.n_gates)
    lengths = np.asarray(traj.valid).sum(axis=0)
    candidates = np.flatnonzero(success)
    return int(sorted(
        candidates, key=lambda s: (n_cnots[s], n_gates[s], lengths[s])
    )[0])


def policy_solve(
    env,
    policy,
    params,
    state_encoded,
    deterministic: bool = False,
    num_searches: int = 100,
    key: Optional[jax.Array] = None,
    mesh=None,
) -> Optional[List[int]]:
    core = env.core
    if mesh is not None:
        num_searches = round_up_lanes(num_searches, mesh)
    state = env.make_solve_state(state_encoded, num_searches)
    if key is None:
        key = jax.random.key(np.random.randint(0, 2**31 - 1))
    if mesh is not None:
        from qiskit_gym_tpu.parallel import shard_env_state, shard_params

        state = shard_env_state(mesh, state)
        params = shard_params(mesh, params)

    T = core.max_depth
    # temperature-ladder portfolio: lane 0 greedy, half ramp, half classic
    # temperature-1.0 sampling (rl/rollout.solve_temperatures); best_lane
    # then keeps the shortest successful solution across the portfolio
    lane_temp = (None if deterministic
                 else solve_temperatures(num_searches))
    fn = cached_solve_jit(
        core, policy, ("policy", T, deterministic, lane_temp is not None),
        lambda: lambda p, s, k, lt: collect(core, policy.apply, p, s, k, T,
                                            deterministic=deterministic,
                                            lane_temp=lt))
    final_state, traj = fn(params, state, key, lane_temp)

    best = best_lane(final_state, traj)
    if best is None:
        return None
    valid = np.asarray(traj.valid)[:, best]
    actions = np.asarray(traj.actual)[:, best][valid]
    inverted = np.asarray(traj.inverted)[:, best][valid]
    return env.solution_from_trace(state_encoded, actions.tolist(),
                                   inverted.tolist())
