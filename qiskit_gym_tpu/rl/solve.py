"""Batched policy-guided solve: N independent rollouts from one target state,
best successful solution wins.

Mirrors the reference solve path (reference rl/synthesis.py:112-126 →
twisterl solve): set_state -> num_searches parallel episodes -> pick the best
success. "Best" = fewest 2q gates, then fewest gates, then shortest — the
env's own metric counters are used for ranking. Solution reconstruction
honours the env's inversion bookkeeping: actions recorded while the state was
inverted are appended in reverse (valid because all phase-less gates are
involutions; reference permutation.rs:251-256).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .rollout import collect


def policy_solve(
    env,
    policy,
    params,
    state_encoded,
    deterministic: bool = False,
    num_searches: int = 100,
    key: Optional[jax.Array] = None,
) -> Optional[List[int]]:
    core = env.core
    single = env.encoded_to_dense(state_encoded)
    batch = np.repeat(single[None], num_searches, axis=0)
    state = core.set_state(batch)
    if key is None:
        key = jax.random.key(np.random.randint(0, 2**31 - 1))

    T = core.max_depth
    final_state, traj = jax.jit(
        lambda s, k: collect(core, policy.apply, params, s, k, T,
                             deterministic=deterministic)
    )(state, key)

    success = np.asarray(final_state.success)
    if not success.any():
        return None
    n_cnots = np.asarray(final_state.n_cnots)
    n_gates = np.asarray(final_state.n_gates)
    actions = np.asarray(traj.action)       # [T, S]
    valid = np.asarray(traj.valid)          # [T, S]
    inverted = np.asarray(traj.inverted)    # [T, S]
    lengths = valid.sum(axis=0)

    candidates = np.flatnonzero(success)
    order = sorted(
        candidates,
        key=lambda s: (n_cnots[s], n_gates[s], lengths[s]),
    )
    best = int(order[0])

    normal = [int(a) for a, v, inv in zip(actions[:, best], valid[:, best],
                                          inverted[:, best]) if v and not inv]
    flipped = [int(a) for a, v, inv in zip(actions[:, best], valid[:, best],
                                           inverted[:, best]) if v and inv]
    return normal + flipped[::-1]
