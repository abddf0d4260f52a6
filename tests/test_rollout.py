"""Unit tests for rollout collection and GAE against a numpy reference."""

import numpy as np
import jax
import jax.numpy as jnp

from qiskit_gym_tpu.envs import LinearFunctionGym
from qiskit_gym_tpu.models import make_policy
from qiskit_gym_tpu.rl.rollout import Trajectory, collect, gae

LINE_3 = [(0, 1), (1, 2)]


def _numpy_gae(reward, value, done, valid, gamma, lam):
    T, B = reward.shape
    adv = np.zeros((T, B), np.float32)
    for b in range(B):
        running = 0.0
        next_value = 0.0
        for t in range(T - 1, -1, -1):
            if not valid[t, b]:
                running = 0.0
                next_value = 0.0
                adv[t, b] = 0.0
                continue
            nonterm = 0.0 if done[t, b] else 1.0
            delta = reward[t, b] + gamma * next_value * nonterm - value[t, b]
            running = delta + gamma * lam * nonterm * running
            adv[t, b] = running
            next_value = value[t, b]
    return adv


def test_gae_matches_numpy_reference():
    rng = np.random.default_rng(0)
    T, B = 12, 6
    reward = rng.normal(size=(T, B)).astype(np.float32)
    value = rng.normal(size=(T, B)).astype(np.float32)
    # episodes: done at random times, invalid after
    done = np.zeros((T, B), bool)
    valid = np.ones((T, B), bool)
    for b in range(B):
        end = rng.integers(3, T)
        done[end, b] = True
        valid[end + 1:, b] = False
        reward[~valid[:, b], b] = 0.0
    done[-1, :] |= valid[-1, :]  # horizon end is terminal

    traj = Trajectory(
        obs=jnp.zeros((T, B, 1)), action=jnp.zeros((T, B), jnp.int32),
        actual=jnp.zeros((T, B), jnp.int32),
        logp=jnp.zeros((T, B)), value=jnp.asarray(value),
        reward=jnp.asarray(reward), valid=jnp.asarray(valid),
        done=jnp.asarray(done), inverted=jnp.zeros((T, B), bool),
        success=jnp.zeros(B, bool),
    )
    adv, returns = gae(traj, gamma=0.99, lam=0.95)
    want = _numpy_gae(reward, value, done, valid, 0.99, 0.95)
    assert np.allclose(np.asarray(adv), want, atol=1e-5)
    assert np.allclose(np.asarray(returns)[valid],
                       (want + value)[valid], atol=1e-5)


def test_collect_freezes_finished_lanes():
    env = LinearFunctionGym.from_coupling_map(LINE_3, max_depth=8)
    core = env.core
    policy = make_policy("qiskit_gym_tpu.models.BasicPolicy",
                         env.obs_shape(), env.num_actions(),
                         {"embedding_size": 16, "common_layers": [8]})
    params = policy.init(jax.random.key(0))
    state = core.reset(jax.random.key(1), 16, 2)  # depth budget 4
    final, traj = jax.jit(
        lambda s, k: collect(core, policy.apply, params, s, k, 8)
    )(state, jax.random.key(2))
    valid = np.asarray(traj.valid)
    done = np.asarray(traj.done)
    # once invalid, always invalid; no rewards on frozen steps
    for b in range(valid.shape[1]):
        col = valid[:, b]
        assert (np.diff(col.astype(int)) <= 0).all(), "valid must be a prefix"
        assert not np.asarray(traj.reward)[~col, b].any()
    # depth budget: at most 4 valid steps per lane
    assert valid.sum(axis=0).max() <= 4
    # lanes done mid-rollout keep their final success flag
    assert np.asarray(final.depth).min() >= 0


def test_collect_deterministic_reproducible():
    env = LinearFunctionGym.from_coupling_map(LINE_3, max_depth=8)
    core = env.core
    policy = make_policy("qiskit_gym_tpu.models.BasicPolicy",
                         env.obs_shape(), env.num_actions(),
                         {"embedding_size": 16, "common_layers": [8]})
    params = policy.init(jax.random.key(0))
    state = core.reset(jax.random.key(1), 8, 2)
    f = jax.jit(lambda s, k: collect(core, policy.apply, params, s, k, 6))
    s1, t1 = f(state, jax.random.key(9))
    s2, t2 = f(state, jax.random.key(9))
    for a, b in zip(jax.tree.leaves(t1), jax.tree.leaves(t2)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
