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


def test_gae_last_value_bootstrap():
    """With last_value, truncated (not-done) lanes bootstrap at the horizon."""
    T, B = 3, 2
    value = np.ones((T, B), np.float32)
    reward = np.zeros((T, B), np.float32)
    done = np.zeros((T, B), bool)
    done[-1, 0] = True  # lane 0 terminal at horizon, lane 1 truncated
    valid = np.ones((T, B), bool)
    traj = Trajectory(
        obs=jnp.zeros((T, B, 1)), action=jnp.zeros((T, B), jnp.int32),
        actual=jnp.zeros((T, B), jnp.int32),
        logp=jnp.zeros((T, B)), value=jnp.asarray(value),
        reward=jnp.asarray(reward), valid=jnp.asarray(valid),
        done=jnp.asarray(done), inverted=jnp.zeros((T, B), bool),
        success=jnp.zeros(B, bool),
    )
    g, lam = 0.9, 1.0
    last_value = jnp.asarray([5.0, 5.0])
    adv, _ = gae(traj, gamma=g, lam=lam, last_value=last_value)
    adv = np.asarray(adv)
    # lane 0: terminal at T-1 -> last row delta = -1
    assert np.isclose(adv[-1, 0], -1.0)
    # lane 1: truncated -> last row delta = 0.9 * 5 - 1
    assert np.isclose(adv[-1, 1], g * 5.0 - 1.0)


def test_collect_packed_refills_lanes():
    from qiskit_gym_tpu.rl.rollout import collect_packed

    env = LinearFunctionGym.from_coupling_map(LINE_3, max_depth=8,
                                              add_inverts=False)
    core = env.core
    policy = make_policy(
        "qiskit_gym_tpu.models.BasicPolicy",
        env.obs_shape(), env.num_actions(),
        {"embedding_size": 16, "common_layers": [8]},
    )
    params = policy.init(jax.random.key(0))
    T, B = 24, 16
    final, traj, stats = jax.jit(
        lambda k: collect_packed(core, policy.apply, params, k, T, B,
                                 difficulty=1, pool_slots=4)
    )(jax.random.key(1))
    n_done = np.asarray(stats["episodes_completed"])
    n_succ = np.asarray(stats["episodes_succeeded"])
    valid = np.asarray(traj.valid)
    done = np.asarray(traj.done)
    # difficulty-1 episodes have a 2-step budget: lanes must recycle — far
    # more episodes than lanes, and counters must be consistent
    assert n_done.sum() > B
    assert (n_succ <= n_done).all()
    assert done.sum() == n_done.sum()
    # packing keeps lanes busy: validity ratio near 1 (an invalid row only
    # appears when a fresh reset is instantly solved)
    assert valid.mean() > 0.9
    # every done row must be valid (no done counted on a frozen lane)
    assert (valid | ~done).all()


def test_ppo_episode_packing_learns():
    from qiskit_gym_tpu.envs import PermutationGym
    from qiskit_gym_tpu.rl import RLSynthesis
    from qiskit_gym_tpu.rl.configs import PPOConfig, BasicPolicyConfig, EvalConfig
    from qiskit_gym_tpu.quantum import linear_from_circuit, permutation_pattern

    env = PermutationGym.from_coupling_map(LINE_3, max_depth=16,
                                           add_inverts=False)
    cfg = PPOConfig(num_episodes=32, num_epochs=2, episode_packing=True,
                    pack_pool_slots=4,
                    evals={"ppo_deterministic": EvalConfig(num_episodes=8)})
    rls = RLSynthesis(env, cfg, BasicPolicyConfig(embedding_size=32,
                                                  common_layers=[16]))
    rls.learn(initial_difficulty=1, num_iterations=3)
    pattern = [1, 0, 2]
    out = rls.synth(pattern, num_searches=50)
    assert out is not None
    assert permutation_pattern(linear_from_circuit(out)).tolist() == pattern


def test_ppo_packing_config_json_roundtrip():
    from qiskit_gym_tpu.rl.configs import PPOConfig

    j = PPOConfig().to_json()
    assert "episode_packing" not in j["collecting"]
    j2 = PPOConfig(episode_packing=True, pack_pool_slots=6).to_json()
    assert j2["collecting"]["episode_packing"] is True
    back = PPOConfig.from_json(j2)
    assert back.episode_packing and back.pack_pool_slots == 6


def test_ppo_minibatch_epochs_learn():
    """num_minibatches > 1 trains (k gradient steps per epoch) and solves."""
    from qiskit_gym_tpu.envs import PermutationGym
    from qiskit_gym_tpu.rl import RLSynthesis
    from qiskit_gym_tpu.rl.configs import PPOConfig, BasicPolicyConfig, EvalConfig
    from qiskit_gym_tpu.quantum import linear_from_circuit, permutation_pattern

    env = PermutationGym.from_coupling_map(LINE_3, max_depth=16,
                                           add_inverts=False)
    cfg = PPOConfig(num_episodes=32, num_epochs=2, num_minibatches=4,
                    episode_packing=True, pack_pool_slots=4,
                    evals={"ppo_deterministic": EvalConfig(num_episodes=8)})
    j = cfg.to_json()
    assert j["training"]["num_minibatches"] == 4
    assert PPOConfig.from_json(j).num_minibatches == 4
    rls = RLSynthesis(env, cfg, BasicPolicyConfig(embedding_size=32,
                                                  common_layers=[16]))
    rls.learn(initial_difficulty=1, num_iterations=3)
    pattern = [1, 0, 2]
    out = rls.synth(pattern, num_searches=50)
    assert out is not None
    assert permutation_pattern(linear_from_circuit(out)).tolist() == pattern
