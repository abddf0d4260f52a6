"""Portfolio solve: per-lane temperature ladder on the solve paths.

The ladder (rl/rollout.solve_temperatures) gives best-of-N solve a greedy
exploitation lane (temperature 0 == argmax) plus a ramp into the classic
temperature-1.0 sampling; best_lane then keeps the shortest successful
solution. These tests pin the exact semantics: temp-0 lanes reproduce the
deterministic path bit-for-bit, temp-1 lanes reproduce the pre-portfolio
sampled path bit-for-bit, and the end-to-end synth() paths still verify.
"""

import numpy as np
import jax
import jax.numpy as jnp

from qiskit_gym_tpu.envs import LinearFunctionGym, PermutationGym
from qiskit_gym_tpu.models import make_policy
from qiskit_gym_tpu.rl import (AlphaZeroConfig, BasicPolicyConfig, EvalConfig,
                               PPOConfig, RLSynthesis)
from qiskit_gym_tpu.rl.rollout import collect, solve_temperatures
from qiskit_gym_tpu.quantum import linear_from_circuit, permutation_pattern

LINE_3 = [(0, 1), (1, 2)]


def _env_and_policy(cls=PermutationGym, max_depth=12):
    env = cls.from_coupling_map(LINE_3, max_depth=max_depth)
    policy = make_policy(
        "qiskit_gym_tpu.models.BasicPolicy",
        env.obs_shape(), env.num_actions(),
        {"embedding_size": 32, "common_layers": [16]},
    )
    return env, policy


def test_ladder_shape():
    assert solve_temperatures(1) is None
    t4 = np.asarray(solve_temperatures(4))
    assert np.allclose(t4, [0.0, 0.5, 1.0, 1.0])
    t64 = np.asarray(solve_temperatures(64))
    assert t64[0] == 0.0
    assert t64[-1] == 1.0
    assert (np.diff(t64) >= 0).all()
    assert (t64 <= 1.0).all()
    # half the lanes keep the classic full-temperature sampling
    assert (t64 == 1.0).sum() >= 32


def test_temp_zero_equals_deterministic_collect():
    env, pol = _env_and_policy(LinearFunctionGym)
    params = pol.init(jax.random.key(0))
    core = env.core
    state = core.reset(jax.random.key(1), 6, 5)
    key = jax.random.key(2)
    _, tr_det = collect(core, pol.apply, params, state, key, 12,
                        deterministic=True)
    _, tr_zero = collect(core, pol.apply, params, state, key, 12,
                         lane_temp=jnp.zeros(6))
    assert np.array_equal(np.asarray(tr_det.action), np.asarray(tr_zero.action))


def test_temp_one_equals_classic_sampling_collect():
    env, pol = _env_and_policy(LinearFunctionGym)
    params = pol.init(jax.random.key(0))
    core = env.core
    state = core.reset(jax.random.key(1), 6, 5)
    key = jax.random.key(3)
    _, tr_old = collect(core, pol.apply, params, state, key, 12)
    _, tr_one = collect(core, pol.apply, params, state, key, 12,
                        lane_temp=jnp.ones(6))
    assert np.array_equal(np.asarray(tr_old.action), np.asarray(tr_one.action))


def test_mcts_temp_zero_equals_deterministic():
    from qiskit_gym_tpu.rl.az import collect_mcts

    env, pol = _env_and_policy(max_depth=8)
    params = pol.init(jax.random.key(0))
    core = env.core
    state = core.reset(jax.random.key(4), 4, 3)
    key = jax.random.key(5)
    kw = dict(num_sims=16, c_puct=1.41)
    _, tr_det = collect_mcts(core, pol.apply, params, state, key, 8,
                             deterministic=True, **kw)
    _, tr_zero = collect_mcts(core, pol.apply, params, state, key, 8,
                              lane_temp=jnp.zeros(4), **kw)
    assert np.array_equal(np.asarray(tr_det.action),
                          np.asarray(tr_zero.action))


def test_policy_synth_portfolio_end_to_end():
    """Portfolio best-of-N synth still returns a verified solution through
    the full RLSynthesis path (policy solve, num_mcts_searches == 0)."""
    env, _ = _env_and_policy(max_depth=8)
    rls = RLSynthesis(env, PPOConfig(num_episodes=8),
                      BasicPolicyConfig(embedding_size=32,
                                        common_layers=[16]))
    pattern = [1, 0, 2]
    out = rls.synth(pattern, num_searches=16)
    assert out is not None
    assert permutation_pattern(linear_from_circuit(out)).tolist() == pattern


def test_mcts_synth_portfolio_end_to_end():
    env, _ = _env_and_policy(max_depth=8)
    cfg = AlphaZeroConfig(
        num_episodes=8, num_mcts_searches=8, num_epochs=1,
        evals={"mcts_100": EvalConfig(num_episodes=4, num_mcts_searches=4)},
    )
    rls = RLSynthesis(env, cfg, BasicPolicyConfig(embedding_size=32,
                                                  common_layers=[16]))
    pattern = [1, 0, 2]
    out = rls.synth(pattern, num_searches=8, num_mcts_searches=12)
    assert out is not None
    assert permutation_pattern(linear_from_circuit(out)).tolist() == pattern
