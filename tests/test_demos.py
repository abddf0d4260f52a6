"""Demonstration bootstrap: constructive planner + behavior cloning.

The planner must produce in-budget, verified solutions from the env's own
reset distribution (rl/demos.py op-ledger construction), and fit_demos must
actually teach a policy the demonstrated actions.
"""

import numpy as np
import pytest

from qiskit_gym_tpu.envs import PauliGym
from qiskit_gym_tpu.rl.demos import (fit_demos, generate_demos, plan_episode,
                                     shortest_path_tables)

LINE_5 = [(i, i + 1) for i in range(4)]
HEAVY_HEX_27 = [
    (0, 1), (1, 2), (1, 4), (2, 3), (3, 5), (4, 7), (5, 8), (6, 7), (7, 10),
    (8, 9), (8, 11), (10, 12), (11, 14), (12, 13), (12, 15), (13, 14),
    (14, 16), (15, 18), (16, 19), (17, 18), (18, 21), (19, 20), (19, 22),
    (21, 23), (22, 25), (23, 24), (24, 25), (25, 26),
]


def _both(edges):
    return list(edges) + [(b, a) for a, b in edges]


@pytest.fixture(scope="module")
def line_env():
    gym = PauliGym.from_coupling_map(
        _both(LINE_5), basis_gates=("H", "S", "Sdg", "CX"),
        max_rotations=4, pauli_diff_scale=4, depth_slope=4,
    )
    return gym.spec


def test_shortest_path_tables():
    dist, nxt = shortest_path_tables(4, [(0, 1), (1, 2), (2, 3)])
    assert dist[0, 3] == 3 and nxt[0, 3] == 1 and nxt[1, 3] == 2
    assert dist[2, 2] == 0


@pytest.mark.parametrize("difficulty", [2, 8, 32])
def test_planner_solves_line(line_env, difficulty):
    line_env.rng = np.random.default_rng(difficulty)
    budget = 4 * difficulty
    for _ in range(10):
        plan = plan_episode(line_env, difficulty)
        assert plan is not None and len(plan) <= budget
        for a in plan:
            line_env.step(a)
        assert line_env.success


def test_planner_full_gateset_27q():
    gym = PauliGym.from_coupling_map(
        _both(HEAVY_HEX_27), max_rotations=5, pauli_diff_scale=4,
        depth_slope=4, pauli_layer_reward=0.05,
    )
    env = gym.spec
    assert env.num_actions() == 303
    env.rng = np.random.default_rng(0)
    for difficulty in (8, 12, 16):
        for _ in range(5):
            plan = plan_episode(env, difficulty)
            assert plan is not None and len(plan) <= 4 * difficulty
            for a in plan:
                env.step(a)
            assert env.success


def test_generate_demos_yield_and_shapes(line_env):
    line_env.rng = np.random.default_rng(3)
    demos = generate_demos(line_env, [4, 8], 20)
    # correct plans + correct symmetry-augmented replay => no failed episodes
    # beyond over-budget plans; demand a 90% yield to catch silent perm bugs
    assert demos["episodes"] == 40
    assert demos["episodes"] / demos["attempts"] >= 0.9
    N = demos["action"].shape[0]
    bits = demos["obs_bits"]
    assert demos["obs_packed"].shape == (N, -(-bits // 8))
    assert demos["ret"].shape == (N,)
    assert (demos["action"] >= 0).all()
    assert (demos["action"] < line_env.num_actions()).all()
    # every episode ends solved: the final reward lands in the return-to-go,
    # so positive mass must dominate (success bonus ~1 vs tiny penalties)
    assert demos["ret"].max() > 0.9


def test_matrix_demos_permutation_and_clifford():
    from qiskit_gym_tpu.envs import CliffordGym, PermutationGym
    from qiskit_gym_tpu.rl.demos import generate_demos_matrix, \
        plan_episode_matrix

    grid = [(0, 1), (1, 2), (0, 3), (1, 4), (2, 5), (3, 4), (4, 5)]
    perm_env = PermutationGym.from_coupling_map(_both(grid)).spec
    cliff_env = CliffordGym.from_coupling_map(
        _both(LINE_5[:2]), basis_gates=("H", "S", "CX")).spec
    for env in (perm_env, cliff_env):
        env.rng = np.random.default_rng(1)
        for difficulty in (2, 6, 12):
            for _ in range(5):
                plan = plan_episode_matrix(env, difficulty)
                assert plan is not None and len(plan) <= env.depth
                for a in plan:
                    if env.is_final():
                        break
                    env.step(a, invert=False)
                assert env.success
        demos = generate_demos_matrix(env, [2, 6], 10)
        assert demos["episodes"] == 20
        assert demos["ret"].max() > 0.9
        assert demos["obs_bits"] == int(np.prod(env.obs_shape()))


def test_bc_lifts_argmax_eval_on_scrambled_frontier():
    """Seeded miniature of the docs/TRAINING.md BC-uplift claim: behavior
    cloning on planner demos must lift the ARGMAX EVAL (not just label
    accuracy) on env-scrambled episodes at a frontier difficulty the fresh
    policy cannot solve. Pins the mechanism the 27q full-gateset artifact's
    training recipe relies on."""
    import numpy as np

    from qiskit_gym_tpu.rl import AlphaZeroConfig, BasicPolicyConfig, RLSynthesis

    gym = PauliGym.from_coupling_map(
        _both(LINE_5), basis_gates=("H", "S", "Sdg", "CX"),
        max_rotations=4, pauli_diff_scale=4, depth_slope=4,
    )
    rls = RLSynthesis(
        gym,
        AlphaZeroConfig(num_episodes=8, num_mcts_searches=4, lr=1e-3),
        BasicPolicyConfig(embedding_size=128, common_layers=[64]),
        seed=5,
    )
    algo = rls.algorithm
    gym.spec.rng = np.random.default_rng(42)
    demos = generate_demos(gym.spec, list(range(2, 9)), 60)

    frontier = 6
    eval0 = algo.run_evals(frontier)["ppo_deterministic"]
    for _ in range(12):
        fit_demos(algo, demos, epochs=2, num_minibatches=16)
    eval1 = algo.run_evals(frontier)["ppo_deterministic"]
    # fresh policy: ~0 at difficulty 6; cloned policy must clearly solve
    assert eval1 >= max(eval0 + 0.25, 0.3), (eval0, eval1)


def test_fit_demos_recompiles_on_optimizer_swap(line_env):
    """Swapping algo.tx between fitting bursts must not reuse the compiled
    program of the old optimizer (the cached closure captures algo.tx).
    The swap keeps the SAME opt-state pytree structure (adam -> adam with a
    new lr) so jit cannot save us by retracing on structure — only the
    cache key can; a zero-lr Adam burst must leave params bit-identical."""
    import jax
    import optax

    from qiskit_gym_tpu.rl import AlphaZeroConfig, BasicPolicyConfig, RLSynthesis

    gym = PauliGym.from_coupling_map(
        _both(LINE_5), basis_gates=("H", "S", "Sdg", "CX"),
        max_rotations=4, pauli_diff_scale=4, depth_slope=4,
    )
    rls = RLSynthesis(
        gym,
        AlphaZeroConfig(num_episodes=8, num_mcts_searches=4, lr=1e-3),
        BasicPolicyConfig(embedding_size=32, common_layers=[16]),
    )
    algo = rls.algorithm
    gym.spec.rng = np.random.default_rng(7)
    demos = generate_demos(gym.spec, [2], 10)

    fit_demos(algo, demos, epochs=1, num_minibatches=4)  # warms the cache
    algo.tx = optax.adam(0.0)
    algo.opt_state = algo.tx.init(algo.params)
    before = jax.tree.map(np.asarray, algo.params)
    fit_demos(algo, demos, epochs=1, num_minibatches=4)  # same shapes
    after = jax.tree.map(np.asarray, algo.params)
    flat_b, _ = jax.tree.flatten(before)
    flat_a, _ = jax.tree.flatten(after)
    assert all(np.array_equal(b, a) for b, a in zip(flat_b, flat_a))


def test_fit_demos_clones_the_labels(line_env):
    import jax

    from qiskit_gym_tpu.rl import AlphaZeroConfig, BasicPolicyConfig, RLSynthesis

    gym = PauliGym.from_coupling_map(
        _both(LINE_5), basis_gates=("H", "S", "Sdg", "CX"),
        max_rotations=4, pauli_diff_scale=4, depth_slope=4,
    )
    rls = RLSynthesis(
        gym,
        AlphaZeroConfig(num_episodes=8, num_mcts_searches=4, lr=1e-3),
        BasicPolicyConfig(embedding_size=64, common_layers=[32]),
    )
    algo = rls.algorithm
    gym.spec.rng = np.random.default_rng(11)
    demos = generate_demos(gym.spec, [2, 4], 40)
    bits = demos["obs_bits"]
    obs = np.unpackbits(demos["obs_packed"], axis=1)[:, :bits]

    def accuracy(params):
        logits, _ = algo.policy.apply(params, obs)
        return float((np.argmax(np.asarray(logits), -1) ==
                      demos["action"]).mean())

    from qiskit_gym_tpu.rl.demos import prepare_demos

    acc0 = accuracy(algo.params)
    losses = []
    prepared = prepare_demos(algo, demos)  # exercise the one-upload path
    for _ in range(6):
        m = fit_demos(algo, prepared, epochs=2, num_minibatches=8)
        losses.append(m["loss"])
    acc1 = accuracy(algo.params)
    assert m["demo_steps"] == demos["action"].shape[0]
    assert losses[-1] < losses[0]
    assert acc1 > max(5 * acc0, 0.15), (acc0, acc1)
    jax.block_until_ready(algo.params)
