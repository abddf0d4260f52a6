"""Whole-step fused kernel (ops/pallas_fused.py) vs the XLA step.

Bit-exact over multi-step trajectories in interpret mode on CPU, covering
W=1 (8q clifford, forced bitpack) and W=2 (17q clifford) word widths plus
the 27q heavy-hex bench config, across every state field the step touches
(packed matrices, layer metrics, counters, depth, inversion, success,
reward)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qiskit_gym_tpu.envs import (CliffordGym, LinearFunctionGym,
                                 PermutationGym)
from qiskit_gym_tpu.ops.matrix_env import MatrixEnvCore
from qiskit_gym_tpu.ops.pallas_fused import fused_step

LINE_8 = [(i, i + 1) for i in range(7)]
LINE_17 = [(i, i + 1) for i in range(16)]
HEAVY_HEX_27 = [
    (0, 1), (1, 2), (1, 4), (2, 3), (3, 5), (4, 7), (5, 8), (6, 7), (7, 10),
    (8, 9), (8, 11), (10, 12), (11, 14), (12, 13), (12, 15), (13, 14),
    (14, 16), (15, 18), (16, 19), (17, 18), (18, 21), (19, 20), (19, 22),
    (21, 23), (22, 25), (23, 24), (24, 25), (25, 26),
]


def _assert_states_equal(got, want, t):
    for field in want._fields:
        g = np.asarray(getattr(got, field))
        w = np.asarray(getattr(want, field))
        if g.dtype.kind == "f":
            assert np.allclose(g, w, atol=1e-6), (field, t)
        else:
            assert np.array_equal(g, w), (field, t)


@pytest.mark.parametrize("coupling,kwargs", [
    (LINE_8, {"bitpack": True}),         # W = 1
    (LINE_17, {}),                       # W = 2 (dim 34)
    (HEAVY_HEX_27, {}),                  # the bench config (dim 54)
])
def test_fused_step_bit_exact(coupling, kwargs):
    env = CliffordGym.from_coupling_map(coupling)
    core = env.core
    if kwargs.get("bitpack"):
        from qiskit_gym_tpu.ops.matrix_env import MatrixEnvCore

        core = MatrixEnvCore(core.num_qubits, core.gateset, "clifford",
                             bitpack=True)
    assert core.bitpack
    # the fused kernel always tracks layers; run the XLA side tracked too
    # (default weights elide it — ops/matrix_env.py track_layers)
    core.track_layers = True
    B = 48
    state = core.reset(jax.random.key(0), B, 8)
    rng = np.random.default_rng(11)
    for t in range(5):
        # include the noop action and repeated 1q/2q gates in the mix
        actions = jnp.asarray(
            rng.integers(0, core.num_actions + 1, B), jnp.int32)
        flips = jnp.asarray(rng.random(B) < 0.5)
        want = core.step(state, actions, jax.random.key(t),
                         invert_override=flips)
        got = fused_step(core, state, actions, flips, block_b=16,
                         interpret=True)
        _assert_states_equal(got, want, t)
        state = want


@pytest.mark.parametrize("gym_cls,kind", [
    (PermutationGym, "permutation"),
    (LinearFunctionGym, "linear"),
])
def test_fused_step_matrix_families_forced_bitpack(gym_cls, kind):
    """dim-27 families run dense by default; the fused kernel only exists
    for the packed rep — pin W=1 forced-bitpack bit-exactness for them."""
    env = gym_cls.from_coupling_map(HEAVY_HEX_27)
    base = env.core
    core = MatrixEnvCore(base.num_qubits, base.gateset, kind, bitpack=True)
    core.track_layers = True  # fused kernel always tracks layers
    B = 32
    state = core.reset(jax.random.key(3), B, 8)
    rng = np.random.default_rng(5)
    for t in range(3):
        actions = jnp.asarray(
            rng.integers(0, core.num_actions + 1, B), jnp.int32)
        flips = jnp.asarray(rng.random(B) < 0.5)
        want = core.step(state, actions, jax.random.key(t),
                         invert_override=flips)
        got = fused_step(core, state, actions, flips, block_b=16,
                         interpret=True)
        _assert_states_equal(got, want, t)
        state = want


def test_fused_step_flag_routes_through_step():
    env = CliffordGym.from_coupling_map(LINE_17)
    core = env.core
    core.track_layers = True  # fused kernel always tracks layers
    B = 16
    state = core.reset(jax.random.key(2), B, 6)
    actions = jnp.asarray(
        np.random.default_rng(0).integers(0, core.num_actions, B), jnp.int32)
    flips = jnp.asarray(np.zeros(B, bool))
    want = core.step(state, actions, jax.random.key(5),
                     invert_override=flips)
    core.use_pallas_step = True
    try:
        # interpret mode is forced globally so the flag path runs on CPU
        from jax.experimental.pallas import tpu as pltpu

        with pltpu.force_tpu_interpret_mode():
            got = core.step(state, actions, jax.random.key(5),
                            invert_override=flips)
    finally:
        core.use_pallas_step = False
    _assert_states_equal(got, want, 0)
