"""Pallas fused-step kernel vs the XLA path (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qiskit_gym_tpu.envs import CliffordGym, LinearFunctionGym, PermutationGym
from qiskit_gym_tpu.ops.matrix_env import MatrixEnvCore
from qiskit_gym_tpu.ops.pallas_step import fused_step_apply

LINE_4 = [(0, 1), (1, 2), (2, 3)]


@pytest.mark.parametrize("gym_cls,kind", [
    (CliffordGym, "clifford"),
    (LinearFunctionGym, "linear"),
    (PermutationGym, "permutation"),
])
def test_pallas_matches_xla(gym_cls, kind):
    # This kernel is the DENSE-layout per-step baseline (measured-and-lost,
    # docs/PERF.md); since round 4 made bitpacked uint32 the universal
    # default, the dense core must be requested explicitly here.
    env = gym_cls.from_coupling_map(LINE_4)
    core = MatrixEnvCore(env.core.num_qubits, env.core.gateset, kind,
                         bitpack=False)
    assert not core.bitpack
    B = 32
    state = core.reset(jax.random.key(0), B, 6)
    rng = np.random.default_rng(3)
    a, ainv = state.a, state.ainv
    for t in range(4):
        actions = jnp.asarray(rng.integers(0, core.num_actions, B), jnp.int32)
        flips = jnp.asarray(rng.random(B) < 0.5)

        na_x, ni_x = core.apply_gates(a, ainv, actions)
        f3 = flips[:, None, None]
        want_a = jnp.where(f3, ni_x, na_x)
        want_i = jnp.where(f3, na_x, ni_x)
        want_s = jnp.all(want_a == core.ident[None], axis=(1, 2))

        got_a, got_i, got_s = fused_step_apply(
            core, a, ainv, actions, flips, block_b=8, interpret=True
        )
        assert np.array_equal(np.asarray(got_a), np.asarray(want_a)), t
        assert np.array_equal(np.asarray(got_i), np.asarray(want_i)), t
        assert np.array_equal(np.asarray(got_s), np.asarray(want_s)), t
        a, ainv = got_a, got_i
