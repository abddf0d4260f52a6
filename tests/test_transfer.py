"""Policy gateset-transfer (models/transfer.py).

The graft must preserve the source policy's behavior exactly on the shared
actions — transferred logits identical, value identical — while giving new
actions a constant floor logit. This is the mechanism that crossed the 27q
full-gateset Pauli rotation onset (docs/TRAINING.md)."""

import numpy as np
import pytest

from qiskit_gym_tpu.envs import CliffordGym
from qiskit_gym_tpu.models import graft_action_head, make_policy
from qiskit_gym_tpu.rl import BasicPolicyConfig

LINE_3 = [(0, 1), (1, 0), (1, 2), (2, 1)]


def _policy_and_params(env, seed):
    import jax

    obs_perms, act_perms = env.twists()
    policy = make_policy(
        "twisterl.nn.BasicPolicy", env.obs_shape(), env.num_actions(),
        BasicPolicyConfig(embedding_size=32, common_layers=[16]).to_json(),
        obs_perms=obs_perms, act_perms=act_perms)
    params = policy.init(jax.random.PRNGKey(seed))
    return policy, params


def test_graft_preserves_source_behavior():
    src_env = CliffordGym.from_coupling_map(LINE_3, basis_gates=("H", "CX"))
    dst_env = CliffordGym.from_coupling_map(LINE_3)  # all 8 gates
    src_gs, dst_gs = src_env.gateset, dst_env.gateset
    assert set(src_gs) < set(dst_gs)

    src_policy, src_params = _policy_and_params(src_env, 0)
    dst_policy, dst_params = _policy_and_params(dst_env, 1)
    grafted = graft_action_head(dst_params, src_params, src_gs, dst_gs)

    import jax.numpy as jnp

    obs = jnp.asarray(
        (np.random.default_rng(3).random((1, *src_env.obs_shape())) > 0.5
         ).astype(np.float32))
    src_logits, src_value = src_policy.apply(src_params, obs)
    dst_logits, dst_value = dst_policy.apply(grafted, obs)
    src_logits, dst_logits = src_logits[0], dst_logits[0]

    cols = [dst_gs.index(g) for g in src_gs]
    np.testing.assert_allclose(np.asarray(dst_logits)[cols],
                               np.asarray(src_logits), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(dst_value), np.asarray(src_value),
                               rtol=1e-6)

    # new actions share one constant floor logit <= every transferred bias
    new = [i for i in range(len(dst_gs)) if i not in cols]
    floor = np.asarray(dst_logits)[new]
    assert np.allclose(floor, floor[0], atol=1e-6)
    bias = np.asarray(src_params["params"]["action_out"]["bias"])
    assert floor[0] <= bias.min() + 1e-6


def test_graft_rejects_non_subset_and_mismatch():
    src_env = CliffordGym.from_coupling_map(LINE_3, basis_gates=("H", "CX"))
    dst_env = CliffordGym.from_coupling_map(LINE_3, basis_gates=("S", "CX"))
    _, src_params = _policy_and_params(src_env, 0)
    _, dst_params = _policy_and_params(dst_env, 1)
    with pytest.raises(ValueError, match="absent from destination"):
        graft_action_head(dst_params, src_params,
                          src_env.gateset, dst_env.gateset)
    with pytest.raises(ValueError, match="outputs"):
        graft_action_head(dst_params, src_params,
                          src_env.gateset[:-1], src_env.gateset[:-1])


def test_graft_rejects_trunk_shape_mismatch():
    """Same module names but different layer widths must fail loudly at
    graft time (not later as an opaque flax apply() shape error)."""
    import jax

    src_env = CliffordGym.from_coupling_map(LINE_3, basis_gates=("H", "CX"))
    dst_env = CliffordGym.from_coupling_map(LINE_3)
    _, src_params = _policy_and_params(src_env, 0)
    wide = make_policy(
        "twisterl.nn.BasicPolicy", dst_env.obs_shape(),
        dst_env.num_actions(),
        BasicPolicyConfig(embedding_size=64, common_layers=[16]).to_json())
    dst_params = wide.init(jax.random.PRNGKey(1))
    with pytest.raises(ValueError, match="shape mismatch grafting"):
        graft_action_head(dst_params, src_params,
                          src_env.gateset, dst_env.gateset)


def test_conv1d_convolves_documented_axis():
    """Conv1dPolicy must convolve obs axis `conv_dim` (flax Conv is
    channels-last, so the swap condition is load-bearing). Anchor: the
    reference's embedding_size=1260 factors exactly over a 63-column Pauli
    obs (1260 = 63 x 20) — conv_dim=1 on a [54, 63] obs must give
    conv.kernel [k, 54, 20] and a square 1260x1260 embeddings layer."""
    import jax
    import jax.numpy as jnp

    from qiskit_gym_tpu.models.policies import Conv1dPolicy

    m = Conv1dPolicy(num_actions=10)  # defaults: conv_dim=1, 1260
    params = m.init(jax.random.key(0), jnp.zeros((1, 54, 63)))
    assert params["params"]["conv"]["kernel"].shape == (3, 54, 20)
    assert params["params"]["embeddings"]["kernel"].shape == (1260, 1260)

    m0 = Conv1dPolicy(num_actions=10, conv_dim=0, embedding_size=54 * 2)
    p0 = m0.init(jax.random.key(0), jnp.zeros((1, 54, 63)))
    assert p0["params"]["conv"]["kernel"].shape == (3, 63, 2)
