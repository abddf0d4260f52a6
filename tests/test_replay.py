"""Curriculum replay (diff_replay): per-lane difficulty collection.

At a low-success frontier most episodes carry no reward signal and the
entropy bonus erodes the policy (docs/TRAINING.md 'entropy-collapse wall');
diff_replay mixes recently-mastered difficulties into every batch. The env
cores accept a per-lane difficulty VECTOR (their scramble masks broadcast)
— these tests pin that contract plus the sampler and the config plumbing.
"""

import jax
import jax.numpy as jnp
import numpy as np

from qiskit_gym_tpu.envs import CliffordGym, PauliGym
from qiskit_gym_tpu.rl import AlphaZeroConfig, BasicPolicyConfig, PPOConfig, RLSynthesis
from qiskit_gym_tpu.rl.rollout import sample_difficulties

LINE_3 = [(0, 1), (1, 2)]


def test_sample_difficulties_off_is_passthrough():
    out = sample_difficulties(jax.random.key(0), 8, 5, 0)
    assert out == 5  # scalar, untouched — cached jit shapes unchanged


def test_sample_difficulties_mixes_and_clamps():
    d = sample_difficulties(jax.random.key(1), 64, 6, 3)
    d = np.asarray(d)
    assert d.shape == (64,)
    assert (d[::2] == 6).all()            # interleaved frontier half
    assert ((d >= 3) & (d <= 6)).all()    # replay window [d - 3, d]
    assert (d[1::2] < 6).any()            # some replay actually happens
    # window never goes below difficulty 1
    d1 = np.asarray(sample_difficulties(jax.random.key(2), 64, 2, 8))
    assert (d1 >= 1).all()


def test_reset_accepts_per_lane_difficulty_vector():
    """Lane difficulty 0 must reset to the solved identity while a high-
    difficulty lane in the SAME batch is scrambled, each with its own
    episode budget."""
    for gym in (CliffordGym.from_coupling_map(LINE_3, max_depth=64),
                PauliGym.from_coupling_map(LINE_3, max_depth=64,
                                           max_rotations=3)):
        core = gym.core
        d_vec = jnp.asarray([0, 12], jnp.int32)
        state = jax.jit(core.reset, static_argnums=(1,))(
            jax.random.key(3), 2, d_vec)
        success = np.asarray(state.success)
        assert bool(success[0])           # difficulty 0 = identity
        assert not bool(success[1])       # difficulty 12 = scrambled
        depth = np.asarray(state.depth)
        want = np.minimum(core.depth_slope * np.asarray(d_vec),
                          core.max_depth)
        assert (depth == want).all(), (depth, want)


def test_diff_replay_config_roundtrip_and_validation():
    for cls in (PPOConfig, AlphaZeroConfig):
        cfg = cls(diff_replay=4)
        data = cfg.to_json()
        assert data["collecting"]["diff_replay"] == 4
        back = cls.from_json(data)
        assert back.diff_replay == 4
        # default is omitted (reference-schema byte compatibility)
        assert "diff_replay" not in cls().to_json()["collecting"]
        try:
            cls(diff_replay=-1).validate()
            raise AssertionError("negative diff_replay must be rejected")
        except ValueError:
            pass


def test_learn_smoke_with_diff_replay():
    """Two tiny PPO iterations with replay on, packed and unpacked — the
    per-lane difficulty path must compile and run end to end."""
    for packing in (False, True):
        gym = CliffordGym.from_coupling_map(LINE_3, max_depth=16)
        cfg = PPOConfig(num_episodes=16, num_epochs=1, diff_replay=2,
                        episode_packing=packing, pack_pool_slots=2,
                        evals={})
        rls = RLSynthesis(gym, cfg, BasicPolicyConfig(
            embedding_size=16, common_layers=[16], policy_layers=[16],
            value_layers=[16]))
        rls.learn(initial_difficulty=4, num_iterations=2)
        assert rls.algorithm.iteration == 2
