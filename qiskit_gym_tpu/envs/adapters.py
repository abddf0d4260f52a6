"""Gymnasium adapter for single-env interactive use.

Wraps a gym's numpy spec env in the standard Gymnasium interface
(MultiBinary observation / Discrete action, 5-tuple step), matching the
reference adapter's behavior (reference envs/adapters.py:18-105) including
the assert-on-stepping-a-final-env and attribute forwarding.
"""

from __future__ import annotations

import numpy as np

try:
    import gymnasium as gym
    from gymnasium import spaces

    _GYM_BASE = gym.Env
except Exception:  # pragma: no cover - gymnasium is in the image, but be safe
    gym = None
    spaces = None
    _GYM_BASE = object


class GymnasiumEnv(_GYM_BASE):
    """Gymnasium view over a synthesis gym (or a bare spec env)."""

    metadata = {"render_modes": ["human"], "render_fps": 4}

    def __init__(self, env):
        # `env` is a BaseSynthesisEnv (has .spec) or a spec env directly
        self._synth_env = env
        self._spec_env = getattr(env, "spec", env)
        self._obs_shape = tuple(self._spec_env.obs_shape())
        if spaces is not None:
            self.observation_space = spaces.MultiBinary(self._obs_shape)
            self.action_space = spaces.Discrete(self._spec_env.num_actions())

    def _full_obs(self) -> np.ndarray:
        full = np.zeros(int(np.prod(self._obs_shape)), dtype=np.int8)
        full[self._spec_env.observe()] = 1
        return full.reshape(self._obs_shape)

    def reset(self, *, seed=None, options=None):
        if seed is not None and gym is not None:
            super().reset(seed=seed)
            self._spec_env.rng = np.random.default_rng(seed)
        self._spec_env.reset()
        return self._full_obs(), {}

    def step(self, action):
        assert not bool(self._spec_env.is_final()), (
            "Action provided when env is in final state."
        )
        self._spec_env.step(int(action))
        return (
            self._full_obs(),
            float(self._spec_env.reward()),
            bool(self._spec_env.is_final()),
            False,
            {},
        )

    def render(self):
        print(self._spec_env.get_state() if hasattr(self._spec_env, "get_state")
              else self._full_obs())

    def close(self):
        pass

    @property
    def difficulty(self):
        return self._spec_env.get_difficulty()

    @difficulty.setter
    def difficulty(self, value):
        target = self._synth_env
        if hasattr(target, "difficulty"):
            target.difficulty = value
        else:
            self._spec_env.set_difficulty(value)

    def __getattr__(self, name):
        return getattr(self._spec_env, name)

    def to_json(self):
        if hasattr(self._synth_env, "to_json"):
            return self._synth_env.to_json()
        return {}


def gym_adapter(env) -> GymnasiumEnv:
    """Wrap a synthesis gym (or spec env) as a Gymnasium env."""
    return GymnasiumEnv(env)
