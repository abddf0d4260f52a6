"""Gymnasium adapter for single-env interactive use.

Wraps a gym's numpy spec env in the standard Gymnasium interface
(MultiBinary observation / Discrete action, 5-tuple step), matching the
reference adapter's behavior (reference envs/adapters.py:18-105) including
the assert-on-stepping-a-final-env and attribute forwarding.
"""

from __future__ import annotations

from typing import Optional

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
        if seed is not None:
            if gym is not None:
                super().reset(seed=seed)
            # reproducibility must not depend on gymnasium being importable
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


class VectorGymnasiumEnv:
    """Vectorized Gymnasium view over the batched device-resident core.

    Unlike `GymnasiumEnv` (one host-side numpy spec env per instance — the
    reference's interactive surface), this exposes the jitted JAX core the
    training stack runs on: `num_envs` environments live on the accelerator
    and step in one fused program. The API follows `gymnasium.vector`
    conventions with same-step autoreset: when an episode ends (terminated =
    solved, truncated = depth budget exhausted) the lane is reset within the
    same `step()` call and the fresh observation is returned, while the
    closing observation is available as `infos["final_observation"]`.

    The reference has no vector API (its parallelism lives behind the
    training engine, 32 CPU actors — reference rl/configs.py:134); here the
    same batched kernels that drive training are also a user surface.
    """

    def __init__(self, env, num_envs: int = 256,
                 difficulty: Optional[int] = None, seed: int = 0):
        import jax

        self._synth_env = env
        self.core = env.core
        self.num_envs = int(num_envs)
        # inherit the wrapped env's curriculum difficulty unless overridden
        # (matching the single-env adapter; a silent default of 1 made
        # vector evaluation run on a trivially easy distribution)
        if difficulty is None:
            difficulty = int(getattr(env, "difficulty", 1))
        self._difficulty = int(difficulty)
        self._key = jax.random.key(seed)
        self._state = None
        self._obs_shape = tuple(int(d) for d in self.core.obs_shape)
        if spaces is not None:
            self.single_observation_space = spaces.MultiBinary(self._obs_shape)
            self.single_action_space = spaces.Discrete(self.core.num_actions)
            # batched views for gymnasium.vector drop-in compatibility
            self.observation_space = spaces.MultiBinary(
                (self.num_envs,) + self._obs_shape)
            self.action_space = spaces.MultiDiscrete(
                [self.core.num_actions] * self.num_envs)
        self._build()

    # difficulty is a static argument of the jitted programs (reset scramble
    # loop bounds); changing it swaps in a re-jitted pair
    @property
    def difficulty(self) -> int:
        return self._difficulty

    @difficulty.setter
    def difficulty(self, value: int):
        self._difficulty = int(value)
        self._build()

    def _build(self):
        import jax
        import jax.numpy as jnp

        core, B, diff = self.core, self.num_envs, self._difficulty

        def reset_fn(key):
            state = core.reset(key, B, diff)
            return state, core.observe(state, dtype=jnp.int8)

        def step_fn(state, actions, key):
            k_step, k_reset = jax.random.split(key)
            stepped = core.step(state, actions, k_step)
            terminated = stepped.success
            truncated = (stepped.depth == 0) & ~terminated
            done = terminated | truncated
            fresh = core.reset(k_reset, B, diff)

            def sel(f, s):
                d = done.reshape(done.shape + (1,) * (s.ndim - 1))
                return jnp.where(d, f, s)

            new_state = jax.tree.map(sel, fresh, stepped)
            return (new_state, core.observe(new_state, dtype=jnp.int8),
                    stepped.reward, terminated, truncated,
                    core.observe(stepped, dtype=jnp.int8))

        self._reset_j = jax.jit(reset_fn)
        self._step_j = jax.jit(step_fn)

    def _split(self):
        import jax

        self._key, sub = jax.random.split(self._key)
        return sub

    def reset(self, *, seed=None, options=None):
        import jax

        if seed is not None:
            self._key = jax.random.key(seed)
        self._state, obs = self._reset_j(self._split())
        return np.asarray(obs), {}

    def step(self, actions):
        import jax.numpy as jnp

        assert self._state is not None, "call reset() before step()"
        actions = jnp.asarray(actions, dtype=jnp.int32)
        (self._state, obs, reward, terminated, truncated,
         final_obs) = self._step_j(self._state, actions, self._split())
        terminated = np.asarray(terminated)
        truncated = np.asarray(truncated)
        infos = {}
        done = terminated | truncated
        if done.any():
            infos["final_observation"] = np.asarray(final_obs)
            infos["_final_observation"] = done
        return (np.asarray(obs), np.asarray(reward), terminated, truncated,
                infos)

    def masks(self) -> np.ndarray:
        """bool [num_envs, A] action masks for the current state."""
        assert self._state is not None, "call reset() before masks()"
        return np.asarray(self.core.masks(self._state))

    def close(self):
        pass


def vector_gym_adapter(env, num_envs: int = 256, **kw) -> VectorGymnasiumEnv:
    """Wrap a synthesis gym as a batched (device-resident) vector env."""
    return VectorGymnasiumEnv(env, num_envs=num_envs, **kw)
