"""AlphaZero: batched MCTS self-play + policy/value fitting, on device.

Per decision, `num_mcts_searches` simulations run through the batched
array-MCTS (rl/mcts.py); the played action is sampled from root visit counts
during collection and argmax'd for deterministic eval/solve. Training targets
are the normalized root visits (policy) and the undiscounted reward-to-go
(value), fitted with CE + MSE for num_epochs. Curriculum/eval/logging
semantics are shared with PPO (reference configs rl/configs.py:300-508).
"""

from __future__ import annotations

import time
from typing import Dict, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from qiskit_gym_tpu.models.policies import PolicyBundle

from .configs import AlphaZeroConfig, EvalConfig
from .mcts import mcts_search
from .solve import policy_solve


class AZTrajectory(NamedTuple):
    obs: jnp.ndarray          # [T, B, ...] uint8
    visit_probs: jnp.ndarray  # [T, B, A]
    action: jnp.ndarray       # [T, B] policy-frame action that was played
    actual: jnp.ndarray       # [T, B] env-frame action (after symmetry
    #                           un-permutation; == action for most envs —
    #                           cf. rl/rollout.Trajectory.actual)
    inverted: jnp.ndarray     # [T, B] env inversion flag when acting
    reward: jnp.ndarray       # [T, B]
    valid: jnp.ndarray        # [T, B]
    success: jnp.ndarray      # [B]


def collect_mcts(core, policy_apply, params, state, key, T: int,
                 num_sims: int, c_puct: float, deterministic: bool = False,
                 temperature: float = 1.0, temperature_drop: int = 0,
                 noise_eps: float = 0.0, dirichlet_alpha: float = 0.3,
                 max_expand_depth: int = 1):
    """`noise_eps`/`dirichlet_alpha` add AZ root exploration noise per move;
    `temperature_drop > 0` switches from visit-sampling to argmax after that
    many moves (AlphaZero temperature schedule); both are self-play-only knobs
    (pass defaults for eval)."""
    # pregenerate per-step keys (serial per-step threefry chains are
    # expensive on TPU; see rl/rollout.collect)
    step_keys = jax.random.split(key, 3 * T).reshape(T, 3)
    step_idx = jnp.arange(T, dtype=jnp.int32)

    def step_fn(env_state, xs):
        keys_t, t = xs
        k_sim, k_act, k_step = keys_t[0], keys_t[1], keys_t[2]
        obs = core.dense(env_state)
        visits, root_value, _priors = mcts_search(
            core, policy_apply, params, env_state, k_sim,
            num_sims=num_sims, c_puct=c_puct,
            # tree-depth cap: selection deeper than ~32 is vanishingly rare
            # and each extra level is a sequential fori iteration per sim
            max_depth=min(T, 32),
            dirichlet_alpha=dirichlet_alpha, noise_eps=noise_eps,
            max_expand_depth=max_expand_depth,
        )
        probs = visits / jnp.maximum(visits.sum(-1, keepdims=True), 1e-8)
        if deterministic:
            action = jnp.argmax(visits, axis=-1)
        else:
            logits = jnp.log(jnp.maximum(visits, 1e-8)) / temperature
            action = jax.random.categorical(k_act, logits, axis=-1)
            if temperature_drop > 0:
                action = jnp.where(t >= temperature_drop,
                                   jnp.argmax(visits, axis=-1), action)

        live = ~core.is_final(env_state)
        # env-frame action: the Pauli env samples a random automorphism at
        # observe-time and un-permutes incoming actions through it (reference
        # pauli.rs:592-599); the executed gate is translate_action(action)
        actual = (core.translate_action(env_state, action)
                  if hasattr(core, "translate_action") else action)
        stepped = core.step(env_state, action, k_step)
        new_state = jax.tree.map(
            lambda new, old: jnp.where(
                live.reshape(live.shape + (1,) * (new.ndim - 1)), new, old
            ),
            stepped, env_state,
        )
        reward = jnp.where(live, new_state.reward, 0.0)
        tr = AZTrajectory(
            obs=obs,
            visit_probs=probs,
            action=action,
            actual=actual,
            inverted=env_state.inverted,
            reward=reward,
            valid=live,
            success=jnp.zeros_like(live),
        )
        return new_state, tr

    final_state, traj = jax.lax.scan(step_fn, state, (step_keys, step_idx),
                                     length=T)
    traj = traj._replace(success=final_state.success)
    return final_state, traj


class AZ:
    def __init__(self, env, policy: PolicyBundle, config: AlphaZeroConfig,
                 params: Optional[dict] = None, seed: int = 0, mesh=None):
        self.env = env
        self.core = env.core
        self.policy = policy
        self.config = config
        self.mesh = mesh
        self.key = jax.random.key(seed)
        self.params = params if params is not None else policy.init(
            jax.random.key(seed + 1)
        )
        self.tx = optax.adam(config.lr)
        self.opt_state = self.tx.init(self.params)
        self.run_path: Optional[str] = None
        self.tb_writer = None
        self.iteration = 0
        # snapshot taken each time the curriculum gate passes (cf. PPO.learn)
        self.best_params = None
        self.best_difficulty = 0
        self._train_cache: Dict[tuple, callable] = {}
        self._eval_cache: Dict[tuple, callable] = {}

    # When True, rollouts always use the max_depth horizon so the jitted
    # train/eval programs compile once instead of once per difficulty level
    # (episodes still end at their depth budget via the env's done flags;
    # the extra scan steps are frozen lanes). Useful where XLA compiles are
    # expensive; semantics are unchanged.
    fixed_horizon: bool = False

    def _horizon(self, difficulty: int) -> int:
        if self.fixed_horizon:
            return self.core.max_depth
        return max(min(self.core.depth_slope * difficulty, self.core.max_depth), 1)

    def _loss(self, params, traj: AZTrajectory, returns):
        T, B = traj.reward.shape
        obs = traj.obs.reshape((T * B,) + traj.obs.shape[2:])
        logits, value = self.policy.apply(params, obs)
        logits = logits.reshape(T, B, -1)
        value = value.reshape(T, B)
        valid = traj.valid.astype(jnp.float32)
        count = jnp.maximum(valid.sum(), 1.0)
        logp = jax.nn.log_softmax(logits, axis=-1)
        pol_loss = -((traj.visit_probs * logp).sum(-1) * valid).sum() / count
        v_loss = (((value - returns) ** 2) * valid).sum() / count
        loss = pol_loss + v_loss
        return loss, {"loss": loss, "pg_loss": pol_loss, "v_loss": v_loss}

    def _make_train_step(self, T: int, B: int):
        cfg = self.config

        def train_step(params, opt_state, key, difficulty):
            k_reset, k_roll = jax.random.split(key)
            state = self.core.reset(k_reset, B, difficulty)
            if self.mesh is not None:
                from qiskit_gym_tpu.parallel import shard_env_state, shard_params

                state = shard_env_state(self.mesh, state)
                params = shard_params(self.mesh, params)
            final_state, traj = collect_mcts(
                self.core, self.policy.apply, params, state, k_roll, T,
                num_sims=cfg.num_mcts_searches, c_puct=cfg.C,
                temperature=cfg.temperature,
                temperature_drop=cfg.temperature_drop,
                noise_eps=cfg.root_noise_eps,
                dirichlet_alpha=cfg.dirichlet_alpha,
                max_expand_depth=cfg.max_expand_depth,
            )
            # undiscounted reward-to-go as the value target
            def back(g, xs):
                r, done_mask = xs
                g = r + g * done_mask
                return g, g

            nonterm = traj.valid.astype(jnp.float32)
            _, returns = jax.lax.scan(
                back, jnp.zeros_like(traj.reward[0]),
                (traj.reward, nonterm), reverse=True,
            )

            def epoch(carry, _):
                params, opt_state = carry
                (loss, aux), grads = jax.value_and_grad(
                    self._loss, has_aux=True
                )(params, traj, returns)
                updates, opt_state = self.tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), aux

            (params, opt_state), auxs = jax.lax.scan(
                epoch, (params, opt_state), None, length=cfg.num_epochs
            )
            metrics = {k: v[-1] for k, v in auxs.items()}
            metrics["success_rate"] = final_state.success.mean()
            metrics["steps_collected"] = traj.valid.sum()
            return params, opt_state, metrics

        return jax.jit(train_step)

    def _make_eval(self, T: int, ev: EvalConfig):
        E, S = ev.num_episodes, ev.num_searches
        num_sims = ev.num_mcts_searches
        deterministic = ev.deterministic

        def eval_fn(params, key, difficulty):
            k_reset, k_roll = jax.random.split(key)
            state = self.core.reset(k_reset, E, difficulty)
            if S > 1:
                state = jax.tree.map(lambda x: jnp.repeat(x, S, axis=0), state)
            if self.mesh is not None:
                from qiskit_gym_tpu.parallel import (shard_env_state,
                                                     shard_params)

                state = shard_env_state(self.mesh, state)
                params = shard_params(self.mesh, params)
            if num_sims > 0:
                final_state, _ = collect_mcts(
                    self.core, self.policy.apply, params, state, k_roll, T,
                    num_sims=num_sims, c_puct=ev.C, deterministic=deterministic,
                )
            else:
                from .rollout import collect

                final_state, _ = collect(
                    self.core, self.policy.apply, params, state, k_roll, T,
                    deterministic=deterministic,
                )
            success = final_state.success.reshape(E, S).any(axis=1)
            return success.astype(jnp.float32).mean()

        return jax.jit(eval_fn)

    def run_evals(self, difficulty: int) -> Dict[str, float]:
        T = self._horizon(difficulty)
        out = {}
        for name, ev in self.config.evals.items():
            ck = (name, T)
            if ck not in self._eval_cache:
                self._eval_cache[ck] = self._make_eval(T, ev)
            self.key, sub = jax.random.split(self.key)
            out[name] = float(self._eval_cache[ck](self.params, sub,
                                                   jnp.int32(difficulty)))
        return out

    def learn(self, num_iterations: int = int(1e10)) -> None:
        cfg = self.config
        B = cfg.num_episodes
        difficulty = int(getattr(self.env, "difficulty", 1))
        for _ in range(num_iterations):
            it_start = time.time()
            T = self._horizon(difficulty)
            if (T, B) not in self._train_cache:
                self._train_cache[(T, B)] = self._make_train_step(T, B)
            self.key, sub = jax.random.split(self.key)
            self.params, self.opt_state, metrics = self._train_cache[(T, B)](
                self.params, self.opt_state, sub, jnp.int32(difficulty)
            )
            metrics = {k: float(v) for k, v in metrics.items()}
            evals = self.run_evals(difficulty)
            metrics.update({f"eval/{k}": v for k, v in evals.items()})
            metrics["difficulty"] = difficulty
            metrics["iter_seconds"] = time.time() - it_start

            gate = evals.get(cfg.diff_metric)
            if gate is not None and gate >= cfg.diff_threshold:
                # proven at this difficulty — snapshot (cf. PPO.learn)
                self.best_params = self.params
                self.best_difficulty = difficulty
                difficulty = min(difficulty + 1, cfg.diff_max)
                self.env.difficulty = difficulty

            self.iteration += 1
            if self.tb_writer is not None and self.iteration % cfg.log_freq == 0:
                for k, v in metrics.items():
                    self.tb_writer.add_scalar(k, v, self.iteration)
            if self.run_path is not None and (
                self.iteration % cfg.checkpoint_freq == 0
            ):
                import os

                from qiskit_gym_tpu.models.torch_io import save_torch_checkpoint

                os.makedirs(self.run_path, exist_ok=True)
                save_torch_checkpoint(
                    self.params,
                    os.path.join(self.run_path, f"checkpoint_{self.iteration}.pt"),
                )
                self.save_training_state(
                    os.path.join(self.run_path, "train_state.msgpack"))

    def save_training_state(self, path: str) -> None:
        from .checkpoint import save_training_state

        save_training_state(self, path)

    def restore_training_state(self, path: str) -> None:
        from .checkpoint import restore_training_state

        restore_training_state(self, path)

    # ------------------------------------------------------------------ solve
    def solve(
        self,
        state,
        deterministic: bool = False,
        num_searches: int = 100,
        num_mcts_searches: int = 0,
        C: float = 2 ** 0.5,
        max_expand_depth: int = 1,
    ):
        if num_mcts_searches <= 0:
            return policy_solve(
                self.env, self.policy, self.params, state,
                deterministic=deterministic, num_searches=num_searches,
                mesh=self.mesh,
            )
        return mcts_solve(
            self.env, self.policy, self.params, state,
            num_searches=num_searches, num_mcts_searches=num_mcts_searches,
            C=C, deterministic=deterministic,
            max_expand_depth=max_expand_depth, mesh=self.mesh,
        )


def mcts_solve(env, policy, params, state_encoded, num_searches: int,
               num_mcts_searches: int, C: float, deterministic: bool = False,
               key=None, max_expand_depth: int = 1, mesh=None):
    """MCTS-guided batched solve (reference rl/synthesis.py:112-126 with
    num_mcts_searches > 0).

    Shares the env hooks with rl/solve.policy_solve: the target state is
    tiled through env.make_solve_state (which knows each family's dense
    layout — the Pauli env needs tableau + rotation labels, not just a
    matrix) and the winning lane's ENV-FRAME actions (traj.actual — what
    the env actually executed after symmetry un-permutation) go through
    env.solution_from_trace for reconstruction (inversion bookkeeping for
    the matrix envs; packed rotation events via spec replay for Pauli).
    """
    from .solve import best_lane

    core = env.core
    state = env.make_solve_state(state_encoded, num_searches)
    if key is None:
        key = jax.random.key(np.random.randint(0, 2**31 - 1))
    if mesh is not None:
        from qiskit_gym_tpu.parallel import shard_env_state, shard_params

        state = shard_env_state(mesh, state)
        params = shard_params(mesh, params)

    T = core.max_depth
    final_state, traj = jax.jit(
        lambda s, k: collect_mcts(
            core, policy.apply, params, s, k, T,
            num_sims=num_mcts_searches, c_puct=C, deterministic=deterministic,
            max_expand_depth=max_expand_depth,
        )
    )(state, key)

    best = best_lane(final_state, traj)
    if best is None:
        return None
    valid = np.asarray(traj.valid)[:, best]
    actions = np.asarray(traj.actual)[:, best][valid]
    inverted = np.asarray(traj.inverted)[:, best][valid]
    return env.solution_from_trace(state_encoded, actions.tolist(),
                                   inverted.tolist())
