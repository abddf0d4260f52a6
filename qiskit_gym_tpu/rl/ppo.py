"""PPO, fully on device: rollout -> GAE -> clipped update in one jit per
iteration, with eval presets and the success-gated difficulty curriculum.

Semantics follow the reference config schema (reference rl/configs.py:
202-240 — GAE(lambda, gamma), clipped objective, value/entropy coefs,
optional advantage normalization, Adam; curriculum advances difficulty by 1
when evals[diff_metric] >= diff_threshold, up to diff_max; reference
configs.py:108-117). The rollout batch is the whole num_episodes at once —
vmapped envs replace the reference's 32 CPU actor threads.
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import optax

from qiskit_gym_tpu.models.policies import PolicyBundle

from .configs import EvalConfig, PPOConfig
from .rollout import Trajectory, collect, collect_packed, gae
from .solve import policy_solve


class PPO:
    def __init__(self, env, policy: PolicyBundle, config: PPOConfig,
                 params: Optional[dict] = None, seed: int = 0, mesh=None):
        self.env = env                      # user-facing gym (has .core, .difficulty)
        self.core = env.core
        cap = getattr(self.core, "scramble_cap", None)
        if cap is not None and getattr(config, "diff_max", 0) > cap:
            import warnings

            warnings.warn(
                f"diff_max={config.diff_max} exceeds the traced-reset "
                f"scramble cap ({cap}): curriculum difficulties above the "
                f"cap scramble identically to {cap} while depth budgets "
                "keep growing", stacklevel=2)
        self.policy = policy
        self.config = config
        self.mesh = mesh                    # optional jax.sharding.Mesh (dp[, mp])
        self.key = jax.random.key(seed)
        self.params = params if params is not None else policy.init(
            jax.random.key(seed + 1)
        )
        self.tx = optax.adam(config.lr)
        self.opt_state = self.tx.init(self.params)
        self.run_path: Optional[str] = None
        self.tb_writer = None
        self.iteration = 0
        # snapshot taken each time the curriculum gate passes (see learn());
        # None until the first advance
        self.best_params = None
        self.best_difficulty = 0
        self._train_cache: Dict[int, callable] = {}
        self._eval_cache: Dict[tuple, callable] = {}

    # ------------------------------------------------------------ internals
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

    def _loss(self, params, traj: Trajectory, adv, returns):
        cfg = self.config
        T, B = traj.action.shape
        obs = traj.obs.reshape((T * B,) + traj.obs.shape[2:])
        logits, value = self.policy.apply(params, obs)
        logits = logits.reshape(T, B, -1)
        value = value.reshape(T, B)
        logp_all = jax.nn.log_softmax(logits, axis=-1)
        logp = jnp.take_along_axis(logp_all, traj.action[..., None], axis=-1)[..., 0]

        valid = traj.valid.astype(jnp.float32)
        count = jnp.maximum(valid.sum(), 1.0)

        if cfg.normalize_advantage:
            mean = (adv * valid).sum() / count
            var = (((adv - mean) ** 2) * valid).sum() / count
            adv = (adv - mean) * jax.lax.rsqrt(var + 1e-8)

        ratio = jnp.exp(logp - traj.logp)
        clipped = jnp.clip(ratio, 1.0 - cfg.clip_ratio, 1.0 + cfg.clip_ratio)
        pg = -jnp.minimum(ratio * adv, clipped * adv)
        pg_loss = (pg * valid).sum() / count

        v_loss = (((value - returns) ** 2) * valid).sum() / count

        ent = -(jnp.exp(logp_all) * logp_all).sum(-1)
        ent_bonus = (ent * valid).sum() / count

        loss = pg_loss + cfg.vf_coef * v_loss - cfg.ent_coef * ent_bonus
        return loss, {
            "loss": loss, "pg_loss": pg_loss, "v_loss": v_loss, "entropy": ent_bonus,
        }

    def _loss_flat(self, params, batch):
        """Clipped PPO loss over a flat minibatch dict (masked by `valid`);
        same math as _loss, reshaped for the num_minibatches > 1 path."""
        cfg = self.config
        logits, value = self.policy.apply(params, batch["obs"])
        logp_all = jax.nn.log_softmax(logits, axis=-1)
        logp = jnp.take_along_axis(
            logp_all, batch["action"][:, None], axis=-1)[:, 0]
        valid = batch["valid"].astype(jnp.float32)
        count = jnp.maximum(valid.sum(), 1.0)
        adv = batch["adv"]
        if cfg.normalize_advantage:
            mean = (adv * valid).sum() / count
            var = (((adv - mean) ** 2) * valid).sum() / count
            adv = (adv - mean) * jax.lax.rsqrt(var + 1e-8)
        ratio = jnp.exp(logp - batch["logp"])
        clipped = jnp.clip(ratio, 1.0 - cfg.clip_ratio, 1.0 + cfg.clip_ratio)
        pg = -jnp.minimum(ratio * adv, clipped * adv)
        pg_loss = (pg * valid).sum() / count
        v_loss = (((value - batch["ret"]) ** 2) * valid).sum() / count
        ent = -(jnp.exp(logp_all) * logp_all).sum(-1)
        ent_bonus = (ent * valid).sum() / count
        loss = pg_loss + cfg.vf_coef * v_loss - cfg.ent_coef * ent_bonus
        return loss, {"loss": loss, "pg_loss": pg_loss, "v_loss": v_loss,
                      "entropy": ent_bonus}

    def _make_train_step(self, T: int, B: int):
        cfg = self.config

        def train_step(params, opt_state, key, difficulty):
            k_reset, k_roll = jax.random.split(key)
            if self.mesh is not None:
                from qiskit_gym_tpu.parallel import shard_params

                params = shard_params(self.mesh, params)
            if cfg.episode_packing:
                final_state, traj, stats = collect_packed(
                    self.core, self.policy.apply, params, k_roll, T, B,
                    difficulty, pool_slots=cfg.pack_pool_slots,
                    mesh=self.mesh, diff_replay=cfg.diff_replay,
                )
                adv, returns = gae(traj, cfg.gamma, cfg.gae_lambda,
                                   last_value=stats["last_value"])
            else:
                from .rollout import sample_difficulties

                k_diff, k_reset = jax.random.split(k_reset)
                d_lanes = sample_difficulties(k_diff, B, difficulty,
                                              cfg.diff_replay)
                state = self.core.reset(k_reset, B, d_lanes)
                if self.mesh is not None:
                    from qiskit_gym_tpu.parallel import shard_env_state

                    state = shard_env_state(self.mesh, state)
                final_state, traj = collect(
                    self.core, self.policy.apply, params, state, k_roll, T
                )
                stats = None
                adv, returns = gae(traj, cfg.gamma, cfg.gae_lambda)

            if cfg.num_minibatches > 1:
                N = T * B
                # never let a "minibatch" become empty at tiny T*B
                nmb = min(cfg.num_minibatches, N)
                mb = N // nmb
                flat = {
                    "obs": traj.obs.reshape((N,) + traj.obs.shape[2:]),
                    "action": traj.action.reshape(N),
                    "logp": traj.logp.reshape(N),
                    "valid": traj.valid.reshape(N),
                    "adv": adv.reshape(N),
                    "ret": returns.reshape(N),
                }
                k_perm = jax.random.fold_in(key, 1)
                ep_keys = jax.random.split(k_perm, cfg.num_epochs)

                def epoch(carry, ek):
                    params, opt_state = carry
                    idx = jax.random.permutation(ek, N)[: mb * nmb]
                    idx = idx.reshape(nmb, mb)

                    def mb_step(c, ib):
                        params, opt_state = c
                        batch = jax.tree.map(lambda x: x[ib], flat)
                        (loss, aux), grads = jax.value_and_grad(
                            self._loss_flat, has_aux=True
                        )(params, batch)
                        updates, opt_state = self.tx.update(
                            grads, opt_state, params)
                        params = optax.apply_updates(params, updates)
                        return (params, opt_state), aux

                    (params, opt_state), auxs = jax.lax.scan(
                        mb_step, (params, opt_state), idx)
                    return (params, opt_state), jax.tree.map(
                        lambda v: v.mean(), auxs)

                (params, opt_state), auxs = jax.lax.scan(
                    epoch, (params, opt_state), ep_keys)
            else:
                def epoch(carry, _):
                    params, opt_state = carry
                    (loss, aux), grads = jax.value_and_grad(
                        self._loss, has_aux=True
                    )(params, traj, adv, returns)
                    updates, opt_state = self.tx.update(grads, opt_state, params)
                    params = optax.apply_updates(params, updates)
                    return (params, opt_state), aux

                (params, opt_state), auxs = jax.lax.scan(
                    epoch, (params, opt_state), None, length=cfg.num_epochs
                )
            metrics = {k: v[-1] for k, v in auxs.items()}
            if stats is not None:
                done = jnp.maximum(stats["episodes_completed"].sum(), 1)
                metrics["success_rate"] = (
                    stats["episodes_succeeded"].sum() / done
                )
                metrics["episodes_completed"] = (
                    stats["episodes_completed"].sum()
                )
                # per-episode mean (a packed lane completes many episodes)
                metrics["mean_episode_reward"] = (
                    (traj.reward * traj.valid).sum() / done
                )
            else:
                metrics["success_rate"] = final_state.success.mean()
                metrics["mean_episode_reward"] = (
                    (traj.reward * traj.valid).sum(0).mean()
                )
            metrics["steps_collected"] = traj.valid.sum()
            return params, opt_state, metrics

        return jax.jit(train_step)

    def _make_eval(self, T: int, ev: EvalConfig):
        E, S = ev.num_episodes, ev.num_searches
        if self.mesh is not None:
            # a non-dp-divisible lane count (E*S) fails the sharding
            # constraint; round E up to the smallest count making E*S a dp
            # multiple (keeps the success-rate estimate unbiased)
            import math

            dp = dict(self.mesh.shape).get("dp", 1)
            k = dp // math.gcd(S, dp)
            E = -(-E // k) * k
        deterministic = ev.deterministic
        num_sims = ev.num_mcts_searches

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
                from .az import collect_mcts

                final_state, _ = collect_mcts(
                    self.core, self.policy.apply, params, state, k_roll, T,
                    num_sims=num_sims, c_puct=ev.C,
                    deterministic=deterministic,
                )
            else:
                final_state, _ = collect(
                    self.core, self.policy.apply, params, state, k_roll, T,
                    deterministic=deterministic,
                )
            success = final_state.success.reshape(E, S).any(axis=1)
            return success.astype(jnp.float32).mean()

        return jax.jit(eval_fn)

    # ---------------------------------------------------------------- train
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
        metrics = {}
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

            # curriculum
            gate = evals.get(cfg.diff_metric)
            if gate is not None and gate >= cfg.diff_threshold:
                # the policy just PROVED itself at this difficulty — snapshot
                # it. A later hard-regime wall (zero success for hundreds of
                # iterations) lets the entropy bonus walk the live params to
                # uniform at EVERY difficulty within a few minibatched
                # iterations (measured: 27q Pauli at the rotation onset
                # destroyed a 0.86-eval policy in <4 iterations), so "last
                # params" is not a safe artifact; "params at last advance" is.
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
                self._checkpoint()

        from qiskit_gym_tpu.utils.logging import write_learn_end_note

        write_learn_end_note(self.tb_writer, self.iteration, difficulty,
                             self.best_difficulty, metrics,
                             self.best_params is not None,
                             run_path=self.run_path)

    def _checkpoint(self):
        import os

        from qiskit_gym_tpu.models.torch_io import save_torch_checkpoint

        os.makedirs(self.run_path, exist_ok=True)
        save_torch_checkpoint(
            self.params, os.path.join(self.run_path, f"checkpoint_{self.iteration}.pt")
        )
        # resume-capable snapshot (optimizer state, RNG, iteration,
        # curriculum difficulty) alongside the params-only checkpoints
        self.save_training_state(os.path.join(self.run_path,
                                              "train_state.msgpack"))

    def save_training_state(self, path: str) -> None:
        from .checkpoint import save_training_state

        save_training_state(self, path)

    def restore_training_state(self, path: str) -> None:
        from .checkpoint import restore_training_state

        restore_training_state(self, path)

    # ---------------------------------------------------------------- solve
    def solve(
        self,
        state,
        deterministic: bool = False,
        num_searches: int = 100,
        num_mcts_searches: int = 0,
        C: float = 2 ** 0.5,
        max_expand_depth: int = 1,
    ):
        """Policy-guided search from an encoded target state; returns the best
        solution's action list, or None. num_mcts_searches > 0 runs batched
        MCTS per decision (reference EvalConfig semantics, configs.py:25-35)."""
        if num_mcts_searches > 0:
            from .az import mcts_solve

            return mcts_solve(
                self.env, self.policy, self.params, state,
                num_searches=num_searches,
                num_mcts_searches=num_mcts_searches, C=C,
                deterministic=deterministic,
                max_expand_depth=max_expand_depth, mesh=self.mesh,
            )
        return policy_solve(
            self.env, self.policy, self.params, state,
            deterministic=deterministic, num_searches=num_searches,
            mesh=self.mesh,
        )
