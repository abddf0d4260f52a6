"""AlphaZero: batched MCTS self-play + policy/value fitting, on device.

Per decision, `num_mcts_searches` simulations run through the batched
array-MCTS (rl/mcts.py); the played action is sampled from root visit counts
during collection and argmax'd for deterministic eval/solve. Training targets
are the normalized root visits (policy) and the undiscounted reward-to-go
(value), fitted with CE + MSE for num_epochs. Curriculum/eval/logging
semantics are shared with PPO (reference configs rl/configs.py:300-508).
"""

from __future__ import annotations

import os
import time
from types import SimpleNamespace
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
    done: jnp.ndarray         # [T, B] bool: episode ended at/after this step
    success: jnp.ndarray      # [B]


def _mcts_act(core, policy_apply, params, env_state, keys_t, t, T,
              num_sims, c_puct, deterministic, temperature, temperature_drop,
              noise_eps, dirichlet_alpha, max_expand_depth,
              search_depth=None, lane_temp=None):
    """Shared per-step prologue for both MCTS collectors: observe -> batched
    MCTS -> visit-count action selection -> env step. Returns everything an
    AZTrajectory row needs plus the raw stepped state. `search_depth`
    overrides the tree-depth cap — callers that scan fewer than the
    episode's remaining moves (the chunked solve) must pass the FULL
    horizon's cap or the search silently shallows to the chunk length."""
    k_sim, k_act, k_step = keys_t[0], keys_t[1], keys_t[2]
    obs = core.dense(env_state)
    visits, root_value, _priors = mcts_search(
        core, policy_apply, params, env_state, k_sim,
        num_sims=num_sims, c_puct=c_puct,
        # tree-depth cap: measured harmless in the deepest shipped regime
        # (scripts/probe_depth_cap.py, runs-evidence/depth_cap_r5.jsonl —
        # cap 32 vs 64: identical solve rate AND 2q at pauli d24/d32 and
        # perm d32, while cap 64 costs 1.2-1.9x the wall time); each
        # extra level is a sequential fori iteration per sim
        max_depth=min(T, 32) if search_depth is None else search_depth,
        dirichlet_alpha=dirichlet_alpha, noise_eps=noise_eps,
        max_expand_depth=max_expand_depth,
    )
    probs = visits / jnp.maximum(visits.sum(-1, keepdims=True), 1e-8)
    if deterministic:
        action = jnp.argmax(visits, axis=-1)
    elif lane_temp is not None:
        # per-lane temperature portfolio (rl/rollout.solve_temperatures):
        # argmax(log v + t*g) samples softmax(log v / t); t==0 is argmax
        g = jax.random.gumbel(k_act, visits.shape)
        logits = jnp.log(jnp.maximum(visits, 1e-8))
        action = jnp.argmax(logits + lane_temp[:, None] * g, axis=-1)
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
    stepped = core.step(env_state, action, k_step, actual_override=actual)
    return obs, probs, action, actual, live, env_state.inverted, stepped


def collect_mcts(core, policy_apply, params, state, key, T: int,
                 num_sims: int, c_puct: float, deterministic: bool = False,
                 temperature: float = 1.0, temperature_drop: int = 0,
                 noise_eps: float = 0.0, dirichlet_alpha: float = 0.3,
                 max_expand_depth: int = 1, search_depth=None,
                 lane_temp=None):
    """`noise_eps`/`dirichlet_alpha` add AZ root exploration noise per move;
    `temperature_drop > 0` switches from visit-sampling to argmax after that
    many moves (AlphaZero temperature schedule); both are self-play-only knobs
    (pass defaults for eval). `lane_temp` [B] gives each lane its own
    visit-sampling temperature (0 = argmax) — the solve portfolio."""
    # pregenerate per-step keys (serial per-step threefry chains are
    # expensive on TPU; see rl/rollout.collect)
    step_keys = jax.random.split(key, 3 * T).reshape(T, 3)
    step_idx = jnp.arange(T, dtype=jnp.int32)

    def step_fn(env_state, xs):
        keys_t, t = xs
        obs, probs, action, actual, live, inverted, stepped = _mcts_act(
            core, policy_apply, params, env_state, keys_t, t, T,
            num_sims, c_puct, deterministic, temperature, temperature_drop,
            noise_eps, dirichlet_alpha, max_expand_depth, search_depth,
            lane_temp)
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
            inverted=inverted,
            reward=reward,
            valid=live,
            done=core.is_final(new_state),
            success=jnp.zeros_like(live),
        )
        return new_state, tr

    final_state, traj = jax.lax.scan(step_fn, state, (step_keys, step_idx),
                                     length=T)
    traj = traj._replace(success=final_state.success)
    return final_state, traj


def collect_mcts_packed(core, policy_apply, params, key, T: int, B: int,
                        difficulty, num_sims: int, c_puct: float,
                        pool_slots: int = 8, deterministic: bool = False,
                        temperature: float = 1.0, temperature_drop: int = 0,
                        noise_eps: float = 0.0, dirichlet_alpha: float = 0.3,
                        max_expand_depth: int = 1, mesh=None,
                        diff_replay: int = 0):
    """Episode-packed MCTS self-play: lanes that finish are immediately
    refilled from a pool of pregenerated reset batches, so every scan step
    runs a useful MCTS decision (aligned collect_mcts freezes finished lanes
    for the remaining horizon — the same ~2x waste rl/rollout.collect_packed
    documents and fixes for PPO, but each wasted step here costs a full
    num_sims-simulation search). Pool-slot/rotation randomization follows
    collect_packed. Returns (final_state, AZTrajectory, stats) with
    episode counters and last_value for value-target bootstrapping.
    CAVEAT: the returned traj.success describes whichever pooled episode
    occupies each lane at the horizon — use the stats counters for success
    rates under packing."""
    from .rollout import make_packed_pool, packed_refill

    k_pool, k_roll, k_slot, k_rot = jax.random.split(key, 4)
    pool, state0 = make_packed_pool(core, k_pool, B, pool_slots, difficulty,
                                    mesh, diff_replay=diff_replay)

    step_keys = jax.random.split(k_roll, 3 * T).reshape(T, 3)
    step_idx = jnp.arange(T, dtype=jnp.int32)
    slots = jax.random.randint(k_slot, (T,), 0, pool_slots)
    rots = jax.random.randint(k_rot, (T,), 0, B)

    def step_fn(carry, xs):
        env_state, n_done, n_succ, moves = carry
        keys_t, t, slot_t, rot_t = xs
        # temperature_drop counts PER-EPISODE moves; under packing the scan
        # index is meaningless for refilled episodes, so a per-lane move
        # counter (reset on refresh) gates the schedule instead
        obs, probs, action, actual, live, inverted, stepped = _mcts_act(
            core, policy_apply, params, env_state, keys_t, moves, T,
            num_sims, c_puct, deterministic, temperature, temperature_drop,
            noise_eps, dirichlet_alpha, max_expand_depth)
        done = live & core.is_final(stepped)
        n_done = n_done + done.astype(jnp.int32)
        n_succ = n_succ + (done & stepped.success).astype(jnp.int32)

        refresh = done | ~live
        new_state = packed_refill(pool, stepped, refresh, slot_t, rot_t)
        reward = jnp.where(live, stepped.reward, 0.0)
        moves = jnp.where(refresh, 0, moves + 1)
        tr = AZTrajectory(
            obs=obs, visit_probs=probs, action=action, actual=actual,
            inverted=inverted, reward=reward, valid=live, done=done,
            success=jnp.zeros_like(live),
        )
        return (new_state, n_done, n_succ, moves), tr

    zeros = jnp.zeros(B, jnp.int32)
    (final_state, n_done, n_succ, _), traj = jax.lax.scan(
        step_fn, (state0, zeros, zeros, zeros),
        (step_keys, step_idx, slots, rots),
        length=T,
    )
    traj = traj._replace(success=final_state.success)
    _, last_value = policy_apply(params, core.dense(final_state))
    stats = {
        "episodes_completed": n_done,
        "episodes_succeeded": n_succ,
        "last_value": last_value,
    }
    return final_state, traj, stats


class AZ:
    def __init__(self, env, policy: PolicyBundle, config: AlphaZeroConfig,
                 params: Optional[dict] = None, seed: int = 0, mesh=None):
        self.env = env
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

    def _loss_flat(self, params, batch):
        """CE + MSE over a flat minibatch dict (masked by `valid`); same math
        as _loss, reshaped for the num_minibatches > 1 path."""
        logits, value = self.policy.apply(params, batch["obs"])
        valid = batch["valid"].astype(jnp.float32)
        count = jnp.maximum(valid.sum(), 1.0)
        logp = jax.nn.log_softmax(logits, axis=-1)
        pol_loss = -((batch["visit_probs"] * logp).sum(-1) * valid).sum() / count
        v_loss = (((value - batch["ret"]) ** 2) * valid).sum() / count
        loss = pol_loss + v_loss
        return loss, {"loss": loss, "pg_loss": pol_loss, "v_loss": v_loss}

    def _make_train_step(self, T: int, B: int):
        cfg = self.config

        def train_step(params, opt_state, key, difficulty):
            k_reset, k_roll = jax.random.split(key)
            if self.mesh is not None:
                from qiskit_gym_tpu.parallel import shard_params

                params = shard_params(self.mesh, params)
            if cfg.episode_packing:
                final_state, traj, stats = collect_mcts_packed(
                    self.core, self.policy.apply, params, k_roll, T, B,
                    difficulty, num_sims=cfg.num_mcts_searches, c_puct=cfg.C,
                    pool_slots=cfg.pack_pool_slots,
                    temperature=cfg.temperature,
                    temperature_drop=cfg.temperature_drop,
                    noise_eps=cfg.root_noise_eps,
                    dirichlet_alpha=cfg.dirichlet_alpha,
                    max_expand_depth=cfg.max_expand_depth, mesh=self.mesh,
                    diff_replay=cfg.diff_replay,
                )
            else:
                from .rollout import sample_difficulties

                k_diff, k_reset = jax.random.split(k_reset)
                d_lanes = sample_difficulties(k_diff, B, difficulty,
                                              cfg.diff_replay)
                state = self.core.reset(k_reset, B, d_lanes)
                if self.mesh is not None:
                    from qiskit_gym_tpu.parallel import shard_env_state

                    state = shard_env_state(self.mesh, state)
                final_state, traj = collect_mcts(
                    self.core, self.policy.apply, params, state, k_roll, T,
                    num_sims=cfg.num_mcts_searches, c_puct=cfg.C,
                    temperature=cfg.temperature,
                    temperature_drop=cfg.temperature_drop,
                    noise_eps=cfg.root_noise_eps,
                    dirichlet_alpha=cfg.dirichlet_alpha,
                    max_expand_depth=cfg.max_expand_depth,
                )
                stats = None

            # undiscounted reward-to-go as the value target; episode-boundary
            # aware (packed rollouts interleave episodes in a lane) and
            # bootstrapped with the critic at a mid-episode truncation
            def back(g, xs):
                r, done, valid = xs
                g = r + g * (1.0 - done)
                return jnp.where(valid, g, 0.0), jnp.where(valid, g, 0.0)

            g0 = (stats["last_value"] if stats is not None
                  else jnp.zeros_like(traj.reward[0]))
            _, returns = jax.lax.scan(
                back, g0,
                (traj.reward, traj.done.astype(jnp.float32), traj.valid),
                reverse=True,
            )

            if cfg.num_minibatches > 1:
                N = T * B
                nmb = min(cfg.num_minibatches, N)
                mb = N // nmb
                flat = {
                    "obs": traj.obs.reshape((N,) + traj.obs.shape[2:]),
                    "visit_probs": traj.visit_probs.reshape(
                        (N,) + traj.visit_probs.shape[2:]),
                    "valid": traj.valid.reshape(N),
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
                    )(params, traj, returns)
                    updates, opt_state = self.tx.update(grads, opt_state,
                                                        params)
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
            else:
                metrics["success_rate"] = final_state.success.mean()
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

        from qiskit_gym_tpu.utils.logging import write_learn_end_note

        write_learn_end_note(self.tb_writer, self.iteration, difficulty,
                             self.best_difficulty, metrics,
                             self.best_params is not None,
                             run_path=self.run_path)

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
    from .solve import best_lane, cached_solve_jit, round_up_lanes

    core = env.core
    if mesh is not None:
        num_searches = round_up_lanes(num_searches, mesh)
    state = env.make_solve_state(state_encoded, num_searches)
    if key is None:
        key = jax.random.key(np.random.randint(0, 2**31 - 1))
    if mesh is not None:
        from qiskit_gym_tpu.parallel import shard_env_state, shard_params

        state = shard_env_state(mesh, state)
        params = shard_params(mesh, params)

    T = core.max_depth
    # Bound the work per device dispatch. At reference-scale settings
    # (num_mcts_searches=1000 over a 128-step horizon) a single program
    # runs for minutes and TPU-relay watchdogs kill the worker (measured:
    # 100 lanes x 256 sims x 32 moves ~ 47 s survives, 512 sims crashes).
    # Chunk the move scan on host: same semantics (move index only gates
    # the self-play temperature schedule, unused here), one compile,
    # early-exit once every lane is final.
    # QGT_SOLVE_CHUNK_SIMS tunes the bound without code edits (relay
    # watchdog thresholds vary across chips/containers; 1000-sim dispatches
    # at 4 moves crashed a worker where 1-move dispatches ran fine, so the
    # default keeps 1000-sim solves at 2 moves/dispatch)
    chunk_move_sims = int(os.environ.get("QGT_SOLVE_CHUNK_SIMS", "2048"))
    t_chunk = min(T, max(1, chunk_move_sims // max(num_mcts_searches, 1)))
    # temperature-ladder portfolio across lanes (rl/rollout
    # .solve_temperatures): lane 0 plays argmax visits, half ramp, half
    # classic sampling; best_lane keeps the shortest successful solution
    from .rollout import solve_temperatures

    lane_temp = None if deterministic else solve_temperatures(num_searches)
    chunk_fn = cached_solve_jit(
        core, policy,
        ("mcts", t_chunk, num_mcts_searches, C, deterministic,
         max_expand_depth, lane_temp is not None),
        lambda: lambda p, s, k, lt: collect_mcts(
            core, policy.apply, p, s, k, t_chunk,
            num_sims=num_mcts_searches, c_puct=C, deterministic=deterministic,
            max_expand_depth=max_expand_depth,
            # the tree-depth cap must come from the FULL horizon, not the
            # chunk length, or a 4-move chunk runs 4-deep searches
            search_depth=min(T, 32),
            lane_temp=lt,
        ))
    trajs = []
    final_state = state
    for _ in range(-(-T // t_chunk)):
        key, sub = jax.random.split(key)
        final_state, tr = chunk_fn(params, final_state, sub, lane_temp)
        # reconstruction needs only these [t_chunk, B] fields — pulling the
        # full trajectory (obs + visit_probs) would move tens of MB per
        # synth() call over a TPU relay for the 27q artifacts
        trajs.append(SimpleNamespace(actual=np.asarray(tr.actual),
                                     valid=np.asarray(tr.valid),
                                     inverted=np.asarray(tr.inverted)))
        if bool(np.asarray(core.is_final(final_state)).all()):
            break
    traj = (trajs[0] if len(trajs) == 1 else SimpleNamespace(
        actual=np.concatenate([t.actual for t in trajs], axis=0),
        valid=np.concatenate([t.valid for t in trajs], axis=0),
        inverted=np.concatenate([t.inverted for t in trajs], axis=0)))

    best = best_lane(final_state, traj)
    if best is None:
        return None
    valid = traj.valid[:, best]
    actions = traj.actual[:, best][valid]
    inverted = traj.inverted[:, best][valid]
    return env.solution_from_trace(state_encoded, actions.tolist(),
                                   inverted.tolist())
