"""On-device batched rollout collection + GAE.

Episodes are depth-budget aligned (every lane resets to the same difficulty,
so the whole batch shares one episode horizon T = min(depth_slope * difficulty,
max_depth)); the collection is a single lax.scan of T fused
observe->policy->sample->step steps over B device-resident envs — zero host
round-trips. Lanes that finish early are frozen (transitions masked out of
the loss). This replaces the reference's 32-thread CPU collectors
(rayon; reference configs.py:134 num_cores) with vmapped device parallelism.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Trajectory(NamedTuple):
    obs: jnp.ndarray        # [T, B, *obs_shape]
    action: jnp.ndarray     # [T, B] int32 (policy action space)
    actual: jnp.ndarray     # [T, B] int32 env-frame action (after symmetry
    #                         un-permutation; == action for most envs)
    logp: jnp.ndarray       # [T, B]
    value: jnp.ndarray      # [T, B]
    reward: jnp.ndarray     # [T, B]
    valid: jnp.ndarray      # [T, B] bool: lane was live when this step ran
    done: jnp.ndarray       # [T, B] bool: episode ended at/after this step
    inverted: jnp.ndarray   # [T, B] bool: env inversion flag when acting
    success: jnp.ndarray    # [B]  episode success per lane


def solve_temperatures(num_searches: int):
    """Best-of-N portfolio temperature ladder for the solve paths.

    Lane 0 runs greedy (temperature 0 == argmax — the exploitation lane:
    measured MCTS-argmax solutions are several times shorter than
    visit-sampled ones on the deep-trained Pauli artifacts, docs/QUALITY.md),
    the first half ramps linearly up to 1.0, and the rest stay at the
    classic temperature-1.0 sampling that wins on hard targets where greedy
    gets stuck. solve() picks the fewest-2q successful lane, so the ladder
    strictly widens the portfolio: short greedy solutions when greedy
    succeeds, full exploration diversity when it doesn't.

    Sampling at temperature t is implemented as Gumbel-max with scaled
    noise — argmax(logits + t*g) draws exactly from softmax(logits / t),
    and t == 0 degenerates to argmax with no special-casing.

    Returns None for num_searches < 2 (a single sampled lane keeps the
    reference's plain temperature-1.0 semantics).
    """
    if num_searches < 2:
        return None
    ramp = jnp.arange(num_searches, dtype=jnp.float32)
    return jnp.minimum(ramp / max(num_searches // 2, 1), 1.0)


def sample_action(key, logits, masks, deterministic: bool):
    """Masked categorical sample / argmax. masks bool [B, A]."""
    neg = jnp.finfo(logits.dtype).min
    masked = jnp.where(masks, logits, neg)
    if deterministic:
        return jnp.argmax(masked, axis=-1)
    return jax.random.categorical(key, masked, axis=-1)


def _pregen_randomness(core, key, T: int, B: int, deterministic: bool):
    """Bulk PRNG draws for a T-step rollout (per-step threefry key chains
    are serial and cost as much as the env step itself on TPU, measured)."""
    A = core.num_actions
    k_g, k_f, k_s = jax.random.split(key, 3)
    gumbel = (jnp.zeros((T, B, A)) if deterministic
              else jax.random.gumbel(k_g, (T, B, A)))
    if getattr(core, "add_inverts", False):
        flips = jax.random.bernoulli(k_f, 0.5, (T, B))
    else:
        flips = jnp.zeros((T, B), bool)
    return gumbel, flips, jax.random.split(k_s, T)


def _sample_and_step(core, policy_apply, params, env_state, g_t, flip_t,
                     key_t):
    """Shared per-step prologue for both collectors: observe -> policy ->
    Gumbel-max masked sample -> env step. Returns everything a Trajectory
    row needs plus the raw stepped state."""
    obs = core.dense(env_state)  # uint8 — 4x cheaper to store than f32
    logits, value = policy_apply(params, obs)
    masks = core.masks(env_state)
    neg = jnp.finfo(logits.dtype).min
    masked = jnp.where(masks, logits, neg)
    action = jnp.argmax(masked + g_t, axis=-1)
    logp_all = jax.nn.log_softmax(masked, axis=-1)
    logp = jnp.take_along_axis(logp_all, action[:, None], axis=-1)[:, 0]

    live = ~core.is_final(env_state)
    inverted = env_state.inverted
    actual = (core.translate_action(env_state, action)
              if hasattr(core, "translate_action") else action)
    stepped = core.step(env_state, action, key_t,
                        invert_override=flip_t
                        if getattr(core, "add_inverts", False) else None,
                        actual_override=actual)
    return obs, action, actual, logp, value, live, inverted, stepped


def collect(core, policy_apply, params, state, key, T: int,
            deterministic: bool = False, lane_temp=None):
    """Roll out T steps from `state` (already reset). Returns (final_state,
    Trajectory). Lanes that finish are frozen (their rows masked invalid).
    `lane_temp` [B] sets a per-lane sampling temperature (0 = argmax; see
    solve_temperatures) — ignored when deterministic."""
    B = state.depth.shape[0]
    gumbel, flips, step_keys = _pregen_randomness(core, key, T, B,
                                                  deterministic)
    if lane_temp is not None and not deterministic:
        # argmax(logits + t*g) samples softmax(logits/t); t==0 is argmax
        gumbel = gumbel * lane_temp[None, :, None]

    def step_fn(env_state, xs):
        g_t, flip_t, key_t = xs
        obs, action, actual, logp, value, live, inverted, stepped = (
            _sample_and_step(core, policy_apply, params, env_state, g_t,
                             flip_t, key_t))
        new_state = jax.tree.map(
            lambda new, old: jnp.where(
                live.reshape(live.shape + (1,) * (new.ndim - 1)), new, old
            ),
            stepped, env_state,
        )
        reward = jnp.where(live, new_state.reward, 0.0)
        done = core.is_final(new_state)
        tr = Trajectory(
            obs=obs, action=action, actual=actual, logp=logp, value=value,
            reward=reward, valid=live, done=done, inverted=inverted,
            success=jnp.zeros_like(live),  # filled after scan
        )
        return new_state, tr

    final_state, traj = jax.lax.scan(
        step_fn, state, (gumbel, flips, step_keys), length=T
    )
    traj = traj._replace(success=final_state.success)
    return final_state, traj


def sample_difficulties(key, count, difficulty, diff_replay: int):
    """Per-lane curriculum-replay difficulties.

    With diff_replay == 0 the scalar passes through untouched (reference
    semantics: every lane collects at the frontier). Otherwise half the
    lanes stay at the frontier and the rest draw uniformly from
    [max(1, difficulty - diff_replay), difficulty]: at a low-success
    frontier most episodes carry no reward signal and the entropy bonus
    erodes the policy faster than the rare successes reinforce it
    (docs/TRAINING.md 'entropy-collapse wall') — replaying the
    recently-mastered difficulties keeps dense learning signal in every
    batch while the frontier half keeps probing. The env cores accept a
    per-lane difficulty vector (their scramble masks broadcast), and each
    lane's episode budget follows its own difficulty."""
    if diff_replay <= 0:
        return difficulty
    d = jnp.asarray(difficulty, jnp.int32)
    lo = jnp.maximum(d - int(diff_replay), 1)
    off = jax.random.randint(key, (count,), 0, int(diff_replay) + 1)
    mix = jnp.maximum(d - off, lo)
    # interleaved split (even lanes frontier) so any contiguous sub-batch —
    # e.g. each slot of the packed pool after its [slots, B] reshape — keeps
    # the same frontier/replay ratio
    keep = (jnp.arange(count) % 2) == 0
    return jnp.where(keep, d, mix)


def make_packed_pool(core, key, B, pool_slots, difficulty, mesh=None,
                     diff_replay: int = 0):
    """Pregenerate `pool_slots` reset batches for packed collection:
    [slots, B, ...] pytree (lanes sharded over 'dp' when a mesh is given)
    plus the slot-0 batch as the initial live state. Shared by the PPO and
    AZ packed collectors — the refill semantics must stay in lockstep."""
    k_diff, key = jax.random.split(key)
    difficulty = sample_difficulties(
        k_diff, B * pool_slots, difficulty, diff_replay)
    pool = core.reset(key, B * pool_slots, difficulty)
    pool = jax.tree.map(
        lambda x: x.reshape((pool_slots, B) + x.shape[1:]), pool
    )
    if mesh is not None:
        # keep pool slots replicated-by-slot but env lanes sharded over dp
        # (axis 1 here), matching the live state's sharding
        from qiskit_gym_tpu.parallel import shard_env_state

        pool = shard_env_state(mesh, pool, batch_axis=1)
    return pool, jax.tree.map(lambda x: x[0], pool)


def packed_refill(pool, stepped, refresh, slot_t, rot_t):
    """Refill `refresh` lanes of `stepped` from random pool slot `slot_t`
    with lane rotation `rot_t` (see collect_packed's docstring for why both
    draws must be random)."""
    fresh = jax.tree.map(
        lambda p: jnp.roll(
            jax.lax.dynamic_index_in_dim(p, slot_t, 0, keepdims=False),
            rot_t, axis=0,
        ),
        pool,
    )
    return jax.tree.map(
        lambda fr, st: jnp.where(
            refresh.reshape(refresh.shape + (1,) * (st.ndim - 1)), fr, st
        ),
        fresh, stepped,
    )


def collect_packed(core, policy_apply, params, key, T: int, B: int,
                   difficulty, pool_slots: int = 8,
                   deterministic: bool = False, mesh=None,
                   diff_replay: int = 0):
    """Episode-packed rollout: lanes that finish are immediately refilled
    with a fresh reset, so every scan step does useful work (aligned
    `collect` freezes finished lanes — up to ~2x wasted steps at high
    difficulty).

    Fresh states come from a pool of `pool_slots` pregenerated reset batches
    (resetting inside the scan would re-run the scramble loop every step).
    Each step draws a RANDOM pool slot and a RANDOM lane rotation, so a
    refilled lane can receive any of the pool_slots * B pregenerated
    scrambles — a deterministic slot schedule would hand every failed
    episode (which always lasts exactly the depth budget) the same scramble
    over and over whenever the budget divides the schedule period.

    CAVEAT: the returned traj.success describes whichever pooled episode
    occupies each lane at the horizon — use the stats counters for success
    rates under packing.

    Returns (final_state, Trajectory, stats) where stats is a dict with
    episodes_completed / episodes_succeeded [B] counters and last_value [B]
    for GAE horizon bootstrapping (mid-episode truncation at the scan end is
    expected here, unlike the aligned collector where the horizon is the
    depth budget)."""
    k_pool, k_roll, k_slot, k_rot = jax.random.split(key, 4)
    pool, state0 = make_packed_pool(core, k_pool, B, pool_slots, difficulty,
                                    mesh, diff_replay=diff_replay)

    gumbel, flips, step_keys = _pregen_randomness(core, k_roll, T, B,
                                                  deterministic)
    slots = jax.random.randint(k_slot, (T,), 0, pool_slots)
    rots = jax.random.randint(k_rot, (T,), 0, B)

    def step_fn(carry, xs):
        env_state, n_done, n_succ = carry
        g_t, flip_t, key_t, slot_t, rot_t = xs
        obs, action, actual, logp, value, live, inverted, stepped = (
            _sample_and_step(core, policy_apply, params, env_state, g_t,
                             flip_t, key_t))
        done = live & core.is_final(stepped)
        n_done = n_done + done.astype(jnp.int32)
        n_succ = n_succ + (done & stepped.success).astype(jnp.int32)

        # refill finished lanes (and any dead lane, e.g. an instantly-solved
        # fresh reset) from a random pool slot with a random lane rotation
        refresh = done | ~live
        new_state = packed_refill(pool, stepped, refresh, slot_t, rot_t)
        reward = jnp.where(live, stepped.reward, 0.0)
        tr = Trajectory(
            obs=obs, action=action, actual=actual, logp=logp, value=value,
            reward=reward, valid=live, done=done, inverted=inverted,
            success=jnp.zeros_like(live),
        )
        return (new_state, n_done, n_succ), tr

    zeros = jnp.zeros(B, jnp.int32)
    (final_state, n_done, n_succ), traj = jax.lax.scan(
        step_fn, (state0, zeros, zeros),
        (gumbel, flips, step_keys, slots, rots),
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


def gae(traj: Trajectory, gamma: float, lam: float, last_value=None):
    """Generalized advantage estimation over the batch.

    Episodes are finite-horizon (the depth budget is part of the MDP — the
    reference treats budget exhaustion as terminal), so the value after a
    `done` step bootstraps to 0. The horizon end also bootstraps to 0 for
    the aligned collector (horizon == depth budget); packed collection
    truncates mid-episode and passes `last_value` to bootstrap instead.
    """
    T = traj.reward.shape[0]
    v_end = (jnp.zeros_like(traj.value[0]) if last_value is None
             else last_value)

    def back(carry, xs):
        adv_next, v_next = carry
        reward, value, done, valid = xs
        nonterm = (~done).astype(jnp.float32)
        delta = reward + gamma * v_next * nonterm - value
        adv = delta + gamma * lam * nonterm * adv_next
        adv = jnp.where(valid, adv, 0.0)
        return (adv, jnp.where(valid, value, 0.0)), adv

    (_, _), advs = jax.lax.scan(
        back,
        (jnp.zeros_like(traj.value[0]), v_end),
        (traj.reward, traj.value, traj.done, traj.valid),
        reverse=True,
    )
    returns = advs + jnp.where(traj.valid, traj.value, 0.0)
    return advs, returns
