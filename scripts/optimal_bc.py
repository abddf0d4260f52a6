#!/usr/bin/env python
"""Optimal-demo BC for the head-to-head configs: beat the reference weights.

The three configs the reference ships trained artifacts for
(/root/reference/examples/models/*) have fully enumerable phase-less state
groups: perm_grid_3x3 is S_9 (9! = 362,880), lf_5_line generates
GL(5,2) (9,999,360), clifford_3q_custom generates a subgroup of Sp(6,2)
(<= 1,451,520). Every generator is an involution in these representations
(CX/SWAP over GF(2); phase-less S^2 = SX^2 = H^2 = I), so one vectorized
BFS from the identity over packed-int states yields the EXACT
distance-to-identity table for the artifact's own gateset.

From that table we sample uniformly over each distance shell and record
greedy-optimal trajectories (every step provably decreases the distance by
1, random tie-breaking over co-optimal actions), then behavior-clone the
shipped policy on them with the shared AZ loss (rl/demos.fit_demos — the
same machinery the Pauli BC amplifier uses). Shipping is gated on the
head-to-head protocol itself (seeds disjoint from the published table),
exactly like scripts/finetune_brevity.py: only a snapshot that is
strictly better (same-or-higher solve, lower mean 2q) overwrites the
artifact.

BFS transitions are validated against the spec twin on random replays
before anything trains.

Usage: python scripts/optimal_bc.py <stem> [minutes]
stem in {perm_grid_3x3, lf_5_line, clifford_3q_custom}
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import bench_vs_reference as bvr
from qiskit_gym_tpu.rl import (AlphaZeroConfig, BasicPolicyConfig,
                               RLSynthesis, fit_demos)
from qiskit_gym_tpu.rl.demos import prepare_demos
from qiskit_gym_tpu.utils.serialization import load_params

MODELS = os.path.join(os.path.dirname(__file__), "..", "examples", "models")

CHECKERS = {
    "lf_5_line": ("_lf_ck", [4, 8, 16]),
    "clifford_3q_custom": ("_cliff_ck", [4, 8, 16]),
    "perm_grid_3x3": ("_perm_ck", [4, 8, 16]),
}

U64 = np.uint64


def _row_ops(dim):
    """Packed-int row primitives: bit (dim*r + c) of the key = mat[r, c]."""
    mask = U64((1 << dim) - 1)

    def get_row(k, r):
        return (k >> U64(dim * r)) & mask

    def xor_row(k, src, dst):          # row dst ^= row src
        return k ^ (get_row(k, src) << U64(dim * dst))

    def swap_rows(k, r1, r2):
        x = get_row(k, r1) ^ get_row(k, r2)
        return k ^ (x << U64(dim * r1)) ^ (x << U64(dim * r2))

    return get_row, xor_row, swap_rows


def matrix_actions(gateset, num_qubits, kind):
    """One key->key callable per gateset action (spec-twin row semantics:
    spec/linear_function.py, spec/clifford.py)."""
    n = num_qubits
    dim = 2 * n if kind == "clifford" else n
    _, xor_row, swap_rows = _row_ops(dim)
    fns = []
    for name, qs in gateset:
        if kind == "linear":
            if name == "CX":
                q1, q2 = qs
                fns.append(lambda k, a=q1, b=q2: xor_row(k, a, b))
            elif name == "SWAP":
                q1, q2 = qs
                fns.append(lambda k, a=q1, b=q2: swap_rows(k, a, b))
            else:                      # 1q gates are no-ops on GF(2) mats
                fns.append(lambda k: k)
        else:
            if name == "H":
                (q,) = qs
                fns.append(lambda k, a=q: swap_rows(k, a, n + a))
            elif name in ("S", "Sdg"):
                (q,) = qs
                fns.append(lambda k, a=q: xor_row(k, a, n + a))
            elif name in ("SX", "SXdg"):
                (q,) = qs
                fns.append(lambda k, a=q: xor_row(k, n + a, a))
            elif name == "CX":
                c, t = qs
                fns.append(lambda k, a=c, b=t:
                           xor_row(xor_row(k, a, b), n + b, n + a))
            elif name == "CZ":
                a_, b_ = qs
                fns.append(lambda k, a=a_, b=b_:
                           xor_row(xor_row(k, b, n + a), a, n + b))
            elif name == "SWAP":
                a_, b_ = qs
                fns.append(lambda k, a=a_, b=b_:
                           swap_rows(swap_rows(k, a, b), n + a, n + b))
            else:
                raise ValueError(name)
    return fns, dim


def perm_actions(gateset, n):
    """Packed base-n keys for permutation states (spec/permutation.py)."""
    pows = (n ** np.arange(n)).astype(np.uint64)

    def unpack(keys):
        out = np.empty((len(keys), n), np.int64)
        k = keys.astype(np.uint64).copy()
        for i in range(n):
            out[:, i] = (k % U64(n)).astype(np.int64)
            k //= U64(n)
        return out

    def pack(states):
        return (states.astype(np.uint64) * pows[None, :]).sum(axis=1)

    fns = []
    for name, (q1, q2) in gateset:
        assert name == "SWAP"

        def f(k, a=q1, b=q2):
            s = unpack(np.atleast_1d(k))
            s[:, [a, b]] = s[:, [b, a]]
            return pack(s)

        fns.append(f)
    return fns, unpack, pack


def bfs(fns, ident_key, log):
    """Vectorized BFS from the identity; returns (shells, sorted keys,
    parallel dist array). Valid because every generator is an involution
    (the Cayley graph is undirected), asserted by the spec replay check."""
    shells = [np.array([ident_key], np.uint64)]
    visited = shells[0].copy()
    while True:
        frontier = shells[-1]
        cands = np.unique(np.concatenate([f(frontier) for f in fns]))
        pos = np.searchsorted(visited, cands).clip(0, len(visited) - 1)
        new = cands[visited[pos] != cands]
        if not len(new):
            break
        shells.append(new)
        visited = np.union1d(visited, new)
        log(f"  shell {len(shells) - 1}: {len(new)} states "
            f"({len(visited)} total)")
    dist = np.empty(len(visited), np.uint8)
    for d, sh in enumerate(shells):
        dist[np.searchsorted(visited, sh)] = d
    return shells, visited, dist


def bfs_2q(fns, costs, ident_key, log=lambda m: None):
    """0/1-cost Dial BFS: 1q gates cost 0 2q gates, CX/SWAP cost 1
    (matching bench_vs_reference._count_2q, which counts any 2q gate as
    one). Standard 0-1 BFS: each cost level is closed under 0-cost edges
    before the next 1-cost expansion, so first-reach = exact minimal 2q
    count. Returns (sorted keys, dist2q)."""
    zero = [f for f, c in zip(fns, costs) if c == 0]
    one = [f for f, c in zip(fns, costs) if c > 0]
    assert all(c in (0, 1) for c in costs)

    def expand_new(frontier, visited, fns_):
        if not len(frontier) or not fns_:
            return np.array([], np.uint64), visited
        cand = np.unique(np.concatenate([f(frontier) for f in fns_]))
        pos = np.searchsorted(visited, cand).clip(0, len(visited) - 1)
        new = cand[visited[pos] != cand]
        return new, np.union1d(visited, new)

    def close_zero(level, visited):
        frontier = level
        while True:
            frontier, visited = expand_new(frontier, visited, zero)
            if not len(frontier):
                return level, visited
            level = np.concatenate([level, frontier])

    visited = np.array([ident_key], np.uint64)
    level, visited = close_zero(visited.copy(), visited)
    levels = [level]
    while True:
        seed, visited = expand_new(levels[-1], visited, one)
        if not len(seed):
            break
        level, visited = close_zero(seed, visited)
        levels.append(level)
        log(f"  2q-level {len(levels) - 1}: {len(level)} states "
            f"({len(visited)} total)")
    dist2q = np.empty(len(visited), np.uint8)
    for d, lvl in enumerate(levels):
        dist2q[np.searchsorted(visited, np.unique(lvl))] = d
    return visited, dist2q


def steps_under_min2q(keys_sorted, dist2q, fns, costs, ident_key):
    """Minimum ACTION count among minimal-2q paths to the identity, per
    state. Needed for terminating greedy descent when 1q actions cost 0:
    processed level by level (a min-2q path from 2q-level L uses only
    level-L states via 0-cost edges — involutions make those edges
    undirected, so a 0-edge can never change the level — plus exactly one
    1-cost edge down to L-1), with Bellman relaxation inside each level."""
    zero = [f for f, c in zip(fns, costs) if c == 0]
    one = [f for f, c in zip(fns, costs) if c > 0]
    INF = np.int32(1 << 30)
    steps = np.full(len(keys_sorted), INF, np.int32)

    def idx(keys):
        return np.searchsorted(keys_sorted, keys)

    steps[idx(np.array([ident_key], np.uint64))] = 0
    for L in range(int(dist2q.max()) + 1):
        lvl_keys = keys_sorted[dist2q == L]
        li = idx(lvl_keys)
        if L > 0:
            for f in one:
                ni = idx(f(lvl_keys))
                cand = np.where(dist2q[ni] == L - 1, steps[ni] + 1, INF)
                steps[li] = np.minimum(steps[li], cand)
        frontier = lvl_keys[steps[li] < INF]
        while len(frontier) and zero:
            improved = []
            for f in zero:
                nk = f(frontier)
                ni = idx(nk)
                cand = steps[idx(frontier)] + 1
                better = (dist2q[ni] == L) & (cand < steps[ni])
                if better.any():
                    np.minimum.at(steps, ni[better], cand[better])
                    improved.append(nk[better])
            frontier = (np.unique(np.concatenate(improved)) if improved
                        else np.array([], np.uint64))
    assert steps.max() < INF, "some state never relaxed"
    return steps


def build_family(stem, env):
    """(action fns, ident key, encode(env_state)->key, 2q costs)."""
    n = env.config["num_qubits"]
    gateset = env.gateset
    kind = {"perm_grid_3x3": "perm", "lf_5_line": "linear",
            "clifford_3q_custom": "clifford"}[stem]
    costs = [0 if len(g[1]) == 1 else 1 for g in gateset]
    if kind == "perm":
        fns, unpack, pack = perm_actions(gateset, n)
        ident = pack(np.arange(n, dtype=np.int64)[None])[0]

        def encode(state):
            return pack(np.asarray(state, np.int64).reshape(1, n))[0]
    else:
        fns, dim = matrix_actions(gateset, n, kind)
        ident = U64(0)
        for r in range(dim):
            ident |= U64(1) << U64(dim * r + r)

        def encode(state):
            m = (np.asarray(state).reshape(-1) > 0).astype(np.uint64)
            return U64((m << np.arange(dim * dim, dtype=np.uint64)).sum())
    return fns, ident, encode, costs


def exact_min_2q_table(stem, env):
    """Exact minimal-2q lookup for env-encoded target states: plain BFS
    when every action costs one 2q gate, Dial's 0/1 BFS otherwise."""
    fns, ident, encode, costs = build_family(stem, env)
    if all(c == 1 for c in costs):
        _, keys_sorted, dist = bfs(fns, ident, lambda m: None)
    else:
        keys_sorted, dist = bfs_2q(fns, costs, ident)

    def min_2q(state):
        k = encode(state)
        return int(dist[np.searchsorted(keys_sorted, k)])

    return min_2q


def main():
    stem = sys.argv[1]
    budget_s = 60 * (float(sys.argv[2]) if len(sys.argv) > 2 else 45.0)
    lr = float(sys.argv[3]) if len(sys.argv) > 3 else 3e-4
    fit_epochs = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    check = getattr(bvr, CHECKERS[stem][0])
    depths = CHECKERS[stem][1]
    evidence = os.path.join(os.path.dirname(__file__), "..",
                            "runs-evidence", f"{stem}_optimal_bc_r5.jsonl")

    def log_row(row):
        row = {"t": round(time.time(), 1), **row}
        with open(evidence, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)

    def log(msg):
        print(msg, flush=True)

    out_json = os.path.join(MODELS, f"{stem}.json")
    out_pt = os.path.join(MODELS, f"{stem}.pt")
    rls = RLSynthesis.from_config_json(out_json, out_pt)
    env = rls.env
    spec = env.spec
    n = env.config["num_qubits"]
    gateset = env.gateset
    w = spec.metrics_weights
    assert w.n_layers == 0.0 and w.n_layers_cnots == 0.0, \
        "vectorized rewards assume the default (layer-free) weights"

    # ---------------------------------------------------- per-family packing
    kind = {"perm_grid_3x3": "perm", "lf_5_line": "linear",
            "clifford_3q_custom": "clifford"}[stem]
    if kind == "perm":
        fns, unpack, pack = perm_actions(gateset, n)
        ident_key = pack(np.arange(n, dtype=np.int64)[None])[0]

        def obs_bits(keys):
            s = unpack(keys)
            out = np.zeros((len(keys), n, n), np.uint8)
            out[np.arange(len(keys))[:, None],
                np.arange(n)[None, :], s] = 1
            return out.reshape(len(keys), -1)

        def key_of_spec():
            return pack(spec.get_state()[None])[0]
    else:
        fns, dim = matrix_actions(gateset, n, kind)
        ident_key = U64(0)
        for r in range(dim):
            ident_key |= U64(1) << U64(dim * r + r)

        def obs_bits(keys):
            b = np.arange(dim * dim, dtype=np.uint64)
            return ((keys[:, None] >> b[None, :]) & U64(1)).astype(np.uint8)

        def key_of_spec():
            m = spec.get_state().astype(np.uint64).reshape(-1)
            return U64((m << np.arange(dim * dim, dtype=np.uint64)).sum())

    # ------------------------------------------------------------------ BFS
    # plain BFS when every action costs one 2q gate; 0-1 Dial BFS plus the
    # min-steps pass when 1q gates are free (clifford), so the greedy
    # descent minimizes 2q gates first and action count second
    costs = [0 if len(g[1]) == 1 else 1 for g in gateset]
    t0 = time.time()
    if all(c == 1 for c in costs):
        _, keys_sorted, dist2q = bfs(fns, ident_key, log)
        steps_arr = dist2q.astype(np.int32)
    else:
        keys_sorted, dist2q = bfs_2q(fns, costs, ident_key, log)
        steps_arr = steps_under_min2q(keys_sorted, dist2q, fns, costs,
                                      ident_key)
    # shells by minimal ACTION count: every lane started in shell m ends
    # on the identity after exactly m lex-optimal moves
    diameter = int(steps_arr.max())
    shells = [keys_sorted[steps_arr == m] for m in range(diameter + 1)]
    total = len(keys_sorted)
    log_row({"phase": "bfs", "states": int(total), "diameter": int(diameter),
             "max_2q": int(dist2q.max()),
             "seconds": round(time.time() - t0, 1)})

    # ------------------------- validate packed transitions vs the spec twin
    rng = np.random.default_rng(20260821)
    for _ in range(60):
        d = int(rng.integers(1, diameter + 1))
        while not len(shells[d]):
            d = int(rng.integers(1, diameter + 1))
        key = np.array([rng.choice(shells[d])], np.uint64)
        flat = obs_bits(key)[0]
        if kind == "perm":
            spec.set_state(unpack(key)[0].tolist())
        else:
            spec.set_state(flat.tolist())
        a = int(rng.integers(len(fns)))
        spec.step(a, invert=False)
        assert key_of_spec() == fns[a](key)[0], \
            f"packed transition mismatch at action {a}"
    log("spec replay validation OK")

    # ------------------------------------------------- optimal demo corpus
    # uniform over distance shells; every step provably reduces dist by 1
    per_shell = max(400, min(4000, 120000 // max(diameter, 1)))
    A = len(fns)
    d_cnots = np.array([{"CX": 1, "SWAP": 3}.get(g[0], 0)
                        for g in gateset], np.float32)
    d_gates = np.array([3 if g[0] in ("SWAP", "CZ") else 1
                        for g in gateset], np.float32)
    pen = w.n_cnots * d_cnots + w.n_gates * d_gates

    obs_rows, act_rows, ret_rows = [], [], []
    episodes = 0
    t0 = time.time()
    carr = np.array(costs, np.int32)[:, None]
    for d in range(1, diameter + 1):
        if not len(shells[d]):
            continue
        sel = rng.choice(shells[d], size=min(per_shell, len(shells[d])),
                         replace=len(shells[d]) < per_shell)
        states = sel.astype(np.uint64)
        N = len(states)
        ep_obs, ep_act = [], []
        for t in range(d):
            neigh = np.stack([f(states) for f in fns])          # [A, N]
            pos = np.searchsorted(keys_sorted, neigh.reshape(-1))
            nd2 = dist2q[pos].reshape(A, N).astype(np.int32)
            nst = steps_arr[pos].reshape(A, N)
            cpos = np.searchsorted(keys_sorted, states)
            cur2 = dist2q[cpos].astype(np.int32)
            curst = steps_arr[cpos]
            # lex-optimal moves: spend the action's 2q cost exactly, and
            # land on a state one optimal action closer
            valid = (carr + nd2 == cur2[None, :]) & \
                (nst == (curst - 1)[None, :])
            assert valid.any(axis=0).all()
            tie = valid * (rng.random((A, N)) + 0.5)
            act = tie.argmax(axis=0)
            ep_obs.append(obs_bits(states))
            ep_act.append(act)
            states = neigh[act, np.arange(N)]
        assert (states == ident_key).all()
        # returns-to-go: success reward 1.0 at the last step, penalties on
        # every step (default weights: cnot/gate counters only)
        rew = np.stack([-pen[a] for a in ep_act])               # [d, N]
        rew[-1] += 1.0
        ret = np.cumsum(rew[::-1], axis=0)[::-1]                # [d, N]
        for t in range(d):
            obs_rows.append(np.packbits(ep_obs[t], axis=1))
            act_rows.append(ep_act[t])
            ret_rows.append(ret[t])
        episodes += N
    demos = {
        "obs_packed": np.concatenate(obs_rows),
        "obs_bits": int(np.prod(spec.obs_shape())),
        "action": np.concatenate(act_rows).astype(np.int32),
        "ret": np.concatenate(ret_rows).astype(np.float32),
        "episodes": episodes,
        "attempts": episodes,
    }
    log_row({"phase": "corpus", "episodes": episodes,
             "steps": int(demos["action"].shape[0]),
             "per_shell": per_shell,
             "gen_seconds": round(time.time() - t0, 1)})

    # --------------------------------------------------------- score + fit
    def score(num_targets=48):
        ref_gs = rls.env.gateset
        solves, twoqs = [], []
        for depth in depths:
            trng = np.random.default_rng(777 + depth)
            ok, cx = 0, []
            for _ in range(num_targets):
                target = bvr._random_target(ref_gs, n, depth, trng)
                out = rls.synth(target, num_searches=100)
                if out is None or not check(out, target):
                    continue
                ok += 1
                cx.append(bvr._count_2q(out))
            solves.append(ok / num_targets)
            twoqs.append(float(np.mean(cx)) if cx else float("inf"))
        return min(solves), float(np.mean(twoqs))

    # AZ-loss wrapper over the shipped PPO policy (the
    # finetune_clifford_27q_demos.py pattern)
    policy_cfg = BasicPolicyConfig.from_json(
        json.load(open(out_json))["policy"])
    bc = RLSynthesis(env, AlphaZeroConfig(num_episodes=8,
                                          num_mcts_searches=4, lr=lr),
                     policy_cfg, seed=7)
    algo = bc.algorithm
    algo.params = load_params(out_pt)
    demos = prepare_demos(algo, demos)

    base_solve, base_2q = score()
    best = (base_solve, base_2q)
    best_params = algo.params
    log_row({"phase": "baseline", "solve": base_solve,
             "mean_2q": round(base_2q, 3)})

    t0 = time.time()
    burst = 0
    while time.time() - t0 < budget_s:
        m = fit_demos(algo, demos, epochs=fit_epochs, num_minibatches=64)
        rls.algorithm.params = algo.params   # score through the PPO artifact
        s, q = score()
        burst += 1
        keep = s >= best[0] and q < best[1]
        if keep:
            best = (s, q)
            best_params = algo.params
        log_row({"phase": "burst", "burst": burst,
                 "bc_loss": round(float(m["loss"]), 4), "solve": s,
                 "mean_2q": round(q, 3), "kept": keep,
                 "minutes": round((time.time() - t0) / 60, 1)})

    if best[1] < base_2q and best[0] >= base_solve:
        rls.algorithm.params = best_params
        rls.algorithm.best_params = best_params
        prior = rls.trained_with
        rls.trained_with = (
            f"{stem}: round-5 optimal-demo BC (scripts/optimal_bc.py — "
            f"exact BFS distance table over all {total} reachable states, "
            f"diameter {diameter}; cloned on uniformly-sampled optimal "
            f"trajectories). Head-to-head protocol mean 2q {base_2q:.2f} -> "
            f"{best[1]:.2f} at solve {best[0]:.2f} (evidence: runs-evidence/"
            f"{stem}_optimal_bc_r5.jsonl). Prior provenance: "
            + (prior or "none recorded"))
        rls.save(out_json, out_pt, best=True)
        log_row({"phase": "final", "shipped": True, "solve": best[0],
                 "mean_2q": round(best[1], 3)})
    else:
        log_row({"phase": "final", "shipped": False,
                 "note": "no snapshot beat the shipped weights"})
    os._exit(0)


if __name__ == "__main__":
    main()
