"""Batched array-MCTS on device.

A fixed-size tree per env lane, fully vectorized over the batch: node pool of
num_sims + 1 nodes, per-edge PUCT statistics, selection as a masked fori_loop
over tree depth, one expansion per simulation, masked backward pass. The env
itself is the recurrent function — node states live in device memory and
expansion is one batched env step. Replaces the reference's per-thread
sequential MCTS in the twisterl collectors (SURVEY.md sections 2.3, 2.4).

Rewards are accumulated undiscounted along the path (the envs are
finite-horizon with terminal success bonuses), matching AZ's
value-of-state-under-perfect-play semantics.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Tree(NamedTuple):
    # per-node env state: pytree with arrays [B, N+1, ...]
    states: object
    terminal: jnp.ndarray      # bool [B, N+1] state is final
    expanded: jnp.ndarray      # bool [B, N+1]
    priors: jnp.ndarray        # f32 [B, N+1, A]
    value: jnp.ndarray         # f32 [B, N+1]  network value at the node
    children: jnp.ndarray      # int32 [B, N+1, A] node index or -1
    n: jnp.ndarray             # f32 [B, N+1, A] visit counts
    w: jnp.ndarray             # f32 [B, N+1, A] total action value
    r: jnp.ndarray             # f32 [B, N+1, A] immediate edge reward


def _tile_node_axis(state, N1: int):
    """env-state [B, ...] -> [B, N1, ...] (root in slot 0; rest reused)."""
    return jax.tree.map(
        lambda x: jnp.broadcast_to(
            x[:, None], (x.shape[0], N1) + x.shape[1:]
        ).copy() if hasattr(x, "shape") else x,
        state,
    )


def _gather_node(states, idx):
    """states [B, N1, ...], idx [B] -> env-state [B, ...]."""
    return jax.tree.map(
        lambda x: jnp.take_along_axis(
            x, idx.reshape(-1, *([1] * (x.ndim - 1))), axis=1
        )[:, 0],
        states,
    )


def _scatter_node(states, idx, new_state):
    """Write env-state [B, ...] into slot idx [B] of states [B, N1, ...]."""
    B = idx.shape[0]
    bidx = jnp.arange(B)
    return jax.tree.map(
        lambda pool, x: pool.at[bidx, idx].set(x), states, new_state
    )


def mcts_search(
    core,
    policy_apply,
    params,
    root_state,
    key,
    num_sims: int,
    c_puct: float,
    max_depth: int,
    dirichlet_alpha: float = 0.3,
    noise_eps: float = 0.0,
    max_expand_depth: int = 1,
):
    """Run num_sims batched simulations from root_state.

    `noise_eps > 0` mixes Dirichlet(alpha) exploration noise into the root
    priors (AlphaZero self-play convention; masked actions get no noise).
    `max_expand_depth > 1` extends each expansion with a greedy-by-prior
    truncated rollout of that many env steps: only the first stepped node is
    attached to the tree, deeper steps contribute accumulated reward plus the
    network value at the rollout frontier to the backed-up leaf value
    (reference max_expand_depth knob, rl/configs.py:306-320).

    Returns (visit_counts [B, A], root_value [B], root_priors [B, A]).
    """
    B = root_state.depth.shape[0]
    A = core.num_actions
    N1 = num_sims + 1

    key, noise_key = jax.random.split(key)

    obs = core.dense(root_state)
    logits, value = policy_apply(params, obs)
    masks = core.masks(root_state)
    neg = jnp.finfo(logits.dtype).min
    priors0 = jax.nn.softmax(jnp.where(masks, logits, neg), axis=-1)
    if noise_eps > 0.0:
        # masked Dirichlet: per-action gammas, zeroed where illegal,
        # renormalized (all-masked rows fall back to the raw priors)
        gam = jax.random.gamma(noise_key, dirichlet_alpha, (B, A))
        gam = jnp.where(masks, gam, 0.0)
        tot = gam.sum(-1, keepdims=True)
        noise = jnp.where(tot > 0, gam / jnp.maximum(tot, 1e-12), priors0)
        priors0 = (1.0 - noise_eps) * priors0 + noise_eps * noise

    tree = Tree(
        states=_tile_node_axis(root_state, N1),
        terminal=jnp.zeros((B, N1), bool).at[:, 0].set(core.is_final(root_state)),
        expanded=jnp.zeros((B, N1), bool).at[:, 0].set(True),
        priors=jnp.zeros((B, N1, A)).at[:, 0].set(priors0),
        value=jnp.zeros((B, N1)).at[:, 0].set(value),
        children=jnp.full((B, N1, A), -1, jnp.int32),
        n=jnp.zeros((B, N1, A)),
        w=jnp.zeros((B, N1, A)),
        r=jnp.zeros((B, N1, A)),
    )

    bidx = jnp.arange(B)

    sim_keys = jax.random.split(key, num_sims)

    def simulate(sim, carry):
        tree, key = carry
        k_step = sim_keys[sim]

        # ---- SELECT: descend by PUCT until an unexpanded child or terminal
        def select_body(d, sel):
            node, path_nodes, path_actions, depth, stop = sel
            nb = tree.n[bidx, node]                      # [B, A]
            wb = tree.w[bidx, node]
            rb = tree.r[bidx, node]
            pb = tree.priors[bidx, node]
            q = jnp.where(nb > 0, (rb * nb + wb) / jnp.maximum(nb, 1), 0.0)
            total = nb.sum(-1, keepdims=True)
            ucb = q + c_puct * pb * jnp.sqrt(total + 1e-8) / (1.0 + nb)
            action = jnp.argmax(ucb, axis=-1)            # [B]
            child = tree.children[bidx, node, action]
            at_leaf = (child < 0) | tree.terminal[bidx, node]
            rec = ~stop
            path_nodes = path_nodes.at[:, d].set(jnp.where(rec, node, -1))
            path_actions = path_actions.at[:, d].set(jnp.where(rec, action, -1))
            depth = jnp.where(rec, d + 1, depth)
            new_stop = stop | at_leaf
            node = jnp.where(new_stop, node, child)
            return node, path_nodes, path_actions, depth, new_stop

        path_nodes = jnp.full((B, max_depth), -1, jnp.int32)
        path_actions = jnp.full((B, max_depth), -1, jnp.int32)
        leaf, path_nodes, path_actions, depth, _ = jax.lax.fori_loop(
            0, max_depth,
            select_body,
            (jnp.zeros(B, jnp.int32), path_nodes, path_actions,
             jnp.zeros(B, jnp.int32), jnp.zeros(B, bool)),
        )
        # edge to expand = last recorded (node, action)
        last = jnp.maximum(depth - 1, 0)
        exp_node = path_nodes[bidx, last]
        exp_action = path_actions[bidx, last]
        exp_node = jnp.where(exp_node < 0, 0, exp_node)
        exp_action = jnp.where(exp_action < 0, 0, exp_action)

        # ---- EXPAND: env step from the selected leaf edge into slot `sim+1`
        leaf_state = _gather_node(tree.states, exp_node)
        stepped = core.step(leaf_state, exp_action, k_step)
        new_idx = jnp.full(B, sim + 1, jnp.int32)

        obs = core.dense(stepped)
        logits, value_new = policy_apply(params, obs)
        masks = core.masks(stepped)
        priors_new = jax.nn.softmax(jnp.where(masks, logits, neg), axis=-1)
        term_new = core.is_final(stepped)
        leaf_reward = stepped.reward

        # if the leaf node was terminal (no expansion possible), don't attach
        attachable = ~tree.terminal[bidx, exp_node]
        child_existing = tree.children[bidx, exp_node, exp_action]
        fresh = attachable & (child_existing < 0)

        states = _scatter_node(tree.states, new_idx, stepped)
        tree = tree._replace(
            states=jax.tree.map(
                lambda new, old: jnp.where(
                    fresh.reshape((-1,) + (1,) * (new.ndim - 1)), new, old
                ),
                states, tree.states,
            ),
            terminal=tree.terminal.at[bidx, new_idx].set(
                jnp.where(fresh, term_new, tree.terminal[bidx, new_idx])
            ),
            expanded=tree.expanded.at[bidx, new_idx].set(
                jnp.where(fresh, True, tree.expanded[bidx, new_idx])
            ),
            priors=tree.priors.at[bidx, new_idx].set(
                jnp.where(fresh[:, None], priors_new, tree.priors[bidx, new_idx])
            ),
            value=tree.value.at[bidx, new_idx].set(
                jnp.where(fresh, value_new, tree.value[bidx, new_idx])
            ),
            children=tree.children.at[bidx, exp_node, exp_action].set(
                jnp.where(fresh, new_idx, child_existing)
            ),
            r=tree.r.at[bidx, exp_node, exp_action].set(
                jnp.where(fresh, leaf_reward, tree.r[bidx, exp_node, exp_action])
            ),
        )

        # value to back up from the expansion point
        if max_expand_depth > 1:
            # truncated greedy rollout below the new node (not attached)
            roll_state = stepped
            alive = ~term_new
            extra_r = jnp.zeros(B)
            for d in range(max_expand_depth - 1):
                obs_d = core.dense(roll_state)
                logits_d, _ = policy_apply(params, obs_d)
                masks_d = core.masks(roll_state)
                act_d = jnp.argmax(jnp.where(masks_d, logits_d, neg), -1)
                nxt = core.step(roll_state, act_d,
                                jax.random.fold_in(k_step, d + 1))
                extra_r = extra_r + jnp.where(alive, nxt.reward, 0.0)
                roll_state = jax.tree.map(
                    lambda new, old: jnp.where(
                        alive.reshape(alive.shape + (1,) * (new.ndim - 1)),
                        new, old,
                    ),
                    nxt, roll_state,
                )
                alive = alive & ~core.is_final(roll_state)
            _, v_front = policy_apply(params, core.dense(roll_state))
            leaf_value = extra_r + jnp.where(alive, v_front, 0.0)
            leaf_value = jnp.where(term_new, 0.0, leaf_value)
        else:
            leaf_value = jnp.where(term_new, 0.0, value_new)
        leaf_value = jnp.where(attachable, leaf_value, 0.0)

        # ---- BACKUP: walk the path backwards, accumulating rewards
        def backup_body(i, bk):
            tree, g = bk
            d = max_depth - 1 - i
            node = path_nodes[bidx, d]
            action = path_actions[bidx, d]
            on_path = (node >= 0) & (d < depth)
            nd = jnp.where(on_path, node, 0)
            ad = jnp.where(on_path, action, 0)
            # g is the return below this edge; add edge reward
            edge_r = tree.r[bidx, nd, ad]
            g_here = edge_r + g
            n_upd = tree.n.at[bidx, nd, ad].add(jnp.where(on_path, 1.0, 0.0))
            # w accumulates returns BELOW the edge (edge reward is in r)
            w_upd = tree.w.at[bidx, nd, ad].add(jnp.where(on_path, g, 0.0))
            g = jnp.where(on_path, g_here, g)
            return tree._replace(n=n_upd, w=w_upd), g

        tree, _ = jax.lax.fori_loop(0, max_depth, backup_body, (tree, leaf_value))
        return tree, key

    tree, _ = jax.lax.fori_loop(0, num_sims, simulate, (tree, key))

    root_n = tree.n[:, 0]                                   # [B, A]
    root_q = jnp.where(
        root_n > 0,
        (tree.r[:, 0] * root_n + tree.w[:, 0]) / jnp.maximum(root_n, 1),
        0.0,
    )
    root_value = jnp.where(
        root_n.sum(-1) > 0,
        (root_n * root_q).sum(-1) / jnp.maximum(root_n.sum(-1), 1),
        tree.value[:, 0],
    )
    return root_n, root_value, tree.priors[:, 0]
