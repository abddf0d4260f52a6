"""Policy transfer between envs with different gatesets.

Synthesis policies read a gateset-independent observation (the state
encoding depends only on qubit count / max_rotations), so a policy trained
on one gateset transfers to any superset gateset over the same qubits by
remapping its action head: logits columns move to the matching action
indices, and actions new to the destination gateset get a floor logit the
downstream search (entropy bonus, MCTS root noise) can still explore.

This is the lever that crossed the 27q full-gateset Pauli rotation onset
(docs/TRAINING.md): direct MCTS seed amplification fails at 303 uninformed
action priors, but a 137-action dense-gateset artifact grafted into the
303-action head seeds at its transferred skill level immediately.

No reference counterpart (the reference trains each gateset from scratch).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

Gate = Tuple[str, Tuple[int, ...]]


def _norm(gateset: Sequence) -> list:
    return [(str(name).upper(), tuple(int(q) for q in qs))
            for name, qs in gateset]


def graft_action_head(dst_params: dict, src_params: dict,
                      src_gateset: Sequence[Gate],
                      dst_gateset: Sequence[Gate]) -> dict:
    """Return `dst_params` with `src_params` transferred into it.

    Trunk (embeddings / common / policy hidden layers) and the value head
    are copied verbatim; the `action_out` kernel/bias columns are scattered
    to the destination indices of the matching gates. Destination actions
    absent from the source gateset keep a zero kernel column and get the
    minimum source bias, i.e. a small-but-alive constant prior.

    Both param trees use the flax layout `{"params": {module: {kernel,
    bias}}}` (models/policies.py); `src_gateset` must be a subset of
    `dst_gateset` up to gate-name case and qubit-tuple type.
    """
    import jax.numpy as jnp

    src_gs, dst_gs = _norm(src_gateset), _norm(dst_gateset)
    dst_index = {g: i for i, g in enumerate(dst_gs)}
    missing = [g for g in src_gs if g not in dst_index]
    if missing:
        raise ValueError(
            f"source gateset entries absent from destination: {missing[:4]}"
            + ("..." if len(missing) > 4 else ""))
    cols = np.array([dst_index[g] for g in src_gs])

    src = src_params["params"]
    dst = {k: dict(v) for k, v in dst_params["params"].items()}
    extra = sorted(set(dst) - set(src))
    if extra:
        # a dst-only module would keep its random init and silently break
        # the transferred-behavior guarantee (identical logits/value on
        # shared actions) — architectures must match exactly
        raise ValueError(f"destination policy has modules absent from the "
                         f"source: {extra} (different architecture?)")
    for name in src:
        if name == "action_out":
            continue
        if name not in dst:
            raise ValueError(f"param module {name!r} missing from "
                             "destination policy (different architecture?)")
        # full-tree shape comparison: np.shape(dict) is () on BOTH sides,
        # so a one-level leaf check is vacuous for nested submodules —
        # recurse to every array leaf instead
        def _check_shapes(s, d, path):
            if isinstance(s, dict) or isinstance(d, dict):
                s_keys = set(s) if isinstance(s, dict) else None
                d_keys = set(d) if isinstance(d, dict) else None
                if s_keys != d_keys:
                    raise ValueError(
                        f"structure mismatch grafting {path}: source keys "
                        f"{s_keys} vs destination {d_keys} "
                        "(different architecture?)")
                for k in s:
                    _check_shapes(s[k], d[k], f"{path}/{k}")
                return
            have, want = tuple(np.shape(d)), tuple(np.shape(s))
            if have != want:
                # same module names but different widths / obs shape would
                # otherwise surface later as an opaque apply() shape error
                # or a silently wrong-shaped saved checkpoint
                raise ValueError(
                    f"shape mismatch grafting {path}: source {want} vs "
                    f"destination {have} (different obs shape or layer "
                    "widths?)")

        _check_shapes(src[name], dst[name], name)
        dst[name] = src[name]

    k_src = np.asarray(src["action_out"]["kernel"])
    b_src = np.asarray(src["action_out"]["bias"])
    if k_src.shape[1] != len(src_gs):
        raise ValueError(
            f"source action head has {k_src.shape[1]} outputs but "
            f"src_gateset lists {len(src_gs)} gates")
    k_dst = np.asarray(dst_params["params"]["action_out"]["kernel"])
    if k_dst.shape[1] != len(dst_gs):
        raise ValueError(
            f"destination action head has {k_dst.shape[1]} outputs but "
            f"dst_gateset lists {len(dst_gs)} gates")
    k_new = np.zeros((k_src.shape[0], len(dst_gs)), dtype=k_src.dtype)
    b_new = np.full(len(dst_gs), b_src.min(), dtype=b_src.dtype)
    k_new[:, cols] = k_src
    b_new[cols] = b_src
    dst["action_out"] = {"kernel": jnp.asarray(k_new),
                         "bias": jnp.asarray(b_new)}
    return {"params": dst}
