"""Policy/value networks.

`BasicPolicy` reproduces the architecture of the reference checkpoints
(examples/models/*.pt: flat obs -> Linear 'embeddings' -> ReLU Linear stack
'common.i' -> heads 'action.i' / 'value.i'); `Conv1dPolicy` adds a 1-D conv
frontend along a chosen obs axis. Layer names match the torch state-dict keys
so the shipped checkpoints import directly (models/torch_io.py).

Symmetry ("twists") support: `PolicyBundle.apply` optionally group-averages
over coupling-map automorphisms — each (obs_perm, act_perm) pair relabels the
flattened observation before the net and un-relabels the action logits after,
and the results are averaged. This makes the policy exactly equivariant under
the coupling graph's automorphism group (the reference feeds the same perms
to its torch policies; reference rl/synthesis.py:95-107).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn


class BasicPolicy(nn.Module):
    num_actions: int
    embedding_size: int = 512
    common_layers: Tuple[int, ...] = (256,)
    policy_layers: Tuple[int, ...] = ()
    value_layers: Tuple[int, ...] = ()

    @nn.compact
    def __call__(self, obs: jnp.ndarray):
        x = obs.reshape(obs.shape[0], -1)
        x = nn.Dense(self.embedding_size, name="embeddings")(x)
        x = nn.relu(x)
        for i, width in enumerate(self.common_layers):
            x = nn.Dense(width, name=f"common_{i}")(x)
            x = nn.relu(x)
        p = x
        for i, width in enumerate(self.policy_layers):
            p = nn.Dense(width, name=f"policy_{i}")(p)
            p = nn.relu(p)
        logits = nn.Dense(self.num_actions, name="action_out")(p)
        v = x
        for i, width in enumerate(self.value_layers):
            v = nn.Dense(width, name=f"value_{i}")(v)
            v = nn.relu(v)
        value = nn.Dense(1, name="value_out")(v)
        return logits, value[:, 0]


class Conv1dPolicy(nn.Module):
    """Conv1d frontend along obs axis `conv_dim`, then the MLP torso.

    Architecture derivation. The reference documents only two conv knobs:
    `conv_dim` (the obs axis convolved over) and `embedding_size` = "size of
    the flattened/aggregated feature vector produced by the Conv1d stack
    that is fed into the MLP torso" (reference rl/configs.py:619-631,
    defaults conv_dim=1, embedding_size=1260 at configs.py:645-652). The
    twisterl implementation is not vendored and the reference ships no conv
    checkpoints (examples/models/*.pt are all BasicPolicy state dicts), so
    the stack internals are underdetermined; what IS pinned down:
      * the conv runs along obs axis `conv_dim` with the other axis as
        channels;
      * the stack's flattened output feeding the torso has size
        `embedding_size`.
    Realization here: one SAME-padded Conv (length L = obs_shape[conv_dim]
    preserved) with out_channels C = ceil(embedding_size / L) — so conv
    capacity scales with the configured embedding instead of being a fixed
    guess — followed by an 'embeddings' Dense to exactly embedding_size
    (a square mixing layer when L divides embedding_size, e.g. the 1260
    default over a 63-column Pauli obs). kernel_size=3 is an explicit
    assumption, recorded in the 'conv.weight' checkpoint shape so any
    future real twisterl conv checkpoint import fails loudly on mismatch
    rather than silently mis-importing. Self round-trip (save torch format
    -> load -> identical logits) is tested in tests/test_api.py.
    """

    num_actions: int
    conv_dim: int = 1
    embedding_size: int = 1260
    common_layers: Tuple[int, ...] = (256,)
    policy_layers: Tuple[int, ...] = ()
    value_layers: Tuple[int, ...] = ()
    kernel_size: int = 3

    @nn.compact
    def __call__(self, obs: jnp.ndarray):
        # obs [B, d0, d1]; flax Conv is channels-last (spatial = axis 1), so
        # bring obs axis `conv_dim` into the spatial slot and leave the
        # other axis as channels. Sanity anchor: the 1260 default factors
        # exactly over the 63-COLUMN Pauli obs (1260 = 63 x 20), so the
        # default conv_dim=1 must convolve axis 1, not axis 0.
        x = obs
        if self.conv_dim == 1:
            x = jnp.swapaxes(x, 1, 2)
        # now [B, L, C_in] with L = obs_shape[conv_dim]
        L = x.shape[1]
        features = max(1, -(-self.embedding_size // L))  # ceil divide
        x = nn.Conv(features, (self.kernel_size,), name="conv")(x)
        x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(self.embedding_size, name="embeddings")(x)
        x = nn.relu(x)
        for i, width in enumerate(self.common_layers):
            x = nn.Dense(width, name=f"common_{i}")(x)
            x = nn.relu(x)
        p = x
        for i, width in enumerate(self.policy_layers):
            p = nn.Dense(width, name=f"policy_{i}")(p)
            p = nn.relu(p)
        logits = nn.Dense(self.num_actions, name="action_out")(p)
        v = x
        for i, width in enumerate(self.value_layers):
            v = nn.Dense(width, name=f"value_{i}")(v)
            v = nn.relu(v)
        value = nn.Dense(1, name="value_out")(v)
        return logits, value[:, 0]


class PolicyBundle:
    """A policy module + its obs/action symmetry perms, with a pure apply.

    apply(params, obs [B, *obs_shape]) -> (logits [B, A], value [B])
    """

    def __init__(
        self,
        module: nn.Module,
        obs_shape: Tuple[int, ...],
        num_actions: int,
        obs_perms: Optional[Sequence[Sequence[int]]] = None,
        act_perms: Optional[Sequence[Sequence[int]]] = None,
        symmetrize: bool = True,
    ):
        self.module = module
        self.obs_shape = tuple(obs_shape)
        self.num_actions = int(num_actions)
        obs_perms = [list(p) for p in (obs_perms or [])]
        act_perms = [list(p) for p in (act_perms or [])]
        assert len(obs_perms) == len(act_perms)
        # drop the identity-only case and precompute inverse perms:
        # relabeled_obs[:, p[i]] = obs[:, i]  <=>  relabeled = obs[:, inv_p]
        self.num_perms = len(obs_perms)
        if symmetrize and self.num_perms > 1:
            inv_obs = np.stack([np.argsort(np.asarray(p)) for p in obs_perms])
            self.inv_obs = jnp.asarray(inv_obs)                  # [P, D]
            self.act = jnp.asarray(np.stack(act_perms))          # [P, A]
        else:
            self.inv_obs = None
            self.act = None

    def init(self, key) -> dict:
        dummy = jnp.zeros((1,) + self.obs_shape, jnp.float32)
        return self.module.init(key, dummy)

    def apply(self, params, obs: jnp.ndarray):
        if not jnp.issubdtype(obs.dtype, jnp.floating):
            obs = obs.astype(jnp.float32)  # trajectories store dense bits as uint8
        if self.inv_obs is None:
            return self.module.apply(params, obs)
        B = obs.shape[0]
        flat = obs.reshape(B, -1)

        def one(inv_o, act_p):
            relabeled = flat[:, inv_o].reshape((B,) + self.obs_shape)
            logits, value = self.module.apply(params, relabeled)
            # Relabeled-frame action act_perm[a] corresponds to original-frame
            # action a (step(relabel(s), act_perm[a]) == relabel(step(s, a))),
            # so the original-frame logit for a is logits[act_perm[a]].
            return logits[:, act_p], value

        logits_all, value_all = jax.vmap(one)(self.inv_obs, self.act)
        return logits_all.mean(axis=0), value_all.mean(axis=0)


def make_policy(
    policy_cls: str,
    obs_shape,
    num_actions: int,
    model_config: dict,
    obs_perms=None,
    act_perms=None,
) -> PolicyBundle:
    """Instantiate from a config-style class path ('...BasicPolicy' etc.)."""
    name = policy_cls.split(".")[-1]
    cfg = dict(model_config)
    cfg.pop("policy_cls", None)
    common = tuple(cfg.pop("common_layers", (256,)))
    policy_l = tuple(cfg.pop("policy_layers", ()))
    value_l = tuple(cfg.pop("value_layers", ()))
    if name == "BasicPolicy":
        module = BasicPolicy(
            num_actions=num_actions,
            embedding_size=int(cfg.pop("embedding_size", 512)),
            common_layers=common,
            policy_layers=policy_l,
            value_layers=value_l,
        )
    elif name == "Conv1dPolicy":
        module = Conv1dPolicy(
            num_actions=num_actions,
            conv_dim=int(cfg.pop("conv_dim", 1)),
            embedding_size=int(cfg.pop("embedding_size", 1260)),
            common_layers=common,
            policy_layers=policy_l,
            value_layers=value_l,
        )
    else:
        raise ValueError(f"Unknown policy class {policy_cls!r}")
    return PolicyBundle(module, tuple(obs_shape), num_actions, obs_perms, act_perms)
