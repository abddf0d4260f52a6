"""Batched permutation (SWAP-routing) env on device.

State is int32[B, n] permutation vectors plus the dual-tracked inverse
(reference semantics rust/src/envs/permutation.rs:29-257). Applying action a:
state' = state[tau_a] (gather by position); inverse' = tau_a[inverse]
(gather by value) — so the reference's 50% random inversion is a buffer swap.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from qiskit_gym_tpu.spec.gates import parse_gateset
from qiskit_gym_tpu.spec.metrics import MetricsWeights

from .tables import MetricsTables, build_permutation_tables
from .matrix_env import MatrixEnvCore, MatrixEnvState  # reuse metrics kernel


class PermutationEnvState(NamedTuple):
    s: jnp.ndarray         # int32 [B, n]  permutation
    sinv: jnp.ndarray      # int32 [B, n]  inverse permutation
    depth: jnp.ndarray     # int32 [B]
    success: jnp.ndarray   # bool  [B]
    reward: jnp.ndarray    # float32 [B]
    inverted: jnp.ndarray  # bool  [B]
    last_g: jnp.ndarray    # int32 [B, n]
    last_c: jnp.ndarray    # int32 [B, n]
    max_g: jnp.ndarray
    max_c: jnp.ndarray
    n_cnots: jnp.ndarray
    n_gates: jnp.ndarray

    @property
    def batch(self) -> int:
        return self.s.shape[0]


class PermutationEnvCore:
    def __init__(
        self,
        num_qubits: int,
        gateset: Sequence,
        depth_slope: int = 2,
        max_depth: int = 128,
        metrics_weights: Optional[dict] = None,
        add_inverts: bool = True,
    ):
        self.num_qubits = int(num_qubits)
        self.gateset = parse_gateset(gateset)
        self.depth_slope = int(depth_slope)
        self.max_depth = int(max_depth)
        self.add_inverts = bool(add_inverts)
        self.weights = jnp.asarray(MetricsWeights.from_dict(metrics_weights).as_array())
        self.tau = jnp.asarray(build_permutation_tables(self.gateset, self.num_qubits))
        mt = MetricsTables.build(self.gateset)
        self.mtype = jnp.asarray(mt.mtype)
        self.mq1 = jnp.asarray(mt.q1)
        self.mq2 = jnp.asarray(mt.q2)
        self.iota = jnp.arange(self.num_qubits, dtype=jnp.int32)

    @property
    def num_actions(self) -> int:
        return len(self.gateset)

    @property
    def obs_shape(self) -> Tuple[int, int]:
        n = self.num_qubits
        return (n, n)

    # shared metrics kernel (same fields as MatrixEnvState subset)
    _metrics_update = MatrixEnvCore._metrics_update

    def apply_gates(self, s, sinv, action):
        tau_a = self.tau[action]                                  # [B, n]
        new_s = jnp.take_along_axis(s, tau_a, axis=1)             # s o tau
        new_sinv = jnp.take_along_axis(tau_a, sinv, axis=1)       # tau o s^-1
        return new_s, new_sinv

    def _solved(self, s):
        return jnp.all(s == self.iota[None], axis=1)

    def step(self, state, action, key, invert_override=None):
        state, penalty = self._metrics_update(state, action)
        new_s, new_sinv = self.apply_gates(state.s, state.sinv, action)
        if self.add_inverts:
            if invert_override is None:
                flip = jax.random.bernoulli(key, 0.5, (state.batch,))
            else:
                flip = invert_override
            f2 = flip[:, None]
            new_s, new_sinv = (
                jnp.where(f2, new_sinv, new_s),
                jnp.where(f2, new_s, new_sinv),
            )
            inverted = state.inverted ^ flip
        else:
            inverted = state.inverted
        depth = jnp.maximum(state.depth - 1, 0)
        success = self._solved(new_s)
        reward = jnp.where(success, 1.0, 0.0).astype(jnp.float32) - penalty
        return state._replace(
            s=new_s, sinv=new_sinv, depth=depth, success=success,
            reward=reward, inverted=inverted,
        )

    def _fresh(self, B: int) -> PermutationEnvState:
        n = self.num_qubits
        ident = jnp.tile(self.iota[None], (B, 1))
        return PermutationEnvState(
            s=ident, sinv=ident,
            depth=jnp.ones(B, jnp.int32),
            success=jnp.ones(B, bool),
            reward=jnp.ones(B, jnp.float32),
            inverted=jnp.zeros(B, bool),
            last_g=jnp.full((B, n), -1, jnp.int32),
            last_c=jnp.full((B, n), -1, jnp.int32),
            max_g=jnp.full(B, -1, jnp.int32),
            max_c=jnp.full(B, -1, jnp.int32),
            n_cnots=jnp.zeros(B, jnp.int32),
            n_gates=jnp.zeros(B, jnp.int32),
        )

    def reset(self, key, B, difficulty, scramble_override=None):
        state = self._fresh(B)
        difficulty = jnp.asarray(difficulty, jnp.int32)
        if scramble_override is not None:
            K = scramble_override.shape[1]

            def body(i, carry):
                s, sinv = carry
                act = scramble_override[:, i]
                valid = act < self.num_actions
                act = jnp.where(valid, act, 0)
                ns, nsinv = self.apply_gates(s, sinv, act)
                v2 = valid[:, None]
                return jnp.where(v2, ns, s), jnp.where(v2, nsinv, sinv)

            s, sinv = jax.lax.fori_loop(0, K, body, (state.s, state.sinv))
        else:
            def body(i, carry):
                s, sinv, k = carry
                k, sub = jax.random.split(k)
                act = jax.random.randint(sub, (B,), 0, self.num_actions)
                s, sinv = self.apply_gates(s, sinv, act)
                return s, sinv, k

            s, sinv, _ = jax.lax.fori_loop(0, difficulty, body, (state.s, state.sinv, key))
        success = self._solved(s)
        depth = jnp.minimum(self.depth_slope * difficulty, self.max_depth)
        return state._replace(
            s=s, sinv=sinv,
            depth=jnp.full((B,), depth, jnp.int32),
            success=success,
            reward=success.astype(jnp.float32),
        )

    def set_state(self, perms: np.ndarray) -> PermutationEnvState:
        perms = np.asarray(perms, dtype=np.int32)
        if perms.ndim == 1:
            perms = perms[None]
        B = perms.shape[0]
        sinv = np.empty_like(perms)
        for b in range(B):
            sinv[b, perms[b]] = np.arange(self.num_qubits)
        state = self._fresh(B)
        s = jnp.asarray(perms)
        success = self._solved(s)
        return state._replace(
            s=s, sinv=jnp.asarray(sinv),
            depth=jnp.full(B, self.max_depth, jnp.int32),
            success=success,
            reward=success.astype(jnp.float32),
        )

    def dense(self, state) -> jnp.ndarray:
        n = self.num_qubits
        return (state.s[:, :, None] == self.iota[None, None, :]).astype(jnp.uint8)

    def observe(self, state, dtype=jnp.float32) -> jnp.ndarray:
        return self.dense(state).astype(dtype)

    def masks(self, state) -> jnp.ndarray:
        return jnp.broadcast_to((~state.success)[:, None], (state.batch, self.num_actions))

    def is_final(self, state) -> jnp.ndarray:
        return (state.depth == 0) | state.success
