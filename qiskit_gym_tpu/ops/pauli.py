"""Batched Pauli-network env on device.

Reference semantics: rust/src/envs/pauli.rs + rust/src/pauli/* (re-derived;
the spec twin is spec/pauli_env.py). Fixed-shape design:

- Tableau block: BITPACKED uint32 [B, W2 * D2] (rows packed 32-per-word),
  updated per step with the action's NET gate matrix (the product of its
  primitive row-ops, using the Pauli network's transposed-index cnot
  convention) in factorized I xor U S form via the packed popcount-parity
  kernel (ops/matrix_env.packed_apply_left); the 70/15/15 reset scramble
  uses the same kernel with per-primitive term tables.
- Rotations: BITPACKED (x, z) bits uint32 [B, R, Wn] (qubits packed
  32-per-word along the last axis) + phase mod 4 [B, R], evolved through the
  action's primitive sequence (<= 3 H/S/Sdg/CNOT slots; Sdg = S^3 is fused
  into one primitive — exact, so SXdg = (HSH)^3 = H Sdg H — the final state
  matches the reference's gate-level application bit for bit), because phase
  updates read intermediate bit values. Each primitive touches one or two
  qubit BITS, so the whole update is single-bit mask XORs on packed words.
  The hot loop itself runs B-MINOR ([R, Wn, B] / [R, B], envs on the
  128-lane axis): the per-env rotation block is tiny (R x n bits), so a
  B-major loop would put single-digit dims on the vector registers'
  (sublane, lane) axes and waste >99% of every op; the step transposes in
  and out (~2 MB of relayout per batched step, negligible vs the 20x lane
  utilization win — pauli 12.0 -> 14.6M steps/s).
- The anti-commutation DAG is a static-per-episode bool matrix [B, R, R]
  (edges later->earlier); the front layer and the trivial-rotation sweep are
  masked reductions — petgraph's retain_nodes becomes an `active` mask update.
  A cleanup (R fixed passes) runs after every primitive CNOT, exactly like
  the reference runs clean_and_return_with_phases inside cnot().
- The observe-time random coupling-map automorphism is explicit env state
  (perm_idx, resampled each step/reset) instead of the reference's
  AtomicUsize side-channel (rust pauli.rs:294-297); it is applied to the
  observation with one-hot permutation matrices (MXU, no per-lane gathers)
  and un-applied to incoming actions via the act_perms table.
- Reset generation (distance-budgeted random Pauli strings + 70/15/15
  H/S/CX tableau scramble, reference pauli.rs:113-271) runs fully on device
  with masked fixed-bound loops.

Solution reconstruction (packed rotation events with phases) is host-side
replay of the chosen action sequence through the spec env.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from qiskit_gym_tpu.spec.gates import parse_gateset
from qiskit_gym_tpu.spec.metrics import MetricsWeights
from qiskit_gym_tpu.spec.pauli_env import graph_distances
from qiskit_gym_tpu.spec.symmetry import compute_qubit_perms

from .matrix_env import (MatrixEnvCore, _pad_dim, gf2_factor,
                         pack_rows, pack_term_tables, packed_apply_left,
                         unpack_rows)
from .tables import MT_1Q, MT_CX, MT_CZ, MT_SWAP, MetricsTables

# primitive op codes (P_SDG = S^3 fused into one slot: z ^= x, ph += 3x —
# exact, since S^3 = Sdg as a unitary and H^2 = I makes (H S H)^3 = H S^3 H)
P_NOP, P_H, P_S, P_CNOT, P_SDG = 0, 1, 2, 3, 4
MAX_PRIMS = 3  # SX = H S H, SXdg = H Sdg H, SWAP = 3 CNOTs, CZ = H CX H


def pack_bits_lastdim(bits, W: int):
    """0/1 [..., n] -> uint32 [..., W] (bit q of word q//32 = bit q%32)."""
    n = bits.shape[-1]
    pad = W * 32 - n
    b = jnp.pad(bits.astype(jnp.uint32), [(0, 0)] * (bits.ndim - 1) + [(0, pad)])
    b = b.reshape(bits.shape[:-1] + (W, 32))
    return jnp.sum(b << jnp.arange(32, dtype=jnp.uint32), axis=-1)


def unpack_bits_lastdim(words, n: int):
    """uint32 [..., W] -> uint8 [..., n]."""
    bits = (words[..., None] >> jnp.arange(32, dtype=jnp.uint32)) & 1
    return bits.reshape(words.shape[:-1] + (-1,))[..., :n].astype(jnp.uint8)


def pack_bits_np(bits: np.ndarray, W: int) -> np.ndarray:
    """numpy twin of pack_bits_lastdim (host-side set_state)."""
    bits = np.asarray(bits)
    out = np.zeros(bits.shape[:-1] + (W,), np.uint32)
    for q in range(bits.shape[-1]):
        out[..., q // 32] |= (bits[..., q].astype(np.uint32) & 1) << (q % 32)
    return out


def _primitive_sequence(gate) -> list:
    name, qs = gate
    if name == "H":
        return [(P_H, qs[0], 0)]
    if name == "S":
        return [(P_S, qs[0], 0)]
    if name == "Sdg":
        return [(P_SDG, qs[0], 0)]
    if name == "SX":
        return [(P_H, qs[0], 0), (P_S, qs[0], 0), (P_H, qs[0], 0)]
    if name == "SXdg":
        return [(P_H, qs[0], 0), (P_SDG, qs[0], 0), (P_H, qs[0], 0)]
    if name == "CX":
        return [(P_CNOT, qs[0], qs[1])]
    if name == "CZ":
        return [(P_H, qs[1], 0), (P_CNOT, qs[0], qs[1]), (P_H, qs[1], 0)]
    if name == "SWAP":
        return [(P_CNOT, qs[0], qs[1]), (P_CNOT, qs[1], qs[0]),
                (P_CNOT, qs[0], qs[1])]
    raise ValueError(name)


def _network_gate_matrix(gate, n: int, D2: int) -> np.ndarray:
    """Net tableau left-multiplication matrix (network cnot convention:
    CNOT(i,j): row i ^= row j ; row n+j ^= row n+i)."""
    G = np.eye(D2, dtype=np.uint8)
    for ptype, a, b in _primitive_sequence(gate):
        if ptype == P_H:
            G[[a, n + a]] = G[[n + a, a]]
        elif ptype in (P_S, P_SDG):   # same GF(2) linear part: z ^= x
            G[n + a] ^= G[a]
        elif ptype == P_CNOT:
            G[a] ^= G[b]
            G[n + b] ^= G[n + a]
    return G


class PauliEnvState(NamedTuple):
    tab: jnp.ndarray        # uint32 [B, W2 * D2] bitpacked (rows 32/word)
    rx: jnp.ndarray         # uint32 [B, R, Wn] bitpacked qubit bits
    rz: jnp.ndarray         # uint32 [B, R, Wn]
    rphase: jnp.ndarray     # int8 [B, R]  (mod 4)
    active: jnp.ndarray     # bool [B, R]
    anti: jnp.ndarray       # bool [B, R, R]  anti-commutation, j < i
    perm_idx: jnp.ndarray   # int32 [B] automorphism in effect for observe/step
    depth: jnp.ndarray      # int32 [B]
    success: jnp.ndarray    # bool  [B]
    reward: jnp.ndarray     # f32   [B]
    inverted: jnp.ndarray   # bool  [B] (always False; kept for API uniformity)
    last_g: jnp.ndarray     # int32 [B, n]
    last_c: jnp.ndarray     # int32 [B, n]
    max_g: jnp.ndarray
    max_c: jnp.ndarray
    n_cnots: jnp.ndarray
    n_gates: jnp.ndarray

    @property
    def batch(self) -> int:
        return self.tab.shape[0]


class PauliEnvCore:
    def __init__(
        self,
        num_qubits: int,
        gateset: Sequence,
        depth_slope: int = 2,
        max_depth: int = 128,
        max_rotations: int = 5,
        pauli_diff_scale: int = 8,
        num_qubits_decay: float = 0.5,
        final_pauli_layers: Optional[int] = None,
        metrics_weights: Optional[dict] = None,
        add_perms: bool = True,
        pauli_layer_reward: float = 0.01,
        scramble_cap: int = 256,
    ):
        self.num_qubits = n = int(num_qubits)
        self.gateset = parse_gateset(gateset)
        self.R = max(int(max_rotations), 1)   # obs width cap (max_rotations)
        self.dim = 2 * n
        self.Wn = (n + 31) // 32   # packed qubit words per rotation
        self.D2 = _pad_dim(self.dim)
        self.depth_slope = int(depth_slope)
        self.max_depth = int(max_depth)
        self.pauli_diff_scale = max(int(pauli_diff_scale), 1)
        self.num_qubits_decay = float(num_qubits_decay)
        self.final_pauli_layers = (
            int(final_pauli_layers) if final_pauli_layers is not None
            else self.R + 2
        )
        # rotation storage capacity: reset can generate up to
        # final_pauli_layers rotations (> max_rotations); the obs compaction
        # shows at most R of the active ones (reference pad_and_collect)
        self.RT = max(self.final_pauli_layers, self.R)
        self.pauli_layer_reward = float(pauli_layer_reward)
        self.add_inverts = False
        self.scramble_cap = int(scramble_cap)
        _w = MetricsWeights.from_dict(metrics_weights).as_array()
        self.weights = jnp.asarray(_w)
        self.weights_static = tuple(float(x) for x in _w)
        # see MatrixEnvCore: layer tracking elided when both layer weights
        # are zero (the reference default), shared _metrics_update_terms
        self.track_layers = (self.weights_static[1] != 0.0
                             or self.weights_static[2] != 0.0)

        A = len(self.gateset)
        # net tableau matrices factorized as G = I xor U S (+ all-zero no-op
        # terms at index A) and BITPACKED: the tableau lives as uint32
        # [B, W2 * D2] words (rows packed 32-per-word), updated by the packed
        # popcount-parity kernel (ops/matrix_env.packed_apply_left) — the
        # same representation that won on the Clifford env (docs/PERF.md)
        mats = [_network_gate_matrix(g, n, self.D2) for g in self.gateset]
        mats.append(np.eye(self.D2, dtype=np.uint8))
        eye = np.eye(self.D2, dtype=np.uint8)
        facs = [gf2_factor(G ^ eye) for G in mats]
        self.W2 = (self.D2 + 31) // 32
        self.L2 = self.W2 * self.D2
        U32, S32, _, _ = pack_term_tables(
            [U for U, _ in facs], [S for _, S in facs], self.D2)
        self.U32 = jnp.asarray(U32)
        self.S32 = jnp.asarray(S32)
        self.ident_pk = jnp.asarray(
            pack_rows(eye, self.W2).reshape(self.L2))
        self.noop_action = A

        # primitive tables [A+1, MAX_PRIMS]
        pt = np.zeros((A + 1, MAX_PRIMS), np.int32)
        p1 = np.zeros((A + 1, MAX_PRIMS), np.int32)
        p2 = np.zeros((A + 1, MAX_PRIMS), np.int32)
        for a, g in enumerate(self.gateset):
            for k, (c, q1, q2) in enumerate(_primitive_sequence(g)):
                pt[a, k], p1[a, k], p2[a, k] = c, q1, q2
        self.ptype = jnp.asarray(pt)
        self.pq1 = jnp.asarray(p1)
        self.pq2 = jnp.asarray(p2)
        # static loop bounds: actual primitive depth of this gateset, and the
        # slot indices where any action has a CNOT (only those need a sweep)
        self.max_prims = max(
            (len(_primitive_sequence(g)) for g in self.gateset), default=1
        )
        self.cleanup_slots = sorted({
            k for g in self.gateset
            for k, (c, _, _) in enumerate(_primitive_sequence(g))
            if c == P_CNOT
        })

        mt = MetricsTables.build(self.gateset)
        self.mtype = jnp.asarray(np.concatenate([mt.mtype, [MT_1Q]]))
        self.mq1 = jnp.asarray(np.concatenate([mt.q1, [0]]))
        self.mq2 = jnp.asarray(np.concatenate([mt.q2, [0]]))
        self._build_fat_table()

        # symmetry: qubit automorphisms as one-hot matrices + action perms
        if add_perms:
            qubit_perms, act_perms = compute_qubit_perms(n, self.gateset)
        else:
            qubit_perms, act_perms = [list(range(n))], [list(range(A))]
        self.num_perms = len(qubit_perms)
        pmats = np.zeros((self.num_perms, self.D2, self.D2), np.int8)
        for k, perm in enumerate(qubit_perms):
            for i, p in enumerate(perm):
                # dst row i <- src row perm[i] (reference apply_perm_to_obs)
                pmats[k, i, p] = 1
                pmats[k, n + i, n + p] = 1
            for d in range(self.dim, self.D2):
                pmats[k, d, d] = 1
        self.perm_mats = jnp.asarray(pmats)             # [P, D2, D2]
        self.act_perms = jnp.asarray(np.asarray(act_perms, np.int32))  # [P, A]
        self.qubit_perms = [list(p) for p in qubit_perms]

        # reset-generation tables
        self.valid_pairs = [qs for name, qs in self.gateset if name == "CX"]
        dist = graph_distances(n, self.valid_pairs)
        dist_pairs = {}
        for q1 in range(n):
            for q2 in range(q1 + 1, n):
                if (q1, q2) in dist:
                    dist_pairs.setdefault(dist[(q1, q2)], []).append((q1, q2))
        self.all_dists = sorted(dist_pairs)
        nd = max(len(self.all_dists), 1)
        mx = max((len(v) for v in dist_pairs.values()), default=1)
        pair_tab = np.zeros((nd, mx, 2), np.int32)
        pair_cnt = np.zeros((nd,), np.int32)
        dist_vals = np.zeros((nd,), np.int32)
        for k, d in enumerate(self.all_dists):
            ps = dist_pairs[d]
            pair_cnt[k] = len(ps)
            dist_vals[k] = d
            for j, p in enumerate(ps):
                pair_tab[k, j] = p
        self.pair_tab = jnp.asarray(pair_tab)
        self.pair_cnt = jnp.asarray(pair_cnt)
        self.dist_vals = jnp.asarray(dist_vals)

        # scramble primitive stack: CX(valid_pairs) / H(q) / S(q) matrices
        prim = []
        for (q0, q1) in self.valid_pairs:
            # reference random_clifford_tableau CX: row q1 ^= row q0,
            # row n+q0 ^= row n+q1 (Clifford-env convention)
            G = np.eye(self.D2, dtype=np.uint8)
            G[q1] ^= G[q0]
            G[n + q0] ^= G[n + q1]
            prim.append(G)
        self.n_scramble_cx = max(len(prim), 1)
        for q in range(n):
            G = np.eye(self.D2, dtype=np.uint8)
            G[[q, n + q]] = G[[n + q, q]]
            prim.append(G)
        for q in range(n):
            G = np.eye(self.D2, dtype=np.uint8)
            G[n + q] ^= G[q]
            prim.append(G)
        prim.append(np.eye(self.D2, dtype=np.uint8))  # no-op
        sc_facs = [gf2_factor(G ^ eye) for G in prim]
        scU32, scS32, _, _ = pack_term_tables(
            [U for U, _ in sc_facs], [S for _, S in sc_facs], self.D2)
        self.scU32 = jnp.asarray(scU32)
        self.scS32 = jnp.asarray(scS32)
        self.n_scramble = len(prim)

    # ------------------------------------------------- consolidated gather
    # Same design as MatrixEnvCore: per-action table gathers cost
    # ~110-145 us/step each at B=16k+ regardless of width; the Pauli step
    # needed 8 (mtype/q1/q2, ptype/pq1/pq2, U32/S32). One fat f32 table,
    # gathered once per step, replaces them all; every column is exactly
    # f32-representable (<= 255).

    def _build_fat_table(self):
        A1 = self.num_actions + 1
        cols = [np.asarray(self.mtype, np.float32),
                np.asarray(self.mq1, np.float32),
                np.asarray(self.mq2, np.float32)]
        for T in (np.asarray(self.ptype), np.asarray(self.pq1),
                  np.asarray(self.pq2)):
            for k in range(MAX_PRIMS):
                cols.append(T[:, k].astype(np.float32))
        K2, W2 = self.U32.shape[1], self.W2
        for T in (np.asarray(self.U32), np.asarray(self.S32)):
            for k in range(K2):
                for w in range(W2):
                    for byte in range(4):
                        cols.append(((T[:, k, w] >> (8 * byte)) & 0xFF
                                     ).astype(np.float32))
        self._fat_K2 = K2
        self.fat_tab = jnp.asarray(np.stack(cols, axis=1))   # [A1, F]

    def _decode_action_tables(self, action):
        """(mtype, q1, q2, extras) with extras = (U32, S32, pt, p1, p2);
        the first three match MatrixEnvCore's layout so the shared metrics
        kernel works unchanged."""
        vals = self.fat_tab[action]                           # [B, F]
        B = action.shape[0]
        mtype = vals[:, 0].astype(jnp.int32)
        q1 = vals[:, 1].astype(jnp.int32)
        q2 = vals[:, 2].astype(jnp.int32)
        o = 3
        pt = vals[:, o:o + MAX_PRIMS].astype(jnp.int32); o += MAX_PRIMS
        p1 = vals[:, o:o + MAX_PRIMS].astype(jnp.int32); o += MAX_PRIMS
        p2 = vals[:, o:o + MAX_PRIMS].astype(jnp.int32); o += MAX_PRIMS
        K2, W2 = self._fat_K2, self.W2
        nb = K2 * W2 * 4

        def words(block):
            b = block.astype(jnp.uint32).reshape(B, K2, W2, 4)
            return (b[..., 0] | (b[..., 1] << 8)
                    | (b[..., 2] << 16) | (b[..., 3] << 24))

        U32 = words(vals[:, o:o + nb]); o += nb
        S32 = words(vals[:, o:o + nb]); o += nb
        return mtype, q1, q2, (U32, S32, pt, p1, p2)

    # ------------------------------------------------------------ properties
    @property
    def num_actions(self) -> int:
        return len(self.gateset)

    @property
    def obs_shape(self) -> Tuple[int, int]:
        return (self.dim, self.dim + self.R)

    # --------------------------------------------------------- rotation math
    #
    # The hot rotation loop runs B-MINOR: rotations/words on the major axes,
    # envs on the last (lane) axis — [R, Wn, B] uint32 / [R, B] bool. The
    # per-env rotation state is tiny (R x n bits), so a B-major layout puts
    # single-digit dims on the TPU's (sublane, lane) axes and wastes >99% of
    # every vector register; with B minor each op processes 1024 envs/vreg.
    # State stays B-major (API/layout stability); step transposes in and out.

    def _bit_mask_t(self, q):
        """Single-bit word mask for qubit index q [B] -> uint32 [Wn, B]."""
        word = (q // 32)[None, :]
        pos = (q % 32).astype(jnp.uint32)[None, :]
        sel = jnp.arange(self.Wn, dtype=jnp.int32)[:, None] == word
        return jnp.where(sel, jnp.uint32(1) << pos, jnp.uint32(0))

    def _cleanup(self, rx, rz, active, anti):
        """Repeated front-layer sweep removing trivial rotations (B-major
        wrapper used at reset; the step uses the transposed form directly).

        Returns (new_active, removed_count [B])."""
        rxT = jnp.moveaxis(rx, 0, -1)
        rzT = jnp.moveaxis(rz, 0, -1)
        activeT, removed = self._cleanup_t(
            rxT, rzT, active.T, jnp.moveaxis(anti, 0, -1))
        return activeT.T, removed

    def _cleanup_t(self, rxT, rzT, activeT, antiT):
        """Transposed trivial sweep: rxT/rzT [R, Wn, B], activeT [R, B],
        antiT [R, R, B] (anti[i, j] with envs minor).

        Returns (new_activeT [R, B], removed_count [B])."""
        weight = jnp.sum(jax.lax.population_count(rxT | rzT), axis=1)
        trivial = weight <= 1                              # [R, B]

        def body(i, carry):
            activeT, removed = carry
            blocked = jnp.any(antiT & activeT[None, :, :], axis=1)  # [R, B]
            t = activeT & ~blocked & trivial
            activeT = activeT & ~t
            removed = removed + jnp.sum(t, axis=0)
            return activeT, removed

        return jax.lax.fori_loop(
            0, self.RT, body,
            (activeT, jnp.zeros(activeT.shape[-1], jnp.int32)),
        )

    def _apply_primitives(self, state: PauliEnvState, pt, p1, p2):
        """Evolve rotations (bits + phases) through the action's primitive
        sequence (pre-decoded tables pt/p1/p2 [B, MAX_PRIMS]), running the
        trivial sweep after every CNOT.

        Packed form: each primitive reads one or two qubit BITS per rotation
        (xa/za/xb at dynamic qubit positions, via single-bit word masks) and
        writes back single-bit XOR terms — every array in the loop is
        [B, R, Wn] uint32 or [B, R] rather than [B, R, n]."""
        antiT = jnp.moveaxis(state.anti, 0, -1)            # [R, R, B]

        def slot(k, carry, with_cleanup):
            rx, rz, ph, active, removed = carry            # all B-minor
            c = pt[:, k]                                   # [B]
            mask_a = self._bit_mask_t(p1[:, k])[None]      # [1, Wn, B]
            mask_b = self._bit_mask_t(p2[:, k])[None]
            is_h = (c == P_H)[None, :]                     # [1, B]
            is_s = (c == P_S)[None, :]
            is_sdg = (c == P_SDG)[None, :]
            is_cx = (c == P_CNOT)[None, :]

            xa = jnp.any((rx & mask_a) != 0, axis=1)       # bool [R, B]
            za = jnp.any((rz & mask_a) != 0, axis=1)
            xb = jnp.any((rx & mask_b) != 0, axis=1)

            # H(a): swap x_a <-> z_a == both ^= (x_a ^ z_a); ph += 2 x_a z_a
            # S(a): z_a ^= x_a ; ph += x_a
            # Sdg(a) = S(a)^3: z_a ^= x_a ; ph += 3 x_a (x untouched by S)
            # CNOT(a,b) == evolve_cx(ctrl=b, trgt=a): x_a ^= x_b ; z_b ^= z_a
            d = xa ^ za
            dx_a = jnp.where(is_h, d, is_cx & xb)          # bool [R, B]
            dz_a = jnp.where(is_h, d, (is_s | is_sdg) & xa)
            dz_b = is_cx & za

            rx = rx ^ jnp.where(dx_a[:, None, :], mask_a, jnp.uint32(0))
            rz = (rz ^ jnp.where(dz_a[:, None, :], mask_a, jnp.uint32(0))
                     ^ jnp.where(dz_b[:, None, :], mask_b, jnp.uint32(0)))
            xai = xa.astype(jnp.int32)
            dph = jnp.where(is_h, 2 * (xa & za).astype(jnp.int32),
                  jnp.where(is_s, xai, jnp.where(is_sdg, 3 * xai, 0)))
            ph = (ph + dph) % 4

            if with_cleanup:
                new_active, rem = self._cleanup_t(rx, rz, active, antiT)
                iscx_b = (c == P_CNOT)
                active = jnp.where(iscx_b[None, :], new_active, active)
                removed = removed + jnp.where(iscx_b, rem, 0)
            return rx, rz, ph, active, removed

        removed0 = jnp.zeros(state.batch, jnp.int32)
        carry = (jnp.moveaxis(state.rx, 0, -1),            # [R, Wn, B]
                 jnp.moveaxis(state.rz, 0, -1),
                 state.rphase.astype(jnp.int32).T,         # [R, B]
                 state.active.T, removed0)
        # two masked fori phases (a fori compiles leaner than a full static
        # unroll — measured on v5e): CNOT-capable slots run the trivial
        # sweep; tail slots (e.g. SXdg's trailing H primitive) never
        # contain a CNOT across the gateset, so theirs is dead code
        n_cx_slots = (max(self.cleanup_slots) + 1) if self.cleanup_slots else 0
        if self.cleanup_slots and self.cleanup_slots != list(
                range(n_cx_slots)):
            n_cx_slots = self.max_prims  # non-prefix CNOT slots: sweep all
        carry = jax.lax.fori_loop(
            0, n_cx_slots, lambda k, cy: slot(k, cy, True), carry)
        if n_cx_slots < self.max_prims:
            carry = jax.lax.fori_loop(
                n_cx_slots, self.max_prims,
                lambda k, cy: slot(k, cy, False), carry)
        rx, rz, ph, active, removed = carry
        return (jnp.moveaxis(rx, -1, 0), jnp.moveaxis(rz, -1, 0),
                ph.astype(jnp.int8).T, active.T, removed)

    # metrics: shares the closed-form running-max kernel with MatrixEnvCore
    # (same state fields and per-action tables);
    # _metrics_update_xla works through this class's own fat-table decode
    _metrics_update = MatrixEnvCore._metrics_update
    _metrics_update_xla = MatrixEnvCore._metrics_update_xla
    _metrics_update_terms = MatrixEnvCore._metrics_update_terms

    # The fused Pallas metrics kernel (ops/pallas_metrics.py) decodes
    # through MatrixEnvCore's step path, which this class replaces with its
    # own fat-table decode — the flag has no effect here, so enabling it is
    # rejected instead of silently ignored.
    @property
    def use_pallas_metrics(self) -> bool:
        return False

    @use_pallas_metrics.setter
    def use_pallas_metrics(self, value: bool) -> None:
        if value:
            raise ValueError(
                "use_pallas_metrics is matrix-env only; PauliEnvCore's step "
                "uses its own consolidated fat-table decode (always XLA)")

    def translate_action(self, state: PauliEnvState, action):
        """Policy-frame -> env-frame action through the active automorphism.
        The noop action (== num_actions) passes through untouched — the
        act_perms table is [P, A] and an out-of-bounds gather would clamp
        to the LAST REAL GATE, silently stepping the env."""
        if self.num_perms == 1:
            # trivial automorphism group (e.g. 27q heavy-hex): identity map,
            # skip the per-env 2-D table gather entirely
            return action
        a = jnp.minimum(action, self.num_actions - 1)
        return jnp.where(action >= self.num_actions, action,
                         self.act_perms[state.perm_idx, a])

    # ----------------------------------------------------------------- step
    def step(
        self,
        state: PauliEnvState,
        action: jnp.ndarray,
        key: jax.Array,
        invert_override=None,  # unused; API uniformity
        actual_override=None,
    ) -> PauliEnvState:
        # un-permute the incoming action through the active automorphism;
        # collectors that already translated it for the trajectory record
        # pass it through to skip the duplicate per-env 2-D table gather
        actual = (actual_override if actual_override is not None
                  else self.translate_action(state, action))
        # ONE consolidated table gather feeds metrics, the tableau update
        # terms, and the primitive sequence
        mtype, q1, q2, (U32, S32, pt, p1, p2) = (
            self._decode_action_tables(actual))
        noop = actual == self.noop_action
        state, penalty = self._metrics_update_terms(state, mtype, q1, q2,
                                                    noop)
        new_tab = packed_apply_left(U32, S32, state.tab, self.W2, self.D2)

        rx, rz, ph, active, removed = self._apply_primitives(state, pt, p1, p2)

        # resample the automorphism for the next observe (explicit state
        # instead of the reference's observe-time AtomicUsize side channel)
        k_perm, _ = jax.random.split(key)
        perm_idx = jax.random.randint(k_perm, (state.batch,), 0, self.num_perms)

        depth = jnp.maximum(state.depth - 1, 0)
        success = self._solved(new_tab, active)
        reward = (
            jnp.where(success, 1.0, 0.0).astype(jnp.float32)
            - penalty
            + self.pauli_layer_reward * removed.astype(jnp.float32)
        )
        return state._replace(
            tab=new_tab, rx=rx, rz=rz, rphase=ph, active=active,
            perm_idx=perm_idx, depth=depth, success=success, reward=reward,
        )

    def _solved(self, tab, active):
        return (~active.any(axis=-1)) & jnp.all(
            tab == self.ident_pk[None], axis=1
        )

    # ---------------------------------------------------------------- reset
    def _fresh(self, B: int) -> PauliEnvState:
        n = self.num_qubits
        return PauliEnvState(
            tab=jnp.tile(self.ident_pk[None], (B, 1)),
            rx=jnp.zeros((B, self.RT, self.Wn), jnp.uint32),
            rz=jnp.zeros((B, self.RT, self.Wn), jnp.uint32),
            rphase=jnp.zeros((B, self.RT), jnp.int8),
            active=jnp.zeros((B, self.RT), bool),
            anti=jnp.zeros((B, self.RT, self.RT), bool),
            perm_idx=jnp.zeros(B, jnp.int32),
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

    def _build_anti(self, rx, rz, valid):
        """anti[i, j] (j < i): rotations i, j anticommute; only valid rows.

        Symplectic product parity via popcounts over the packed qubit words
        ([B, R, R, Wn] intermediates; R is small)."""
        x_i_z_j = jnp.sum(jax.lax.population_count(
            rx[:, :, None, :] & rz[:, None, :, :]), axis=-1)
        z_i_x_j = jnp.sum(jax.lax.population_count(
            rz[:, :, None, :] & rx[:, None, :, :]), axis=-1)
        anti = (((x_i_z_j + z_i_x_j) & 1) != 0)
        R = self.RT
        lower = jnp.tril(jnp.ones((R, R), bool), k=-1)
        return anti & lower[None] & valid[:, :, None] & valid[:, None, :]

    def _generate_rotations(self, key, B, pauli_difficulty):
        """Distance-budgeted random Pauli strings (reference pauli.rs:113-213),
        vectorized with masked fixed-bound loops."""
        n = self.num_qubits
        nd = self.pair_cnt.shape[0]
        # DEVIATION (documented): the reference's extension loop is UNBOUNDED
        # (pauli.rs:147-157 — extend while rng > num_qubits_decay); a traced
        # fori needs a static bound. Each iteration first breaks w.p. decay,
        # so P(> EXT_CAP extensions) = (1 - decay)^16 ~ 1.5e-5 at the 0.5
        # default — and the loop is further bounded by the distance budget
        # and the unclaimed-qubit supply. Distributional agreement with the
        # uncapped spec twin is pinned by tests/test_pauli.py::
        # test_ext_cap_matches_uncapped_spec_distribution.
        EXT_CAP = 16

        def sample_masked(k, scores_mask):
            # uniform index among True entries of scores_mask [B, nd];
            # rows with no valid entry fall back to index 0 (callers mask)
            safe = scores_mask | ~scores_mask.any(-1, keepdims=True)
            logits = jnp.where(safe, 0.0, -jnp.inf)
            return jax.random.categorical(k, logits, axis=-1)

        def gen_one(carry, k):
            budget, count = carry  # [B] remaining difficulty, [B] rotations made
            ks = jax.random.split(k, 4 + EXT_CAP)
            can = (self.dist_vals[None, :] <= budget[:, None]) & (
                self.pair_cnt[None, :] > 0
            )
            any_valid = can.any(axis=-1) & (budget > 0) & (
                count < self.final_pauli_layers
            )
            d_idx = sample_masked(ks[0], can)
            pair_i = jax.random.randint(ks[1], (B,), 0, 1 << 30) % jnp.maximum(
                self.pair_cnt[d_idx], 1
            )
            pair = self.pair_tab[d_idx, pair_i]          # [B, 2]
            member = (jnp.arange(n)[None, :] == pair[:, 0:1]) | (
                jnp.arange(n)[None, :] == pair[:, 1:2]
            )
            budget_new = jnp.maximum(budget - self.dist_vals[d_idx], 0)

            def ext(i, ec):
                member, budget_new, stopped = ec
                kk = ks[4 + i]
                k1, k2, k3 = jax.random.split(kk, 3)
                can_e = (self.dist_vals[None, :] <= budget_new[:, None]) & (
                    self.pair_cnt[None, :] > 0
                )
                anyq_left = (~member).any(axis=-1)
                go = (~stopped) & (budget_new > 0) & can_e.any(-1) & anyq_left
                # decay break
                go = go & (jax.random.uniform(k1, (B,)) > self.num_qubits_decay)
                d2 = sample_masked(k2, can_e)
                # pairs at d2 connecting to the member set
                ptab = self.pair_tab[d2]                 # [B, mx, 2]
                pcnt = self.pair_cnt[d2]
                conn = (
                    jnp.take_along_axis(
                        member, ptab[:, :, 0], axis=1
                    ) | jnp.take_along_axis(member, ptab[:, :, 1], axis=1)
                ) & (jnp.arange(ptab.shape[1])[None, :] < pcnt[:, None])
                has_conn = conn.any(-1)
                conn_safe = conn | ~conn.any(-1, keepdims=True)
                sel = jax.random.categorical(
                    k3, jnp.where(conn_safe, 0.0, -jnp.inf), axis=-1
                )
                chosen = jnp.take_along_axis(
                    ptab, sel[:, None, None].repeat(2, 2), axis=1
                )[:, 0]                                   # [B, 2]
                add = go & has_conn
                newmem = member | (
                    add[:, None] & (
                        (jnp.arange(n)[None, :] == chosen[:, 0:1])
                        | (jnp.arange(n)[None, :] == chosen[:, 1:2])
                    )
                )
                budget2 = jnp.where(add, jnp.maximum(
                    budget_new - self.dist_vals[d2], 0), budget_new)
                stopped = stopped | ~go
                return newmem, budget2, stopped

            member, budget_new, _ = jax.lax.fori_loop(
                0, EXT_CAP, ext,
                (member, budget_new, jnp.zeros(B, bool)),
            )
            # random axes for members
            ax = jax.random.randint(ks[2], (B, n), 0, 3)
            x = member & ((ax == 0) | (ax == 1))
            z = member & ((ax == 2) | (ax == 1))
            cost = budget - budget_new
            # matches reference remaining_diff -= max(cost, 1), saturating
            budget_out = jnp.where(any_valid,
                                   budget - jnp.maximum(cost, 1), budget)
            budget_out = jnp.maximum(budget_out, 0)
            count_out = count + any_valid.astype(jnp.int32)
            return (budget_out, count_out), (
                pack_bits_lastdim(x & any_valid[:, None], self.Wn),
                pack_bits_lastdim(z & any_valid[:, None], self.Wn),
                any_valid,
            )

        keys = jax.random.split(key, self.RT)
        (_, _), (xs, zs, made) = jax.lax.scan(
            gen_one, (pauli_difficulty, jnp.zeros(B, jnp.int32)), keys
        )
        rx = jnp.moveaxis(xs, 0, 1)                    # uint32 [B, R, Wn]
        rz = jnp.moveaxis(zs, 0, 1)
        valid = jnp.moveaxis(made, 0, 1)               # [B, R]
        num_y = jnp.sum(jax.lax.population_count(rx & rz), axis=-1)
        rphase = (num_y % 4).astype(jnp.int8)
        return rx, rz, rphase, valid

    def _scramble_tableau(self, key, B, difficulty, idx_override=None):
        """70% CX / 15% H / 15% S row-op scramble (reference pauli.rs:220-271).

        `idx_override` (int32 [B, K], test hook): scramble-op indices into
        the op table — [0, n_scramble_cx) = CX(valid_pairs[i]),
        then n H ops, then n S ops; the last index is a no-op."""
        n = self.num_qubits
        ncx = self.n_scramble_cx
        noop = self.n_scramble - 1
        if idx_override is not None:
            idx = jnp.asarray(idx_override, jnp.int32)
            K = idx.shape[1]
        else:
            static_diff = isinstance(difficulty, (int, np.integer))
            K = int(difficulty) if static_diff else self.scramble_cap
            K = max(K, 1)  # zero-size sample arrays break fori; noop-mask
            #                difficulty 0 below instead
            k1, k2 = jax.random.split(key)
            r = jax.random.uniform(k1, (B, K))
            rq = jax.random.randint(k2, (B, K, 3), 0, 1 << 30)
            cx_idx = rq[:, :, 0] % max(len(self.valid_pairs), 1)
            h_idx = ncx + rq[:, :, 1] % n
            s_idx = ncx + n + rq[:, :, 2] % n
            idx = jnp.where(r > 0.3, cx_idx, jnp.where(r > 0.15, h_idx, s_idx))
            if len(self.valid_pairs) == 0:
                idx = jnp.full_like(idx, noop)
            if not static_diff:
                # difficulty may be a scalar or a per-lane [B] vector
                # (curriculum replay, rl/rollout.sample_difficulties)
                d = jnp.asarray(difficulty, jnp.int32)
                d = d[:, None] if d.ndim else d
                mask = jnp.arange(K)[None, :] < d
                idx = jnp.where(mask, idx, noop)
            elif int(difficulty) == 0:
                # spec parity: difficulty 0 resets to the identity tableau
                # (the K = max(K, 1) clamp would otherwise apply one op)
                idx = jnp.full_like(idx, noop)

        tab0 = jnp.tile(self.ident_pk[None], (B, 1))

        def body(i, tab):
            a = idx[:, i]
            return packed_apply_left(self.scU32[a], self.scS32[a], tab,
                                     self.W2, self.D2)

        return jax.lax.fori_loop(0, K, body, tab0)

    def reset(self, key, B, difficulty, scramble_override=None,
              rotations_override=None) -> PauliEnvState:
        state = self._fresh(B)
        k_rot, k_tab, k_perm = jax.random.split(key, 3)
        diff_arr = jnp.full((B,), jnp.asarray(difficulty, jnp.int32))
        pauli_difficulty = diff_arr // self.pauli_diff_scale

        if rotations_override is not None:
            # override carries UNPACKED x/z bits [B, RT, n] (test hook)
            rx, rz, rphase, valid = rotations_override
            rx = pack_bits_lastdim(jnp.asarray(rx), self.Wn)
            rz = pack_bits_lastdim(jnp.asarray(rz), self.Wn)
        else:
            rx, rz, rphase, valid = self._generate_rotations(
                k_rot, B, pauli_difficulty
            )
        anti = self._build_anti(rx, rz, valid)
        tab = self._scramble_tableau(k_tab, B, difficulty,
                                     idx_override=scramble_override)

        # initial trivial sweep (reference pauli.rs:575-576)
        active, _ = self._cleanup(rx, rz, valid, anti)
        perm_idx = jax.random.randint(k_perm, (B,), 0, self.num_perms)

        success = self._solved(tab, active)
        depth = jnp.minimum(
            self.depth_slope * jnp.asarray(difficulty, jnp.int32),
            self.max_depth,
        )
        return state._replace(
            tab=tab, rx=rx, rz=rz, rphase=rphase, active=active, anti=anti,
            perm_idx=perm_idx,
            depth=jnp.full((B,), depth, jnp.int32),
            success=success,
            reward=success.astype(jnp.float32),
        )

    # ------------------------------------------------------------- state io
    def set_state(self, tableaus: np.ndarray, rotation_labels) -> PauliEnvState:
        """Host-side: dense tableau(s) [B, 2n, 2n] + per-env rotation label
        lists -> device state. Mirrors reference set_state (no initial sweep,
        depth = max_depth)."""
        from qiskit_gym_tpu.quantum.pauli import Pauli

        tableaus = np.asarray(tableaus)
        if tableaus.ndim == 2:
            tableaus = tableaus[None]
        B = tableaus.shape[0]
        n = self.num_qubits
        state = self._fresh(B)
        tab = np.tile(np.eye(self.D2, dtype=np.uint8), (B, 1, 1))
        tab[:, : self.dim, : self.dim] = (tableaus != 0).astype(np.uint8)
        tab = pack_rows(tab, self.W2).reshape(B, self.L2)

        rx = np.zeros((B, self.RT, n), np.int8)
        rz = np.zeros((B, self.RT, n), np.int8)
        ph = np.zeros((B, self.RT), np.int8)
        valid = np.zeros((B, self.RT), bool)
        for b, labels in enumerate(rotation_labels):
            for i, lab in enumerate(labels[: self.R]):
                p = Pauli.from_label(lab)
                rx[b, i] = p.x
                rz[b, i] = p.z
                ph[b, i] = p.phase
                valid[b, i] = True

        rx_j = jnp.asarray(pack_bits_np(rx, self.Wn))
        rz_j = jnp.asarray(pack_bits_np(rz, self.Wn))
        valid_j = jnp.asarray(valid)
        anti = self._build_anti(rx_j, rz_j, valid_j)
        tab_j = jnp.asarray(tab)
        success = self._solved(tab_j, valid_j)
        return state._replace(
            tab=tab_j, rx=rx_j, rz=rz_j, rphase=jnp.asarray(ph),
            active=valid_j, anti=anti,
            depth=jnp.full(B, self.max_depth, jnp.int32),
            success=success,
            reward=success.astype(jnp.float32),
        )

    # -------------------------------------------------------------- observe
    def dense(self, state: PauliEnvState) -> jnp.ndarray:
        """uint8 [B, 2n, 2n + R]: permuted tableau block + active rotation
        columns compacted left (reference pad_and_collect + apply_perm_to_obs)."""
        n = self.num_qubits
        B = state.batch
        tab = unpack_rows(state.tab, self.W2, self.D2, self.dim)[
            :, :, : self.dim].astype(jnp.int8)
        # rotation columns [B, 2n, R] from the packed bits
        rx_b = unpack_bits_lastdim(state.rx, n)          # [B, R, n]
        rz_b = unpack_bits_lastdim(state.rz, n)
        cols = jnp.concatenate(
            [jnp.swapaxes(rx_b, 1, 2), jnp.swapaxes(rz_b, 1, 2)], axis=1
        )
        active = state.active
        # stable left-compaction of active columns: sel[r, dst] one-hot
        pos = jnp.cumsum(active.astype(jnp.int32), axis=-1) - 1       # [B, R]
        dst = jnp.arange(self.R)
        sel = (pos[:, :, None] == dst[None, None, :]) & active[:, :, None]
        cols = jax.lax.dot_general(
            cols.astype(jnp.int32), sel.astype(jnp.int32),
            (((2,), (1,)), ((0,), (0,))),
        ).astype(jnp.int8)                               # [B, 2n, R]

        # automorphism: rows of everything, columns of the tableau only.
        # Gatesets with a trivial automorphism group (e.g. 27q heavy-hex)
        # have exactly one (identity) perm — skip the three GEMMs entirely
        if self.num_perms == 1 and self.qubit_perms[0] == list(range(n)):
            return jnp.concatenate([tab, cols], axis=2).astype(jnp.uint8)
        P = self.perm_mats[state.perm_idx][:, : self.dim, : self.dim]
        tab_p = jax.lax.dot_general(
            P.astype(jnp.int32), tab.astype(jnp.int32),
            (((2,), (1,)), ((0,), (0,))),
        )
        tab_p = jax.lax.dot_general(
            tab_p, jnp.swapaxes(P, 1, 2).astype(jnp.int32),
            (((2,), (1,)), ((0,), (0,))),
        ).astype(jnp.int8)
        cols_p = jax.lax.dot_general(
            P.astype(jnp.int32), cols.astype(jnp.int32),
            (((2,), (1,)), ((0,), (0,))),
        ).astype(jnp.int8)
        return jnp.concatenate([tab_p, cols_p], axis=2).astype(jnp.uint8)

    def observe(self, state: PauliEnvState, dtype=jnp.float32) -> jnp.ndarray:
        return self.dense(state).astype(dtype)

    def masks(self, state: PauliEnvState) -> jnp.ndarray:
        return jnp.broadcast_to(
            (~state.success)[:, None], (state.batch, self.num_actions)
        )

    def is_final(self, state: PauliEnvState) -> jnp.ndarray:
        return (state.depth == 0) | state.success
