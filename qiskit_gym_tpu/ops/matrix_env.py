"""Batched GF(2) matrix envs (Permutation, LinearFunction, Clifford) on device.

One core implements all three families — they differ only in matrix dimension
and gate matrices (permutation: n x n one-hot rows, SWAP = row swap;
linear: n x n, CX = row XOR; clifford: 2n x 2n phase-less symplectic;
reference semantics rust/src/envs/{permutation,linear_function,clifford}.rs).

TPU-first design (measured on v5e — see bench.py and docs/PERF.md):
- Two state representations, chosen by matrix size:
  * dim < 32: DENSE int8 [B, D, D] (D = dim padded to a multiple of 8,
    identity in the padding block). The rank-2 form G = I xor U S applies as
    one-hot masked sums + XOR — pure VPU traffic, no per-env gathers
    (lane-hostile, 60x slower) and no batched GEMM (MXU-setup-bound here).
  * dim >= 32: BITPACKED uint32, flat [B, W*dim] (rows packed 32-per-word,
    columns as lanes). Source-row extraction is popcount-parity over the
    word groups; the inverse's column combos are lane XOR-reduces. 8-16x
    less physical state — measured 1.4x (27q) to 3.6x (127q) faster on
    clifford; the dense path stays faster below the crossover.
- Every gate here is an involution on the phase-less state (G^-1 = G), so the
  tracked inverse updates by RIGHT-multiplying the same terms:
  (G M)^-1 = M^-1 G. The reference's 50%-per-step random state inversion
  (rust maybe_random_invert) is then just a buffer swap — the O(dim^3)
  Gauss-Jordan never runs inside an episode.
- Metrics use one-hot selects (no scatters) and running-max layer counters
  (layer sets are provably dense; spec/metrics.py).
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from qiskit_gym_tpu.quantum.linear import gf2_inverse
from qiskit_gym_tpu.spec.gates import Gate, parse_gateset
from qiskit_gym_tpu.spec.metrics import MetricsWeights

from .tables import MT_1Q, MT_CX, MT_CZ, MT_SWAP, MetricsTables


def _pad_dim(dim: int, multiple: int = 8) -> int:
    return max(((dim + multiple - 1) // multiple) * multiple, multiple)


def _gate_terms(gate: Gate, num_qubits: int, kind: str):
    """The gate's GF(2) action as <= 2 elementary terms:
    ("x", d, s) = row d ^= row s; ("s", r1, r2) = swap rows r1, r2.

    Row-op semantics per family (phase-less):
      permutation: SWAP(a,b) swaps rows a,b; 1q gates identity.
      linear:      CX(c,t): row t ^= row c; SWAP swaps rows.
      clifford:    H swap(q, n+q); S: n+q ^= q; SX: q ^= n+q;
                   CX(c,t): t ^= c, n+c ^= n+t; CZ(a,b): n+a ^= b, n+b ^= a;
                   SWAP: both row pairs.
    """
    n = num_qubits
    terms = []
    name, qs = gate

    def xor(d, s):
        terms.append(("x", d, s))

    def swap(r1, r2):
        terms.append(("s", r1, r2))

    if kind == "permutation":
        if name == "SWAP":
            swap(qs[0], qs[1])
    elif kind == "linear":
        if name == "CX":
            xor(qs[1], qs[0])
        elif name == "SWAP":
            swap(qs[0], qs[1])
    elif kind == "clifford":
        if name == "H":
            swap(qs[0], n + qs[0])
        elif name in ("S", "Sdg"):
            xor(n + qs[0], qs[0])
        elif name in ("SX", "SXdg"):
            xor(qs[0], n + qs[0])
        elif name == "CX":
            c, t = qs
            xor(t, c)
            xor(n + c, n + t)
        elif name == "CZ":
            a, b = qs
            xor(n + a, b)
            xor(n + b, a)
        elif name == "SWAP":
            a, b = qs
            swap(a, b)
            swap(n + a, n + b)
    else:
        raise ValueError(f"Unknown env kind {kind!r}")
    return terms


def gate_matrix(gate: Gate, num_qubits: int, kind: str, D: int) -> np.ndarray:
    """The gate's left-multiplication matrix over GF(2), padded to D x D."""
    G = np.eye(D, dtype=np.uint8)
    for tt, i, j in _gate_terms(gate, num_qubits, kind):
        if tt == "x":
            G[i] ^= np.eye(D, dtype=np.uint8)[j]
        else:
            G[[i, j]] = G[[j, i]]
    return G


def gf2_factor(M: np.ndarray):
    """GF(2) rank factorization M = U @ S (mod 2), numpy, construction-time.

    S is a subset of M's rows (a row basis); U holds each row's coefficients
    in that basis. Used to turn arbitrary sparse gate matrices G into
    I xor U S form for the VPU masked-sum step (rank = rank of G xor I,
    <= 2 for every gate family here)."""
    M = (np.asarray(M) % 2).astype(np.uint8)
    D = M.shape[0]
    ech, coeffs, chosen = [], [], []
    U = np.zeros((D, D), np.uint8)
    for i in range(D):
        v = M[i].copy()
        c = np.zeros(D, np.uint8)
        c[i] = 1
        # reduce until stable (rows are kept in insertion order, not pivot
        # order; each XOR clears v's bit at that row's first set bit and only
        # touches later bits, so v strictly decreases and this terminates)
        changed = True
        while changed:
            changed = False
            for e, ce in zip(ech, coeffs):
                p = int(np.argmax(e))
                if v[p]:
                    v ^= e
                    c ^= ce
                    changed = True
        if v.any():
            ech.append(v)
            coeffs.append(c)
            chosen.append(i)
            U[i, i] = 1
        else:
            # M[i] = sum of chosen rows j with c[j] = 1 (j != i)
            c[i] = 0
            U[i] = c
    r = len(chosen)
    S = M[chosen] if r else np.zeros((0, D), np.uint8)
    Uc = U[:, chosen] if r else np.zeros((D, 0), np.uint8)
    assert np.array_equal((Uc.astype(np.int64) @ S) % 2, M)
    return Uc, S


def gate_rank2_terms(gate: Gate, num_qubits: int, kind: str, D: int):
    """Decompose the gate's GF(2) matrix as G = I xor U S (U: [D, 2] dest
    one-hot combos, S: [2, D] source selectors); used by the Pallas kernel.

    A row-XOR `d ^= s` is (e_d, e_s); a row swap (r1, r2) is
    (e_r1+e_r2, e_r1+e_r2).
    """
    U = np.zeros((D, 2), np.int8)
    S = np.zeros((2, D), np.int8)
    for k, (tt, i, j) in enumerate(_gate_terms(gate, num_qubits, kind)):
        if tt == "x":
            U[i, k] = 1
            S[k, j] = 1
        else:
            U[i, k] = U[j, k] = 1
            S[k, i] = S[k, j] = 1
    return U, S


_FULL32 = np.uint32(0xFFFFFFFF)


def pack_rows(M: np.ndarray, W: int) -> np.ndarray:
    """[*, D, D] 0/1 -> [*, W, D] uint32; bit i of word g = row 32g + i."""
    M = np.asarray(M)
    out = np.zeros(M.shape[:-2] + (W, M.shape[-1]), np.uint32)
    for d in range(M.shape[-2]):
        out[..., d // 32, :] |= (M[..., d, :].astype(np.uint32) & 1) << (d % 32)
    return out


def pack_term_tables(Us, Ss, D: int):
    """Stacked rank-term tables (lists of U [D, K], S [K, D] 0/1 per action)
    -> packed forms for the bitpacked kernels: U32/S32 [A, K, W] uint32 word
    masks over rows, Ulm/Slm [A, K, D] uint32 full-lane masks."""
    A = len(Us)
    K = max(u.shape[1] for u in Us)
    W = (D + 31) // 32
    U32 = np.zeros((A, K, W), np.uint32)
    S32 = np.zeros((A, K, W), np.uint32)
    Ulm = np.zeros((A, K, D), np.uint32)
    Slm = np.zeros((A, K, D), np.uint32)
    for ai, (U, S) in enumerate(zip(Us, Ss)):
        for kk in range(U.shape[1]):
            for d in range(D):
                if U[d, kk]:
                    U32[ai, kk, d // 32] |= np.uint32(1) << (d % 32)
                    Ulm[ai, kk, d] = _FULL32
                if S[kk, d]:
                    S32[ai, kk, d // 32] |= np.uint32(1) << (d % 32)
                    Slm[ai, kk, d] = _FULL32
    return U32, S32, Ulm, Slm


def packed_apply_left(U32, S32, a, W: int, D: int):
    """a' = (I xor U S) a on bitpacked state a [B, W*D] uint32.

    Per term k: the source-row combination is the popcount-parity of the
    masked word groups; the result XORs into the destination rows via a
    broadcast word mask. U32/S32 are the per-env gathered [B, K, W] tables."""
    B = a.shape[0]
    a3 = a.reshape(B, W, D)
    acc = None
    for k in range(U32.shape[1]):
        pc = jax.lax.population_count(a3 & S32[:, k, :, None])
        r = (jnp.sum(pc, axis=1) & 1).astype(jnp.uint32)           # [B, D]
        rm = jnp.where(r != 0, _FULL32, np.uint32(0))
        term = U32[:, k, :, None] & rm[:, None, :]
        acc = term if acc is None else acc ^ term
    if acc is None:  # rank-0 tables: identity update
        return a
    return (a3 ^ acc).reshape(B, W * D)


def unpack_rows(a, W: int, D: int, rows: int):
    """Bitpacked [B, W*D] uint32 -> dense uint8 [B, rows, D]."""
    B = a.shape[0]
    a3 = a.reshape(B, W, D)
    bits = (a3[:, :, None, :] >> jnp.arange(
        32, dtype=jnp.uint32)[None, None, :, None]) & 1
    return bits.reshape(B, W * 32, D)[:, :rows, :].astype(jnp.uint8)


def packed_apply_right(Ulm, Slm, m, W: int, D: int):
    """m' = m (I xor U S) on bitpacked state m [B, W*D] uint32: column
    combos via lane XOR-reduce, scattered back through the S lane masks."""
    B = m.shape[0]
    m3 = m.reshape(B, W, D)
    acc = None
    for k in range(Ulm.shape[1]):
        c = jax.lax.reduce(m3 & Ulm[:, k, None, :], np.uint32(0),
                           jax.lax.bitwise_xor, (2,))              # [B, W]
        term = c[:, :, None] & Slm[:, k, None, :]
        acc = term if acc is None else acc ^ term
    if acc is None:  # rank-0 tables: identity update
        return m
    return (m3 ^ acc).reshape(B, W * D)


def rank_terms_apply_left(U, S, a):
    """a' = (I xor U S) a over GF(2) in VPU masked-sum form.

    U [B, D, K] int8 destination combos, S [B, K, D] int8 source selectors,
    a [B, D, D] int8. Each term extracts one source-row combination with a
    one-hot masked sum over sublanes and XORs it into the destination rows
    via broadcast AND — no gathers, no MXU."""
    K = U.shape[-1]
    acc = None
    for k in range(K):
        r = (jnp.sum(S[:, k, :, None] * a, axis=1) & 1).astype(jnp.int8)
        t = U[:, :, k, None] & r[:, None, :]
        acc = t if acc is None else acc ^ t
    return a if acc is None else a ^ acc


def rank_terms_apply_right(U, S, m):
    """m' = m (I xor U S) over GF(2); mirrors rank_terms_apply_left along
    the lane axis (column extraction, row-selector broadcast)."""
    K = U.shape[-1]
    acc = None
    for k in range(K):
        c = (jnp.sum(m * U[:, None, :, k], axis=2) & 1).astype(jnp.int8)
        t = c[:, :, None] & S[:, k, None, :]
        acc = t if acc is None else acc ^ t
    return m if acc is None else m ^ acc


class MatrixEnvState(NamedTuple):
    a: jnp.ndarray         # int8 [B, D, D]   current matrix
    ainv: jnp.ndarray      # int8 [B, D, D]   its inverse
    depth: jnp.ndarray     # int32  [B]
    success: jnp.ndarray   # bool   [B]
    reward: jnp.ndarray    # float32[B]
    inverted: jnp.ndarray  # bool   [B]
    last_g: jnp.ndarray    # int32  [B, n]    per-qubit last gate layer
    last_c: jnp.ndarray    # int32  [B, n]    per-qubit last CX layer
    max_g: jnp.ndarray     # int32  [B]
    max_c: jnp.ndarray     # int32  [B]
    n_cnots: jnp.ndarray   # int32  [B]
    n_gates: jnp.ndarray   # int32  [B]

    @property
    def batch(self) -> int:
        return self.a.shape[0]


class MatrixEnvCore:
    """Static config + pure batched kernels for one env family instance."""

    def __init__(
        self,
        num_qubits: int,
        gateset: Sequence,
        kind: str,                      # 'permutation' | 'linear' | 'clifford'
        depth_slope: int = 2,
        max_depth: int = 128,
        metrics_weights: Optional[dict] = None,
        add_inverts: bool = True,
        scramble_cap: int = 256,
        bitpack: Optional[bool] = None,  # default: True (measured, docs/PERF.md)
    ):
        assert kind in ("permutation", "linear", "clifford")
        self.kind = kind
        self.num_qubits = int(num_qubits)
        self.gateset = parse_gateset(gateset)
        self.dim = 2 * self.num_qubits if kind == "clifford" else self.num_qubits
        self.D = _pad_dim(self.dim)
        self.depth_slope = int(depth_slope)
        self.max_depth = int(max_depth)
        self.add_inverts = bool(add_inverts)
        self.scramble_cap = int(scramble_cap)
        _w = MetricsWeights.from_dict(metrics_weights).as_array()
        self.weights = jnp.asarray(_w)
        self.weights_static = tuple(float(x) for x in _w)
        # Layer (circuit-depth) tracking is reward-relevant only when either
        # layer weight is nonzero; the reference defaults zero both
        # (metrics.rs:157-166), so the default-config hot step skips the
        # one-hot running-max machinery entirely and last_g/last_c/max_g/
        # max_c stay frozen at -1 (docs/PERF.md "metrics floor"). Flip this
        # attribute back on to assert layer fields against the spec twin.
        self.track_layers = (self.weights_static[1] != 0.0
                             or self.weights_static[2] != 0.0)

        # rank-2 term tables: every gate is G = I xor U S with U [D, 2] dest
        # one-hot combos and S [2, D] source selectors; index A (one past the
        # end) is the all-zero no-op used for masked scramble steps. The
        # bitpacked uint32 representation is the default at every dim since
        # the consolidated-gather step made the update bandwidth-bound:
        # measured 1.08-2.2x over dense int8 from dim 5 through dim 54
        # (docs/PERF.md for the full history; dense kept as the spec-shaped
        # fallback via bitpack=False).
        self.bitpack = True if bitpack is None else bool(bitpack)
        Dr = self.dim if self.bitpack else self.D   # packed rep needs no pad
        Us, Ss = [], []
        for g in self.gateset:
            U, S = gate_rank2_terms(g, self.num_qubits, kind, Dr)
            G = gate_matrix(g, self.num_qubits, kind, Dr)
            G2 = (np.eye(Dr, dtype=np.int64) + U.astype(np.int64) @ S) % 2
            assert np.array_equal(G, G2), (
                f"rank-2 terms disagree with sequential row-ops for {g}")
            Us.append(U)
            Ss.append(S)
        Us.append(np.zeros((Dr, 2), np.int8))
        Ss.append(np.zeros((2, Dr), np.int8))
        if self.bitpack:
            self.W = (Dr + 31) // 32
            self.L = self.W * Dr
            U32, S32, Ulm, Slm = pack_term_tables(Us, Ss, Dr)
            self.U32 = jnp.asarray(U32)                 # [A+1, 2, W]
            self.S32 = jnp.asarray(S32)
            self.Ulm = jnp.asarray(Ulm)                 # [A+1, 2, D] masks
            self.Slm = jnp.asarray(Slm)
            I = np.eye(Dr, dtype=np.uint8)
            self.ident_pk = jnp.asarray(pack_rows(I, self.W).reshape(self.L))
        else:
            self.Ug = jnp.asarray(np.stack(Us))         # [A+1, D, 2]
            self.Sg = jnp.asarray(np.stack(Ss))         # [A+1, 2, D]
        mt = MetricsTables.build(self.gateset)
        # identity action is metrics-neutral: type 1Q on a dummy qubit slot
        self.mtype = jnp.asarray(np.concatenate([mt.mtype, [MT_1Q]]))
        self.mq1 = jnp.asarray(np.concatenate([mt.q1, [0]]))
        self.mq2 = jnp.asarray(np.concatenate([mt.q2, [0]]))
        self.ident = jnp.asarray(np.eye(self.D, dtype=np.int8))
        self.noop_action = len(self.gateset)
        self._build_fat_table()

    # ------------------------------------------------- consolidated gather
    # A per-action table gather costs ~110-145 us/step at B=32k REGARDLESS
    # of width (fixed dispatch cost); the original step did 7 of them
    # (mtype/q1/q2 + U/S term tables x2 directions). One fat f32 table
    # gathered ONCE per step and decoded with cheap bit ops removes ~all of
    # it (clifford metrics+update profile: 1906 -> see docs/PERF.md). Every
    # column is exactly representable in f32: gate-table words are stored
    # as 4 bytes (<= 255) and lane masks as 0/1 bits.

    def _build_fat_table(self):
        A1 = self.num_actions + 1
        mt = np.asarray(self.mtype, np.float32)
        q1 = np.asarray(self.mq1, np.float32)
        q2 = np.asarray(self.mq2, np.float32)
        cols = [mt, q1, q2]
        if self.bitpack:
            K, W, Dr = self.U32.shape[1], self.W, self.dim
            for T in (np.asarray(self.U32), np.asarray(self.S32)):
                for k in range(K):
                    for w in range(W):
                        for byte in range(4):
                            cols.append(
                                ((T[:, k, w] >> (8 * byte)) & 0xFF
                                 ).astype(np.float32))
            if self.add_inverts:
                for T in (np.asarray(self.Ulm), np.asarray(self.Slm)):
                    for k in range(K):
                        for d in range(Dr):
                            cols.append((T[:, k, d] != 0).astype(np.float32))
            self._fat_K, self._fat_W, self._fat_Dr = K, W, Dr
        else:
            Ug = np.asarray(self.Ug, np.float32)   # [A1, D, K]
            Sg = np.asarray(self.Sg, np.float32)   # [A1, K, D]
            D, K = Ug.shape[1], Ug.shape[2]
            cols.append(Ug.reshape(A1, D * K).T)
            cols.append(Sg.reshape(A1, K * D).T)
            self._fat_K, self._fat_D = K, D
        self.fat_tab = jnp.asarray(
            np.concatenate([np.atleast_2d(c) for c in cols], axis=0).T
        )  # [A1, F]

    def _decode_action_tables(self, action):
        """One gather from the consolidated table -> all per-action operands:
        (mtype, q1, q2, gate_terms) where gate_terms is (U32, S32, Ulm, Slm)
        packed or (Ug, Sg) dense."""
        vals = self.fat_tab[action]                       # [B, F]
        mtype = vals[:, 0].astype(jnp.int32)
        q1 = vals[:, 1].astype(jnp.int32)
        q2 = vals[:, 2].astype(jnp.int32)
        o = 3
        B = action.shape[0]
        if self.bitpack:
            K, W, Dr = self._fat_K, self._fat_W, self._fat_Dr
            nb = K * W * 4

            def words(block):
                b = block.astype(jnp.uint32).reshape(B, K, W, 4)
                return (b[..., 0] | (b[..., 1] << 8)
                        | (b[..., 2] << 16) | (b[..., 3] << 24))

            U32 = words(vals[:, o:o + nb]); o += nb
            S32 = words(vals[:, o:o + nb]); o += nb
            if self.add_inverts:
                nm = K * Dr
                Ulm = jnp.where(vals[:, o:o + nm].reshape(B, K, Dr) != 0,
                                _FULL32, np.uint32(0)); o += nm
                Slm = jnp.where(vals[:, o:o + nm].reshape(B, K, Dr) != 0,
                                _FULL32, np.uint32(0)); o += nm
            else:
                Ulm = Slm = None
            terms = (U32, S32, Ulm, Slm)
        else:
            K, D = self._fat_K, self._fat_D
            Ug = vals[:, o:o + D * K].reshape(B, D, K).astype(jnp.int8)
            o += D * K
            Sg = vals[:, o:o + K * D].reshape(B, K, D).astype(jnp.int8)
            terms = (Ug, Sg)
        return mtype, q1, q2, terms

    # ------------------------------------------------------------ properties
    @property
    def num_actions(self) -> int:
        return len(self.gateset)

    @property
    def obs_shape(self) -> Tuple[int, int]:
        return (self.dim, self.dim)

    # ------------------------------------------------------- matrix updates
    def apply_gates(self, a, ainv, action):
        """One batched step via the rank-2 form G = I xor U S.

        Dense path — left-mult a' = a ^ U (S a): the two source rows are
        extracted with one-hot masked sums over the sublane axis (no per-env
        gathers — those are lane-hostile on TPU) and XORed into the
        destination rows via broadcast AND. Right-mult
        ainv' = ainv ^ (ainv U) S mirrors it along the lane axis. Pure VPU
        elementwise + reduction work; measured ~30-40% faster than the
        per-action gate-matrix batched GEMM at D in [32, 56] (docs/PERF.md).

        Bitpacked path — same math on [B, W*D] uint32: source-row combos via
        popcount-parity over the word groups, inverse column combos via lane
        XOR-reduce, updates as broadcast AND-masks + XOR."""
        _, _, _, terms = self._decode_action_tables(action)
        return self._apply_gates_terms(a, ainv, terms)

    def _apply_gates_terms(self, a, ainv, terms):
        """apply_gates on pre-decoded per-env term tables (one fat gather
        upstream instead of 2-4 separate table gathers)."""
        if self.bitpack:
            U32, S32, Ulm, Slm = terms
            new_a = packed_apply_left(U32, S32, a, self.W, self.dim)
            if not self.add_inverts:
                return new_a, ainv
            new_ainv = packed_apply_right(Ulm, Slm, ainv, self.W, self.dim)
            return new_a, new_ainv
        U, S = terms             # [B, D, K], [B, K, D] int8
        new_a = rank_terms_apply_left(U, S, a)
        if not self.add_inverts:
            # the inverse buffer is only consumed by the random-inversion
            # swap; don't touch it when the feature is off
            return new_a, ainv
        new_ainv = rank_terms_apply_right(U, S, ainv)
        return new_a, new_ainv

    def _solved(self, a) -> jnp.ndarray:
        if self.bitpack:
            return jnp.all(a == self.ident_pk[None], axis=1)
        return jnp.all(a == self.ident[None], axis=(1, 2))

    # -------------------------------------------------------------- metrics
    # The fused Pallas metrics kernel (ops/pallas_metrics.py) is equivalence-
    # tested but DISABLED by default: measured SLOWER than the XLA lowering
    # (custom-call dispatch dominates at [B, n]-sized operands; docs/PERF.md).
    use_pallas_metrics: bool = False

    # Whole-step fused Mosaic kernel (ops/pallas_fused.py): one kernel per
    # step covering decode + GF(2) updates + metrics + swap + solved +
    # reward. Bitpacked path only; off until hardware measurement says it
    # beats the XLA lowering (docs/PERF.md). Opt in per instance or via
    # QGT_PALLAS_STEP=1.
    use_pallas_step: bool = os.environ.get("QGT_PALLAS_STEP", "") == "1"

    def _metrics_update(self, state: MatrixEnvState, action):
        if self.use_pallas_metrics:
            from .pallas_metrics import metrics_update_pallas

            scal = jnp.stack([
                state.max_g, state.max_c, state.n_cnots, state.n_gates,
                self.mtype[action], self.mq1[action], self.mq2[action],
                (action == self.noop_action).astype(jnp.int32),
            ], axis=1)
            g, c, s, pen = metrics_update_pallas(
                state.last_g, state.last_c, scal, self.weights_static
            )
            return state._replace(
                last_g=g, last_c=c, max_g=s[:, 0], max_c=s[:, 1],
                n_cnots=s[:, 2], n_gates=s[:, 3],
            ), pen
        return self._metrics_update_xla(state, action)

    def _metrics_update_xla(self, state: MatrixEnvState, action):
        mtype, q1, q2, _ = self._decode_action_tables(action)
        noop = action == self.noop_action
        return self._metrics_update_terms(state, mtype, q1, q2, noop)

    def _metrics_update_terms(self, state, mtype, q1, q2, noop):
        is1q = mtype == MT_1Q
        iscx = mtype == MT_CX
        iscz = mtype == MT_CZ
        issw = mtype == MT_SWAP

        if not self.track_layers:
            # both layer weights are zero (the reference default): the gate
            # and cnot counters are the only reward-relevant metrics, and
            # they are pure decoded-table arithmetic — no [n, B] running-max
            # work at all. Layer fields stay frozen at their reset value.
            d_gates = jnp.where(noop, 0, jnp.where(is1q | iscx, 1, 3))
            d_cnots = jnp.where(is1q | noop, 0, jnp.where(issw, 3, 1))
            penalty = (
                self.weights[0] * d_cnots.astype(jnp.float32)
                + self.weights[3] * d_gates.astype(jnp.float32)
            )
            return state._replace(
                n_cnots=state.n_cnots + d_cnots,
                n_gates=state.n_gates + d_gates,
            ), penalty

        # The per-qubit layer arrays are processed B-MINOR ([n, B], envs on
        # the 128-lane axis): a [B, n] op at n=27 pads the minor dim to 128
        # lanes, wasting ~4.7x of both the vector registers and the memory
        # traffic. State stays B-major (rollout tree ops assume batch on
        # axis 0); transpose in and out here.
        n = self.num_qubits
        qid = jnp.arange(n, dtype=jnp.int32)[:, None]  # [n, 1]
        oh1 = q1[None, :] == qid                       # [n, B]
        oh2 = q2[None, :] == qid
        lgT = state.last_g.T                           # [n, B]
        lcT = state.last_c.T

        # one-hot masked-max reductions instead of per-lane gathers (last_*
        # can be -1, so mask with a large negative instead of 0)
        neg = jnp.int32(-(2 ** 30))
        lg1 = jnp.max(jnp.where(oh1, lgT, neg), axis=0)
        lg2 = jnp.max(jnp.where(oh2, lgT, neg), axis=0)
        lc1 = jnp.max(jnp.where(oh1, lcT, neg), axis=0)
        lc2 = jnp.max(jnp.where(oh2, lcT, neg), axis=0)

        m_cx = jnp.maximum(lg1, lg2) + 1
        m_sw = jnp.maximum(lg1, lg2) + 3
        m_cz = jnp.maximum(lg1, lg2 + 1) + 1
        v1 = jnp.where(is1q, lg1 + 1,
             jnp.where(iscx, m_cx,
             jnp.where(issw, m_sw, m_cz)))
        v2 = jnp.where(is1q, lg1 + 1,
             jnp.where(iscx, m_cx,
             jnp.where(issw, m_sw, m_cz + 1)))
        v1 = jnp.where(noop, lg1, v1)
        v2 = jnp.where(noop, lg2, v2)
        new_last_g = jnp.where(oh2, v2[None, :],
                     jnp.where(oh1, v1[None, :], lgT)).T

        c_inc = jnp.where(issw, 3, 1)
        c_new = jnp.maximum(lc1, lc2) + c_inc
        has_cx = (~is1q) & (~noop)
        w1 = jnp.where(has_cx, c_new, lc1)
        w2 = jnp.where(has_cx, c_new, lc2)
        new_last_c = jnp.where(oh2, w2[None, :],
                     jnp.where(oh1, w1[None, :], lcT)).T

        new_max_g = jnp.maximum(state.max_g, jnp.maximum(v1, v2))
        new_max_c = jnp.maximum(state.max_c, jnp.maximum(w1, w2))

        d_gates = jnp.where(noop, 0, jnp.where(is1q | iscx, 1, 3))
        d_cnots = jnp.where(is1q | noop, 0, jnp.where(issw, 3, 1))
        d_layers = new_max_g - state.max_g
        d_layers_c = new_max_c - state.max_c

        penalty = (
            self.weights[0] * d_cnots.astype(jnp.float32)
            + self.weights[1] * d_layers_c.astype(jnp.float32)
            + self.weights[2] * d_layers.astype(jnp.float32)
            + self.weights[3] * d_gates.astype(jnp.float32)
        )
        return state._replace(
            last_g=new_last_g,
            last_c=new_last_c,
            max_g=new_max_g,
            max_c=new_max_c,
            n_cnots=state.n_cnots + d_cnots,
            n_gates=state.n_gates + d_gates,
        ), penalty

    # ----------------------------------------------------------------- step
    def step(
        self,
        state: MatrixEnvState,
        action: jnp.ndarray,
        key: jax.Array,
        invert_override: Optional[jnp.ndarray] = None,
        actual_override: Optional[jnp.ndarray] = None,  # unused; API
        #   uniformity with PauliEnvCore (matrix envs have no internal perms)
    ) -> MatrixEnvState:
        """One batched env step. `key` is consumed for the inversion coin-flip;
        `invert_override` (bool [B]) injects the flips for trace tests."""
        if self.use_pallas_step and self.bitpack and self.add_inverts:
            # whole-step fused Mosaic kernel (ops/pallas_fused.py): RNG
            # stays out here so traces match the XLA path bit-for-bit
            from .pallas_fused import fused_step

            if invert_override is None:
                flip = jax.random.bernoulli(key, 0.5, (state.batch,))
            else:
                flip = invert_override
            return fused_step(self, state, action, flip)
        if self.use_pallas_metrics:
            state, penalty = self._metrics_update(state, action)
            new_a, new_ainv = self.apply_gates(state.a, state.ainv, action)
        else:
            # ONE consolidated table gather feeds metrics AND gate terms
            mtype, q1, q2, terms = self._decode_action_tables(action)
            noop = action == self.noop_action
            state, penalty = self._metrics_update_terms(
                state, mtype, q1, q2, noop)
            new_a, new_ainv = self._apply_gates_terms(
                state.a, state.ainv, terms)

        if self.add_inverts:
            if invert_override is None:
                flip = jax.random.bernoulli(key, 0.5, (state.batch,))
            else:
                flip = invert_override
            f3 = flip.reshape(flip.shape + (1,) * (new_a.ndim - 1))
            new_a, new_ainv = (
                jnp.where(f3, new_ainv, new_a),
                jnp.where(f3, new_a, new_ainv),
            )
            inverted = state.inverted ^ flip
        else:
            inverted = state.inverted

        depth = jnp.maximum(state.depth - 1, 0)
        success = self._solved(new_a)
        reward = jnp.where(success, 1.0, 0.0).astype(jnp.float32) - penalty
        return state._replace(
            a=new_a, ainv=new_ainv, depth=depth, success=success,
            reward=reward, inverted=inverted,
        )

    # ---------------------------------------------------------------- reset
    def _fresh(self, B: int) -> MatrixEnvState:
        n = self.num_qubits
        if self.bitpack:
            ident = jnp.tile(self.ident_pk[None], (B, 1))
        else:
            ident = jnp.tile(self.ident[None], (B, 1, 1))
        return MatrixEnvState(
            a=ident,
            ainv=ident,
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

    def reset(
        self,
        key: jax.Array,
        B: int,
        difficulty,
        scramble_override: Optional[jnp.ndarray] = None,
    ) -> MatrixEnvState:
        """Scramble identity with `difficulty` random gateset actions per env.

        The scramble loop bound must be static for fast TPU compilation: a
        concrete int difficulty loops exactly that many times; a traced
        difficulty loops `scramble_cap` times with no-op actions beyond
        `difficulty`. `scramble_override` (int32 [B, K]) injects the actions
        (entries >= num_actions are no-ops)."""
        state = self._fresh(B)

        if scramble_override is not None:
            K = scramble_override.shape[1]

            def body(i, mats):
                a, ainv = mats
                act = scramble_override[:, i]
                act = jnp.where(act < self.num_actions, act, self.noop_action)
                return self.apply_gates(a, ainv, act)

            a, ainv = jax.lax.fori_loop(0, K, body, (state.a, state.ainv))
        else:
            static_diff = isinstance(difficulty, (int, np.integer))
            K = int(difficulty) if static_diff else self.scramble_cap
            acts = jax.random.randint(key, (B, max(K, 1)), 0, self.num_actions)
            if not static_diff:
                # difficulty may be a scalar or a per-lane [B] vector
                # (curriculum replay, rl/rollout.sample_difficulties)
                d = jnp.asarray(difficulty, jnp.int32)
                d = d[:, None] if d.ndim else d
                mask = jnp.arange(K)[None, :] < d
                acts = jnp.where(mask, acts, self.noop_action)

            def body(i, mats):
                a, ainv = mats
                return self.apply_gates(a, ainv, acts[:, i])

            a, ainv = jax.lax.fori_loop(0, K, body, (state.a, state.ainv))

        success = self._solved(a)
        depth = jnp.minimum(
            self.depth_slope * jnp.asarray(difficulty, jnp.int32), self.max_depth
        )
        return state._replace(
            a=a, ainv=ainv,
            depth=jnp.full((B,), depth, jnp.int32),
            success=success,
            reward=success.astype(jnp.float32),
        )

    # ------------------------------------------------------------- state io
    def _pad(self, dense: np.ndarray) -> np.ndarray:
        B = dense.shape[0]
        out = np.tile(np.eye(self.D, dtype=np.int8), (B, 1, 1))
        out[:, : self.dim, : self.dim] = dense
        return out

    def set_state(self, dense: np.ndarray) -> MatrixEnvState:
        """Host-side: dense uint8/bool [B, dim, dim] -> device state.

        Mirrors reference set_state semantics: depth budget = max_depth,
        metrics cleared (reference clifford.rs:299-304)."""
        dense = np.asarray(dense)
        if dense.ndim == 2:
            dense = dense[None]
        dense = (dense != 0).astype(np.int8)
        B = dense.shape[0]
        inv = np.stack([gf2_inverse(m) for m in dense]).astype(np.int8)
        state = self._fresh(B)
        if self.bitpack:
            a = jnp.asarray(pack_rows(dense, self.W).reshape(B, self.L))
            ainv = jnp.asarray(pack_rows(inv, self.W).reshape(B, self.L))
        else:
            a = jnp.asarray(self._pad(dense))
            ainv = jnp.asarray(self._pad(inv))
        success = self._solved(a)
        return state._replace(
            a=a, ainv=ainv,
            depth=jnp.full(B, self.max_depth, jnp.int32),
            success=success,
            reward=success.astype(jnp.float32),
        )

    # -------------------------------------------------------------- observe
    def dense(self, state: MatrixEnvState) -> jnp.ndarray:
        """uint8 [B, dim, dim] current matrices."""
        if self.bitpack:
            return unpack_rows(state.a, self.W, self.dim, self.dim)
        return state.a[:, : self.dim, : self.dim].astype(jnp.uint8)

    def observe(self, state: MatrixEnvState, dtype=jnp.float32) -> jnp.ndarray:
        """Policy observation: [B, dim, dim] in the requested float dtype."""
        return self.dense(state).astype(dtype)

    def masks(self, state: MatrixEnvState) -> jnp.ndarray:
        """bool [B, A]: all actions legal unless already solved."""
        return jnp.broadcast_to(
            (~state.success)[:, None], (state.batch, self.num_actions)
        )

    def is_final(self, state: MatrixEnvState) -> jnp.ndarray:
        return (state.depth == 0) | state.success
