"""Pallas fused energy + gradient kernel for the N x N inner loop.

This is the TPU-native replacement for CNS's nonbonded/NOE energy engine
(SURVEY.md N5) — the hot op executed every annealing step. Semantics are
identical to ops.energy (the jnp reference it is tested against); the win is
one fused VMEM pass per row-tile that produces BOTH the energy partial sums
and the coordinate gradient, so the optimizer never materializes the (L, L)
distance matrix (or its adjoint) in HBM.

Math (per row tile of TM beads against all L beads):

    d^2 = sum_c (a_c - x_c^T)^2                   <- broadcast differencing, VPU
    r   = rsqrt(d^2 + eps); d = d^2 * r           <- one transcendental total
    e_noe = 1/2 sum w_ij * well(viol_ij)          <- VPU, full lanes
    e_vdw = 1/2 sum nb_ij * overlap_ij^2
    dE/dx_i = x_i * rowsum(c) - c @ X             <- (TM,L)@(L,3) on the MXU
      where c_ij = (dE/dd_ij) * r_ij  (the pair force coefficient; each
      unordered pair appears in two row tiles, giving each endpoint its
      gradient, which is why the energy carries the 1/2 and c does not)

Batch handling: the ensemble's structures share one restraint set, so the
grid is (row_tiles, B) with B fastest-varying and the restraint tiles'
index_map independent of it — each (TM, L) tile is fetched from HBM once
per step for ALL structures (the tensors that dominate traffic never repeat).

The chain-bond term is O(L) and stays in jnp (XLA fuses it around the call).

The public entry is `pallas_energy`, a custom_vjp function: forward runs the
kernel once, saves the gradient it already computed, and the backward pass is
a single scale — zero extra FLOPs.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from chromosome3d_tpu.ops.energy import (
    DenseRestraints,
    EnergyWeights,
    ExactRestraints,
)

_EPS = 1e-12
TILE_M = 128


def exact_pair_tiles(restraints):
    """(target, folded weight) for the exact kernels. For the two-tensor
    ExactRestraints these are ALIASES of the stored tensors — zero copies,
    zero compute; for DenseRestraints the fold materializes once at the call
    site (callers running a scan should hoist this outside the step)."""
    if isinstance(restraints, ExactRestraints):
        return (restraints.target, restraints.w)
    return (restraints.lo, restraints.mask * restraints.weight)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_tile(Lp: int, exact: bool) -> int:
    """Row-tile size: as large as the 16 MiB scoped-VMEM budget allows. The
    TPU grid runs SEQUENTIALLY on a core, so many small tiles pay
    per-iteration overhead that dwarfs their VPU work at the shipped sizes
    (L <= 512 padded: ONE row tile per structure; measured +11% end-to-end
    vs fixed 128).

    Cost model calibrated from Mosaic's own scoped-vmem reports: total
    scoped bytes ~= u * TM * Lp * 4 with u ~= 8.3 for the exact kernel
    (measured 34.86M at TM=512, Lp=2048) and u ~= 9.8 for the general one
    (measured 20.01M at TM=128, Lp=4096) — double-buffered restraint tiles
    plus the live (TM, Lp) work arrays. Budget 14 MiB for headroom."""
    budget = 14 * 1024 * 1024
    u = 8.5 if exact else 10.5
    for t in (Lp, 512, 384, 320, 256, 128, 64, 32, 16, 8):
        if t <= Lp and Lp % t == 0 and u * t * Lp * 4 <= budget:
            return t
    # exhaustion needs Lp > ~54k, beyond the measured single-chip HBM
    # ceiling (~41k) where these whole-matrix kernels are never dispatched;
    # the sharded row-block variant, which CAN see such Lp, gates on
    # row_block_feasible instead
    return 8


def _pick_tile_fused(Lp: int):
    """Row-tile size for the FUSED step. Its T-layout state blocks are
    (1, 3, TM), so Mosaic's lane rule forces TM % 128 == 0 (a (3, 64) block
    of a (3, 4096) array does not lower) — which also bounds the fused
    step's reach: past Lp ~= 2048 no 128-multiple tile fits the scoped-VMEM
    budget and the caller uses the triangular/semi-fused path instead
    (solver.anneal picks that automatically). Returns None when infeasible.

    Cost model calibrated from REAL compiler reports (round 3): the fused
    step's live set is ~14.5 * TM * Lp * 4 bytes — Mosaic reported 16.96M
    scoped at TM=384/Lp=768 (an OOM the old 8.5 factor missed; bucket 768
    had never compiled on hardware), while TM=512/Lp=512 and TM=256/Lp=1024
    and TM=128/Lp=2048 all fit under the 16M hardware limit, consistent
    with u ~= 14.5. Budget 15.5M keeps the production 512 bucket on its
    measured whole-row tile while rejecting the shapes that actually OOM."""
    budget = 15.5e6
    for t in (Lp, 512, 384, 256, 128):
        if t <= Lp and Lp % t == 0 and t % 128 == 0 and 14.5 * t * Lp * 4 <= budget:
            return t
    return None


def fused_step_feasible(L: int) -> bool:
    """Whether pallas_fused_step_batched can lower at this length."""
    return _pick_tile_fused(_round_up(max(L, 8), TILE_M)) is not None


def _kernel(
    params_ref,   # SMEM (8,): noe_w, vdw_w, vdw_radius, rswitch, L_real (unused pad..)
    row0_ref,     # SMEM (1,) int32: global index of this block's first row
    #               (0 for whole-matrix calls; the shard's row_start when the
    #               (L, L) tensors are row-sharded over a mesh axis)
    x_ref,        # (1, L, 3) this structure's coords (FULL row range)
    xt_ref,       # (1, 3, L) coords transposed (lane-aligned row views)
    lo_ref,       # (TM, L) restraint tile (shared across the batch)
    hi_ref,       # (TM, L) tile
    w_ref,        # (TM, L) tile: mask-folded restraint weights
    bmrow_ref,    # (1, L) bead mask row
    bmcol_ref,    # (TM, 1) bead mask column tile
    e_ref,        # out (1, TM, 1): per-row energy partials of this tile
    g_ref,        # out (1, TM, 3): gradient rows of this tile
):
    i = pl.program_id(0)
    TM = g_ref.shape[1]
    row0 = row0_ref[0] + i * TM

    noe_w = params_ref[0]
    vdw_w = params_ref[1]
    vdw_radius = params_ref[2]
    rswitch = params_ref[3]

    x = x_ref[0]                                   # (L, 3)
    a = x_ref[0, pl.ds(row0, TM), :]               # (TM, 3)

    # pairwise distances by direct differencing ((TM,1)-(1,L) per coordinate,
    # full-lane VPU work). Differencing rather than the Gram identity keeps
    # f32 cancellation error out of the well-boundary branch decisions and
    # matches ops.energy bit-for-bit.
    d2 = jnp.zeros((TM, xt_ref.shape[2]), jnp.float32)
    for c in range(3):
        diff = a[:, c:c + 1] - xt_ref[0, c:c + 1, :]
        d2 = d2 + diff * diff
    # one rsqrt replaces sqrt + the two later divides by d (transcendentals
    # and divides are the VPU's expensive ops in this kernel)
    rinv = jax.lax.rsqrt(d2 + _EPS)
    d = (d2 + _EPS) * rinv

    pair_valid = bmcol_ref[:] * bmrow_ref[:]       # (TM, L)

    # --- NOE soft-square well ---
    lo = lo_ref[:]
    hi = hi_ref[:]
    w = w_ref[:] * pair_valid
    over = jnp.maximum(d - hi, 0.0)
    under = jnp.maximum(lo - d, 0.0)
    viol = over + under
    quad = viol <= rswitch
    well = jnp.where(quad, viol * viol, rswitch * rswitch + 2.0 * rswitch * (viol - rswitch))
    e_noe = 0.5 * noe_w * jnp.sum(w * well, axis=1, keepdims=True)   # (TM, 1)
    # dwell/dviol, signed by which wall is active
    dwell = jnp.where(quad, 2.0 * viol, 2.0 * rswitch)
    sgn = jnp.where(over > 0.0, 1.0, jnp.where(under > 0.0, -1.0, 0.0))
    c_noe = noe_w * w * dwell * sgn                # dE/dd (full-row convention)

    # --- vdw soft sphere on |i-j| >= 2 ---
    Lp = xt_ref.shape[2]
    rows = jax.lax.broadcasted_iota(jnp.int32, (TM, Lp), 0) + row0
    cols = jax.lax.broadcasted_iota(jnp.int32, (TM, Lp), 1)
    nonbonded = (jnp.abs(rows - cols) >= 2).astype(jnp.float32) * pair_valid
    overlap = jnp.maximum(vdw_radius - d, 0.0)
    e_vdw = 0.5 * vdw_w * jnp.sum(nonbonded * overlap * overlap, axis=1, keepdims=True)
    c_vdw = -2.0 * vdw_w * nonbonded * overlap

    # --- gradient: dE/dx_i = x_i * rowsum(c) - c @ X ---
    c = (c_noe + c_vdw) * rinv                     # (TM, L)
    crow = jnp.sum(c, axis=1, keepdims=True)       # (TM, 1)
    cx = jax.lax.dot_general(
        c, x, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                              # (TM, 3)
    g_ref[0] = a * crow - cx
    e_ref[0] = e_noe + e_vdw


def _kernel_exact(
    params_ref,   # SMEM (8,): noe_w, vdw_w, vdw_radius, ...
    row0_ref,     # SMEM (1,) int32: global first-row index (see _kernel)
    x_ref,        # (1, L, 3)
    xt_ref,       # (1, 3, L)
    t_ref,        # (TM, L) exact restraint TARGET tile (lo == hi == t)
    w_ref,        # (TM, L) mask-folded weights tile
    bmrow_ref,    # (1, L)
    bmcol_ref,    # (TM, 1)
    e_ref,        # out (1, TM, 1)
    g_ref,        # out (1, TM, 3)
):
    """The exact-restraint specialization of _kernel: this pipeline's
    restraints always have negdev = posdev = 0 (carr2tbl emits `d 0.00 0.00`,
    chromosome3D.pl:352-354) and the production well is pure quadratic
    (noe_rswitch disabled), so the soft-square machinery collapses:

        viol^2 = (d - t)^2        (no |.|, no wall selection)
        dE/dd  = 2 (d - t)        (no sign, no branch)

    One (TM, L) restraint tensor instead of two (lo, hi) — a third less
    restraint HBM traffic — and roughly half the VPU ops of the general
    well. Dispatched statically via exact=True (AnnealConfig.exact_restraints,
    auto-enabled by the pipeline when provable)."""
    i = pl.program_id(0)
    TM = g_ref.shape[1]
    row0 = row0_ref[0] + i * TM

    noe_w = params_ref[0]
    vdw_w = params_ref[1]
    vdw_radius = params_ref[2]

    x = x_ref[0]
    a = x_ref[0, pl.ds(row0, TM), :]

    d2 = jnp.zeros((TM, xt_ref.shape[2]), jnp.float32)
    for c in range(3):
        diff = a[:, c:c + 1] - xt_ref[0, c:c + 1, :]
        d2 = d2 + diff * diff
    rinv = jax.lax.rsqrt(d2 + _EPS)
    d = (d2 + _EPS) * rinv

    pair_valid = bmcol_ref[:] * bmrow_ref[:]
    # tiles may arrive bf16 (AnnealConfig.pair_bf16): convert on read, all
    # math stays f32 (astype is a no-op for f32 tiles)
    w = w_ref[:].astype(jnp.float32) * pair_valid
    dev = d - t_ref[:].astype(jnp.float32)
    e_noe = 0.5 * noe_w * jnp.sum(w * dev * dev, axis=1, keepdims=True)
    c_noe = noe_w * w * (2.0 * dev)

    Lp = xt_ref.shape[2]
    rows = jax.lax.broadcasted_iota(jnp.int32, (TM, Lp), 0) + row0
    cols = jax.lax.broadcasted_iota(jnp.int32, (TM, Lp), 1)
    nonbonded = (jnp.abs(rows - cols) >= 2).astype(jnp.float32) * pair_valid
    overlap = jnp.maximum(vdw_radius - d, 0.0)
    e_vdw = 0.5 * vdw_w * jnp.sum(nonbonded * overlap * overlap, axis=1, keepdims=True)
    c_vdw = -2.0 * vdw_w * nonbonded * overlap

    c = (c_noe + c_vdw) * rinv
    crow = jnp.sum(c, axis=1, keepdims=True)
    cx = jax.lax.dot_general(
        c, x, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    g_ref[0] = a * crow - cx
    e_ref[0] = e_noe + e_vdw


def _t_layout_bond(xtf, bead_l, bond_w, bond_len):
    """Chain bond energy + gradient in T layout (rolls along LANES, full
    efficiency). xtf (3, Lp) coords, bead_l (1, Lp) mask; returns
    (energy rows (1, Lp), gradient (3, Lp)): bond i lives on lane i
    (validity also kills the Lp-1 wraparound lane), and
    dE/dx_i = +fwd_{i-1} (x_i is bond i-1's "+1" end) - fwd_i (base end).

    ONE source of truth for both fused kernels: _kernel_fused_step and
    _kernel_fused_update contract to identical bond math (the semi path's
    fused-vs-unfused equivalence tests and the sharded replicas-stay-
    identical invariant both rest on it), so the block must not exist as
    two editable copies."""
    Lp = xtf.shape[1]
    lidx = jax.lax.broadcasted_iota(jnp.int32, (1, Lp), 1)
    x_nextT = pltpu.roll(xtf, shift=Lp - 1, axis=1)  # lane r -> x_{r+1}
    dnT = x_nextT - xtf
    dbT = jnp.sqrt(jnp.sum(dnT * dnT, axis=0, keepdims=True) + _EPS)
    v_nextT = (
        bead_l * pltpu.roll(bead_l, shift=Lp - 1, axis=1)
        * (lidx < Lp - 1).astype(jnp.float32)
    )
    bdevT = dbT - bond_len
    fwdT = (2.0 * bond_w * v_nextT * bdevT / dbT) * dnT      # (3, Lp)
    fwd_prevT = pltpu.roll(fwdT, shift=1, axis=1) * (lidx > 0).astype(
        jnp.float32
    )
    return bond_w * v_nextT * bdevT * bdevT, fwd_prevT - fwdT


def _t_layout_noise(ints_ref, b, row0, shape):
    """CLT-4 Langevin noise for a T-layout block whose lanes are global
    beads row0..row0+shape[1]: four murmur3-finalizer hashed uniforms over
    the element's global (bead, coord) index, summed (unit variance, tails
    bounded at +-3.46 sigma, zero transcendentals, backend-independent
    bits). ONE source of truth for both fused kernels — the streams must
    stay BITWISE identical (see _t_layout_bond's note)."""
    coord_s = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    row_l = row0 + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    elem = (row_l * 3 + coord_s).astype(jnp.uint32)
    base = (
        ints_ref[0, 0].astype(jnp.uint32)
        + ints_ref[0, 1].astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
        + b * jnp.uint32(0x7FEB352D)
    )

    def mix(h):
        h = h.astype(jnp.uint32)
        h = h ^ (h >> 16)
        h = h * jnp.uint32(0x85EBCA6B)
        h = h ^ (h >> 13)
        h = h * jnp.uint32(0xC2B2AE35)
        h = h ^ (h >> 16)
        return h

    def uniform(salt):
        bits = mix(elem ^ base ^ jnp.uint32(salt))
        return (bits >> 8).astype(jnp.int32).astype(jnp.float32) * (
            1.0 / (1 << 24)
        )

    return (
        uniform(0x68E31DA4) + uniform(0xB5297A4D) + uniform(0x1B56C4E9)
        + uniform(0x7C15BD3F) - 2.0
    ) * np.float32(np.sqrt(3.0))


def _kernel_fused_step(
    params_ref,   # SMEM f32 (1, 16): schedule/weight scalars (identical
    #               across any vmap lanes, so never batched)
    ints_ref,     # VMEM i32 (1, 128): seed, step, n_batch — the seed IS
    #               per-lane under the genome runner's vmap, and batched
    #               SMEM blocks violate Mosaic's block-shape rules, so these
    #               ride vector memory
    x_ref,        # (1, Lp, 3) full coords, row layout (for the d2 columns)
    xt_ref,       # (1, 3, Lp) full coords, T layout (lane-major)
    t_ref,        # (TM, Lp) exact restraint target tile
    w_ref,        # (TM, Lp) weights tile, pre-masked and pre-scaled
    #               (2*noe_w * mask * weight * pair_valid)
    nb_ref,       # (TM, Lp) vdw tile, pre-masked (|i-j|>=2 and pair_valid)
    bmrow_ref,    # (1, Lp)
    mu_ref,       # (1, 3, TM) Adam first moment, T layout (this tile's lanes)
    nu_ref,       # (1, 3, TM) Adam second moment, T layout
    e_ref,        # out (1, 1, TM) energy partials per bead (lane layout)
    xo_ref,       # out (1, 3, TM) updated coords, T layout
    muo_ref,      # out (1, 3, TM)
    nuo_ref,      # out (1, 3, TM)
    gb_ref,       # scratch VMEM (3, Lp): full-chain bond gradient staging
    eb_ref,       # scratch VMEM (1, Lp): full-chain bond energy staging
    *,
    gram: bool = False,
):
    """The WHOLE annealing step in one kernel invocation per row tile:
    pair energy+gradient (exact-restraint algebra), chain-bond energy+
    gradient, per-bead clip, Adam with bias correction, Langevin noise, and
    the coordinate update.

    All per-bead state lives in the TRANSPOSED (3, L) layout: a (TM, 3)
    array occupies 3 of 128 VPU lanes, so every Adam/noise/bond op on it ran
    at ~2% lane efficiency — in (3, TM) the same ops are full-lane. The pair
    section's row reductions land directly in lane layout through matmuls
    with a ones-row (rowsum(A) as ones(1,Lp) @ A^T on the MXU), so no
    in-kernel transposes exist anywhere. Measured: the unfused scan step
    cost ~96 us (B=10, L=456) of which ~45 us was XLA op-launch glue; the
    row-layout fused step cut it to 67.5 us; this layout removes most of
    the remaining per-bead overhead.

    Semantics match the unfused optax step exactly except the noise stream
    (CLT-4 over a counter-based murmur3-finalizer hash — backend-independent
    bits, statistically interchangeable with threefry normals)."""
    i = pl.program_id(0)
    b = pl.program_id(1)
    TM = t_ref.shape[0]
    Lp = xt_ref.shape[2]

    vdw_w = params_ref[0, 1]
    vdw_radius = params_ref[0, 2]
    lr = params_ref[0, 3]
    sigma = params_ref[0, 4]
    b1 = params_ref[0, 5]
    b2 = params_ref[0, 6]
    eps_adam = params_ref[0, 7]
    bc1 = params_ref[0, 8]          # 1 / (1 - b1^t)
    bc2 = params_ref[0, 9]          # 1 / (1 - b2^t)
    bond_w = params_ref[0, 10]
    bond_len = params_ref[0, 11]
    clip = params_ref[0, 12]        # per-bead grad-norm clip; <= 0 disables

    x = x_ref[0]                                   # (Lp, 3)
    a = x_ref[0, pl.ds(i * TM, TM), :]             # (TM, 3) — d2 columns only
    aT = xt_ref[0, :, pl.ds(i * TM, TM)]           # (3, TM)
    xtf = xt_ref[0]                                # (3, Lp)
    ones_row = jnp.ones((1, Lp), jnp.float32)

    def rowsum_T(m):
        """Row sums of (TM, Lp) delivered in LANE layout (1, TM) via MXU."""
        return jax.lax.dot_general(
            ones_row, m, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    # ---- pair terms: exact-restraint algebra in RSQRT SPACE ----
    # Substituting d = s*rinv (s = d2+eps, rinv = rsqrt(s)) collapses the
    # well to quantities that never materialize d:
    #     (d - t)*rinv          = 1 - t*rinv                  =: u
    #     max(r0 - d, 0)*rinv   = max(r0*rinv - 1, 0)         =: v
    #     dev^2 = u^2*d^2 = u^2*s,  overlap^2 = v^2*s
    # so the force coefficient is c = wt*u - 2*vdw_w*nb*v with NO trailing
    # *rinv, and the energy is s*(wt*u^2/4 + vdw_w*nb*v^2/2). The w tile
    # arrives PRE-SCALED by 2*noe_w (constant over the schedule) and
    # PRE-MASKED (bead validity, |i-j| >= 2 for vdw) — fused_step_tiles
    # folds both host-side once per solve. Net: ~25 -> ~18 VPU slots/pair.
    if gram:
        # MXU-hybrid d^2: |a|^2 + |x|^2 - 2 a@X^T moves ~6 of the ~18 VPU
        # slots/pair onto the (otherwise idle) systolic array. f32
        # cancellation costs ~1e-3 relative near-contact accuracy (clamped
        # at 0), acceptable for stochastic annealing forces — gated by
        # AnnealConfig.gram_d2, accepted/rejected on a real-chip A/B.
        a2 = jnp.sum(a * a, axis=1, keepdims=True)           # (TM, 1)
        x2 = jnp.sum(xtf * xtf, axis=0, keepdims=True)       # (1, Lp)
        ax = jax.lax.dot_general(
            a, xtf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                                    # (TM, Lp) MXU
        s = jnp.maximum(a2 + x2 - 2.0 * ax, 0.0) + _EPS
    else:
        s = jnp.full((TM, Lp), _EPS, jnp.float32)
        for c in range(3):
            diff = a[:, c:c + 1] - xtf[c:c + 1, :]
            s = s + diff * diff
    rinv = jax.lax.rsqrt(s)
    # tiles may arrive bf16 (AnnealConfig.pair_bf16): convert on read
    u = 1.0 - t_ref[:].astype(jnp.float32) * rinv
    wtu = w_ref[:].astype(jnp.float32) * u         # w tile carries 2*noe_w
    v = jnp.maximum(vdw_radius * rinv - 1.0, 0.0)
    nv = nb_ref[:].astype(jnp.float32) * v
    # one fused energy rowsum (the scan history only needs the TOTAL; the
    # per-term breakdown is computed once at the end of the solve)
    e_pairT = rowsum_T(
        s * (0.25 * (wtu * u) + (0.5 * vdw_w) * (nv * v))
    )                                              # (1, TM)
    c = wtu - (2.0 * vdw_w) * nv                   # (TM, Lp)
    crowT = rowsum_T(c)                            # (1, TM)
    cxT = jax.lax.dot_general(
        xtf, c, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                              # (3, TM)
    gT = aT * crowT - cxT                          # (3, TM)

    # ---- chain bond in T layout (shared helper — see _t_layout_bond);
    # staged through scratch for the ref-level lane slice (Mosaic has no
    # value-level dynamic_slice)
    eb_full, gb_full = _t_layout_bond(xtf, bmrow_ref[:], bond_w, bond_len)
    gb_ref[:] = gb_full
    eb_ref[:] = eb_full
    g_bondT = gb_ref[:, pl.ds(i * TM, TM)]         # (3, TM)
    e_bondT = eb_ref[:, pl.ds(i * TM, TM)]         # (1, TM)

    gT = gT + g_bondT
    # per-bead gradient-norm clip (AnnealConfig.gradient_clip)
    gnormT = jnp.sqrt(jnp.sum(gT * gT, axis=0, keepdims=True) + 1e-12)
    scaleT = jnp.where(clip > 0.0, jnp.minimum(1.0, clip / gnormT), 1.0)
    gT = gT * scaleT

    # ---- Adam + Langevin update (all (3, TM), full-lane) ----
    mu = b1 * mu_ref[0] + (1.0 - b1) * gT
    nu = b2 * nu_ref[0] + (1.0 - b2) * gT * gT
    upd = (mu * bc1) / (jnp.sqrt(nu * bc2) + eps_adam)

    # noise: this tile's lanes are global beads i*TM.. (identical values to
    # the row layout, just arranged (coord, bead))
    noise = _t_layout_noise(ints_ref, b, i * TM, (3, TM))

    bead_lane = bmrow_ref[0:1, pl.ds(i * TM, TM)]  # (1, TM)
    xo_ref[0] = aT + (-lr * upd + sigma * noise) * bead_lane
    muo_ref[0] = mu
    nuo_ref[0] = nu
    e_ref[0] = e_pairT + e_bondT


def _kernel_fused_update(
    params_ref,   # SMEM f32 (1, 16): same layout as _kernel_fused_step
    ints_ref,     # VMEM i32 (1, 128): seed, step (see _kernel_fused_step)
    xt_ref,       # (1, 3, Lp) coords, T layout
    gT_ref,       # (1, 3, Lp) PAIR gradient, T layout (from the tri kernel)
    mu_ref,       # (1, 3, Lp) Adam first moment
    nu_ref,       # (1, 3, Lp) Adam second moment
    bmrow_ref,    # (1, Lp) bead mask
    eb_ref,       # out (1, 1, Lp): bond energy partials per bead
    xo_ref,       # out (1, 3, Lp) updated coords
    muo_ref,      # out (1, 3, Lp)
    nuo_ref,      # out (1, 3, Lp)
):
    """The UPDATE half of _kernel_fused_step as a standalone kernel: chain
    bond energy+gradient, per-bead clip, Adam with bias correction, Langevin
    noise, coordinate update — everything per-step EXCEPT the O(L^2) pair
    terms, which arrive as gT from whichever pair kernel ran (the triangular
    kernel at large L, where the fully fused step cannot lower past
    Lp ~= 2048 — _pick_tile_fused). This closes the ~15%/step XLA op-launch
    glue the unfused scan paid exactly where the triangular kernel wins
    (round-2 VERDICT item 2). One grid point per structure; all state in the
    full-lane (3, L) T layout. The noise stream is BITWISE identical to
    _kernel_fused_step's (same counter-hash over global element indices)."""
    b = pl.program_id(0)
    Lp = xt_ref.shape[2]

    lr = params_ref[0, 3]
    sigma = params_ref[0, 4]
    b1 = params_ref[0, 5]
    b2 = params_ref[0, 6]
    eps_adam = params_ref[0, 7]
    bc1 = params_ref[0, 8]
    bc2 = params_ref[0, 9]
    bond_w = params_ref[0, 10]
    bond_len = params_ref[0, 11]
    clip = params_ref[0, 12]

    xtf = xt_ref[0]                                # (3, Lp)
    gT = gT_ref[0]
    bead_l = bmrow_ref[:]                          # (1, Lp)
    e_rows, g_bond = _t_layout_bond(xtf, bead_l, bond_w, bond_len)
    gT = gT + g_bond
    eb_ref[0] = e_rows

    gnormT = jnp.sqrt(jnp.sum(gT * gT, axis=0, keepdims=True) + 1e-12)
    scaleT = jnp.where(clip > 0.0, jnp.minimum(1.0, clip / gnormT), 1.0)
    gT = gT * scaleT

    mu = b1 * mu_ref[0] + (1.0 - b1) * gT
    nu = b2 * nu_ref[0] + (1.0 - b2) * gT * gT
    upd = (mu * bc1) / (jnp.sqrt(nu * bc2) + eps_adam)

    noise = _t_layout_noise(ints_ref, b, 0, (3, Lp))

    xo_ref[0] = xtf + (-lr * upd + sigma * noise) * bead_l
    muo_ref[0] = mu
    nuo_ref[0] = nu


def pallas_fused_update_batched(
    coords_T: jnp.ndarray,     # (B, 3, L) — T layout
    grad_T: jnp.ndarray,       # (B, 3, L) pair gradient, T layout
    mu_T: jnp.ndarray,         # (B, 3, L)
    nu_T: jnp.ndarray,         # (B, 3, L)
    weights: EnergyWeights,
    bead_mask: jnp.ndarray,    # (L,)
    lr, sigma,                 # schedule scalars
    bc1, bc2,                  # Adam bias corrections 1/(1-b^t)
    seed, step,                # int32 scalars for the noise stream
    clip: float,               # per-bead grad clip (<=0 disables)
    b1: float = 0.9,
    b2: float = 0.999,
    eps_adam: float = 1e-8,
    interpret: bool = False,
):
    """One annealing UPDATE (bond + clip + Adam + Langevin + coordinate
    move) for a batch, consuming the pair gradient computed by a separate
    kernel — the companion that gives the triangular/row-kernel paths the
    fused step's zero-glue update. Returns
    (bond energies (B,), xT', muT', nuT')."""
    B, _, L = coords_T.shape
    Lp = _round_up(max(L, 8), 128)
    padn = Lp - L

    def padT(m):
        return jnp.pad(m.astype(jnp.float32), ((0, 0), (0, 0), (0, padn)))

    xt = padT(coords_T)
    gT = padT(grad_T)
    mu_p = padT(mu_T)
    nu_p = padT(nu_T)
    bm = jnp.pad(bead_mask.astype(jnp.float32), (0, padn))

    params = jnp.stack([
        weights.noe.astype(jnp.float32),
        weights.vdw.astype(jnp.float32),
        weights.vdw_radius.astype(jnp.float32),
        jnp.asarray(lr, jnp.float32),
        jnp.asarray(sigma, jnp.float32),
        jnp.float32(b1),
        jnp.float32(b2),
        jnp.float32(eps_adam),
        jnp.asarray(bc1, jnp.float32),
        jnp.asarray(bc2, jnp.float32),
        weights.bond.astype(jnp.float32),
        weights.bond_length.astype(jnp.float32),
        jnp.float32(clip if clip is not None else -1.0),
        jnp.float32(0), jnp.float32(0), jnp.float32(0),
    ])[None, :]
    ints = jnp.zeros((1, 128), jnp.int32)
    ints = ints.at[0, 0].set(jnp.asarray(seed, jnp.int32))
    ints = ints.at[0, 1].set(jnp.asarray(step, jnp.int32))

    state_spec = pl.BlockSpec((1, 3, Lp), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    eb, x_new, mu_new, nu_new = pl.pallas_call(
        _kernel_fused_update,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 128), lambda b: (0, 0), memory_space=pltpu.VMEM),
            state_spec,
            state_spec,
            state_spec,
            state_spec,
            pl.BlockSpec((1, Lp), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, Lp), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            state_spec,
            state_spec,
            state_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, Lp), jnp.float32),
            jax.ShapeDtypeStruct((B, 3, Lp), jnp.float32),
            jax.ShapeDtypeStruct((B, 3, Lp), jnp.float32),
            jax.ShapeDtypeStruct((B, 3, Lp), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(60 * Lp) * B,
            bytes_accessed=B * Lp * 4 * 17,
            transcendentals=2 * Lp * B,
        ),
        interpret=interpret,
    )(params, ints, xt, gT, mu_p, nu_p, bm[None, :])
    return (
        jnp.sum(eb[:, 0, :], axis=1),
        x_new[:, :, :L],
        mu_new[:, :, :L],
        nu_new[:, :, :L],
    )


def fused_step_tiles(
    restraints: DenseRestraints, bead_mask: jnp.ndarray, noe_weight
):
    """The fused step's static (L, L) tiles: restraint target, pre-masked
    pre-scaled weights (2 * noe_weight * mask * weight * pair_valid — the
    NOE weight is constant over the schedule, so the kernel's force
    coefficient is just w_tile * u), and the pre-masked vdw predicate
    (|i-j| >= 2 AND both beads real). Computed ONCE per solve (outside the
    scan) — folding these saves ~7 per-pair VPU ops every step."""
    tgt, w_folded = exact_pair_tiles(restraints)
    L = tgt.shape[0]
    bm = bead_mask.astype(jnp.float32)
    pair_valid = bm[:, None] * bm[None, :]
    idx = jnp.arange(L)
    nonbonded = (jnp.abs(idx[:, None] - idx[None, :]) >= 2).astype(jnp.float32)
    return (
        tgt,
        (2.0 * jnp.asarray(noe_weight, jnp.float32)) * w_folded * pair_valid,
        nonbonded * pair_valid,
    )


def pallas_fused_step_batched(
    coords_T: jnp.ndarray,     # (B, 3, L) — T layout (lane-major beads)
    mu_T: jnp.ndarray,         # (B, 3, L)
    nu_T: jnp.ndarray,         # (B, 3, L)
    restraints: DenseRestraints,
    weights: EnergyWeights,
    bead_mask: jnp.ndarray,    # (L,)
    lr, sigma,                 # schedule scalars
    bc1, bc2,                  # Adam bias corrections 1/(1-b^t)
    seed, step,                # int32 scalars for the noise stream
    clip: float,               # per-bead grad clip (<=0 disables)
    b1: float = 0.9,
    b2: float = 0.999,
    eps_adam: float = 1e-8,
    interpret: bool = False,
    masked_tiles=None,
    gram: bool = False,
):
    """One full annealing step for a shared-restraint batch, entirely inside
    the fused kernel. State rides the TRANSPOSED (B, 3, L) layout (see
    _kernel_fused_step); the one op outside the kernel is the row-layout
    view of x that the pair section's column broadcasts need. Returns
    (energies (B,), xT', muT', nuT'). Exact-restraint algebra only (the
    production path).

    masked_tiles: (target, w_masked, vdw_masked) from fused_step_tiles —
    static per solve; callers running a scan MUST precompute them once
    outside the step (otherwise the O(L^2) masking re-runs every step)."""
    B, _, L = coords_T.shape
    Lp = _round_up(max(L, 8), TILE_M)
    padn = Lp - L

    def pad2(m):
        return jnp.pad(m, ((0, padn), (0, padn)))

    def padT(m):
        return jnp.pad(m, ((0, 0), (0, 0), (0, padn)))

    xt = padT(coords_T.astype(jnp.float32))
    mu_p = padT(mu_T.astype(jnp.float32))
    nu_p = padT(nu_T.astype(jnp.float32))
    bm = jnp.pad(bead_mask.astype(jnp.float32), (0, padn))
    if masked_tiles is None:
        masked_tiles = fused_step_tiles(restraints, bead_mask, weights.noe)
    t, w, nb = (pad2(m) for m in masked_tiles)
    x = jnp.swapaxes(xt, 1, 2)                     # (B, Lp, 3) row view

    params = jnp.stack([
        weights.noe.astype(jnp.float32),
        weights.vdw.astype(jnp.float32),
        weights.vdw_radius.astype(jnp.float32),
        jnp.asarray(lr, jnp.float32),
        jnp.asarray(sigma, jnp.float32),
        jnp.float32(b1),
        jnp.float32(b2),
        jnp.float32(eps_adam),
        jnp.asarray(bc1, jnp.float32),
        jnp.asarray(bc2, jnp.float32),
        weights.bond.astype(jnp.float32),
        weights.bond_length.astype(jnp.float32),
        jnp.float32(clip if clip is not None else -1.0),
        jnp.float32(0), jnp.float32(0), jnp.float32(0),
    ])[None, :]
    ints = jnp.zeros((1, 128), jnp.int32)
    ints = ints.at[0, 0].set(jnp.asarray(seed, jnp.int32))
    ints = ints.at[0, 1].set(jnp.asarray(step, jnp.int32))
    ints = ints.at[0, 2].set(jnp.int32(B))

    TM = _pick_tile_fused(Lp)
    if TM is None:
        raise ValueError(
            f"fused step infeasible at Lp={Lp} (no 128-multiple row tile "
            "fits VMEM); use the triangular/unfused path "
            "(solver.anneal dispatches it automatically)"
        )
    grid = (Lp // TM, B)
    tile_spec = pl.BlockSpec((TM, Lp), lambda i, b: (i, 0), memory_space=pltpu.VMEM)
    stateT_spec = pl.BlockSpec((1, 3, TM), lambda i, b: (b, 0, i), memory_space=pltpu.VMEM)
    e_parts, x_new, mu_new, nu_new = pl.pallas_call(
        functools.partial(_kernel_fused_step, gram=gram),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 128), lambda i, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lp, 3), lambda i, b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, Lp), lambda i, b: (b, 0, 0), memory_space=pltpu.VMEM),
            tile_spec,
            tile_spec,
            tile_spec,
            pl.BlockSpec((1, Lp), lambda i, b: (0, 0), memory_space=pltpu.VMEM),
            stateT_spec,
            stateT_spec,
        ],
        out_specs=[
            pl.BlockSpec((1, 1, TM), lambda i, b: (b, 0, i), memory_space=pltpu.VMEM),
            stateT_spec,
            stateT_spec,
            stateT_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, Lp), jnp.float32),
            jax.ShapeDtypeStruct((B, 3, Lp), jnp.float32),
            jax.ShapeDtypeStruct((B, 3, Lp), jnp.float32),
            jax.ShapeDtypeStruct((B, 3, Lp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((3, Lp), jnp.float32),
            pltpu.VMEM((1, Lp), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(24 * Lp) * Lp * B,
            bytes_accessed=int(4 * Lp) * Lp * 2 + B * Lp * 4 * 16,
            transcendentals=Lp * Lp * B,
        ),
        interpret=interpret,
    )(params, ints, x, xt, t, w, nb, bm[None, :], mu_p, nu_p)
    return (
        jnp.sum(e_parts[:, 0, :], axis=1),
        x_new[:, :, :L],
        mu_new[:, :, :L],
        nu_new[:, :, :L],
    )


@functools.partial(
    jax.jit, static_argnames=("interpret", "exact", "gram", "no_tri", "bf16")
)
def _pairwise_energy_grad_batched(
    coords: jnp.ndarray,       # (B, L, 3)
    restraints: DenseRestraints,
    weights: EnergyWeights,
    bead_mask: jnp.ndarray,    # (L,)
    interpret: bool = False,
    exact: bool = False,
    gram: bool = False,
    no_tri: bool = False,
    bf16: bool = False,
):
    """Run the fused kernel over a batch of structures SHARING one restraint
    set. Returns (pair_energy (B,), pair_grad (B, L, 3)).

    Grid is (row_tiles, B) with the batch as the FASTEST-varying dimension
    and the restraint tiles' index_map independent of it, so Mosaic keeps
    each (TILE_M, L) restraint tile resident in VMEM while all B structures
    consume it — one HBM fetch per tile per step instead of per structure.
    This is what makes the multi-restart ensemble bandwidth-cheap: the
    (L, L) tensors dominate traffic and they are batch-invariant.

    Pads L up to a TILE_M multiple; padded beads carry zero mask/weight so
    they contribute nothing (the same masking contract as ops.energy).

    Exact restraints at large L dispatch to the triangular kernel
    (pallas_energy_grad_tri_batched): once the matrix spans >= 3 blocks,
    computing each unordered tile pair once saves 33-45% of the pair math.
    no_tri=True pins the whole-matrix row kernel — a STATIC argument (the
    calibrator's row_unfused variant; an env-var read at trace time would
    not key jax's in-memory jit cache and could leak a cached trace into a
    later same-shape solve).
    """
    B, L, _ = coords.shape
    if exact and not no_tri and use_triangular(L, for_unfused=True, batch=B):
        return pallas_energy_grad_tri_batched(
            coords, restraints, weights, bead_mask, interpret, gram=gram,
            bf16=bf16,
        )
    Lp = _round_up(max(L, 8), TILE_M)
    padn = Lp - L

    def pad2(m):
        return jnp.pad(m, ((0, padn), (0, padn)))

    x = jnp.pad(coords.astype(jnp.float32), ((0, 0), (0, padn), (0, 0)))
    tgt, w_folded = exact_pair_tiles(restraints)
    w = pad2(w_folded)
    bm = jnp.pad(bead_mask.astype(jnp.float32), (0, padn))
    xt = jnp.swapaxes(x, 1, 2)                     # (B, 3, Lp)

    params = jnp.stack(
        [
            weights.noe.astype(jnp.float32),
            weights.vdw.astype(jnp.float32),
            weights.vdw_radius.astype(jnp.float32),
            weights.noe_rswitch.astype(jnp.float32),
            jnp.float32(L),
            jnp.float32(0),
            jnp.float32(0),
            jnp.float32(0),
        ]
    )

    TM = _pick_tile(Lp, exact)
    tile_spec = pl.BlockSpec((TM, Lp), lambda i, b: (i, 0), memory_space=pltpu.VMEM)
    common_in = [
        pl.BlockSpec(memory_space=pltpu.SMEM),                      # params
        pl.BlockSpec(memory_space=pltpu.SMEM),                      # row0
        pl.BlockSpec((1, Lp, 3), lambda i, b: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3, Lp), lambda i, b: (b, 0, 0), memory_space=pltpu.VMEM),
    ]
    if exact:
        kernel = _kernel_exact
        # exact restraints: lo == hi == target, ONE restraint tensor
        tensors = (pad2(tgt), w)
        if bf16:
            # AnnealConfig.pair_bf16: halve the dominant HBM stream (the
            # restraint tiles re-fetched every step); math stays f32
            tensors = tuple(t.astype(jnp.bfloat16) for t in tensors)
        n_restraint_tiles = 2
    else:
        kernel = _kernel
        tensors = (pad2(restraints.lo), pad2(restraints.hi), w)
        n_restraint_tiles = 3

    grid = (Lp // TM, B)
    e_parts, grad = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=common_in + [tile_spec] * n_restraint_tiles + [
            pl.BlockSpec((1, Lp), lambda i, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, 1), lambda i, b: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TM, 1), lambda i, b: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TM, 3), lambda i, b: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Lp, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, Lp, 3), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int((22 if exact else 40) * Lp) * Lp * B,
            bytes_accessed=int(4 * Lp) * Lp * n_restraint_tiles + B * Lp * 4 * 10,
            transcendentals=Lp * Lp * B,
        ),
        interpret=interpret,
    )(params, jnp.zeros((1,), jnp.int32), x, xt, *tensors, bm[None, :], bm[:, None])
    return jnp.sum(e_parts[:, :, 0], axis=1), grad[:, :L, :]


def _kernel_exact_tri(
    params_ref,   # SMEM (8,): noe_w, vdw_w, vdw_radius, ...
    xrow_ref,     # (1, TM, 3) row-block coords (block i)
    xrowT_ref,    # (1, 3, TM) row-block coords, T layout (block i)
    xcolT_ref,    # (1, 3, TM) col-block coords, T layout (block tj)
    t_ref,        # (TM, TM) exact restraint target block (i, tj)
    w_ref,        # (TM, TM) mask-folded weights block
    bmr_ref,      # (TM, 1) row-block bead mask
    bmc_ref,      # (1, TM) col-block bead mask
    e_ref,        # out (1, 1, 1, TM): col-summed energy partials of THIS s
    growT_ref,    # out (1, 1, 3, TM): row-block gradient of THIS s (T layout)
    gcolT_ref,    # out (1, 1, 3, TM): col-block gradient of THIS s (T layout)
    *,
    gram: bool = False,
):
    """SYMMETRY-EXPLOITING exact-restraint energy+gradient: each unordered
    TILE PAIR is computed once. The grid walks (i, s, b) — batch FASTEST, so
    the (TM, TM) restraint blocks stay VMEM-resident across all B structures
    — with the col block tj = (i + s) % T, the classic round-robin pairing:
    s = 0 is the diagonal block (every intra-block pair appears in both
    orders, so it keeps the ordered-pair 1/2), 0 < s <= T//2 are distinct
    block pairs (scale 2), and for even T the last shell s = T/2 pairs each
    {i, i+T/2} twice, so only i < T/2 computes (the twin writes zeros).
    Each block computed once yields BOTH endpoints' gradients:

        g_rowT_i = a_i^T * rowsum(c) - (c @ x_j)^T (slot (b, s, i))
        g_colT_j = x_j^T * colsum(c) - a_i^T @ c   (slot (b, s, tj))

    Every output slot is written exactly once (no revisit accumulation —
    the s-axis sums happen outside in XLA, O(S·L) work). vs the full-matrix
    kernel this does ~T(T+1)/2 blocks instead of T^2: ~33% less pair math
    at T=3, ~45% at T=11. Same rsqrt-space algebra as _kernel_fused_step;
    the total keeps _kernel_exact's double-count convention.

    ALL outputs are lane-major (minor dim TM): a (.., TM, 3) or (.., TM, 1)
    output tiles to T(8, 128) with a 42-128x padding expansion — at
    L = 32768 the (B, S, Lp, 3) + (B, S, Lp, 1) partials measured 11 GB of
    HLO-temp padding, alone exceeding HBM. Lane-major partials are exact-
    sized; energy partials store COLUMN sums (same total, native layout)."""
    i = pl.program_id(0)
    s = pl.program_id(1)
    T = pl.num_programs(0)
    S = pl.num_programs(1)
    TM = t_ref.shape[0]
    tj = (i + s) % T

    noe_w = params_ref[0]
    vdw_w = params_ref[1]
    vdw_radius = params_ref[2]

    a = xrow_ref[0]                                # (TM, 3)
    xjT = xcolT_ref[0]                             # (3, TM)

    live = jnp.float32(1.0)
    if T % 2 == 0:
        # even T: shell s = T/2 double-covers; the i >= T/2 twin contributes 0
        live = jnp.where((s == S - 1) & (i >= T // 2), 0.0, 1.0)

    if gram:
        a2 = jnp.sum(a * a, axis=1, keepdims=True)           # (TM, 1)
        x2 = jnp.sum(xjT * xjT, axis=0, keepdims=True)       # (1, TM)
        ax = jax.lax.dot_general(
            a, xjT, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        s2 = jnp.maximum(a2 + x2 - 2.0 * ax, 0.0) + _EPS
    else:
        s2 = jnp.full((TM, TM), _EPS, jnp.float32)
        for c in range(3):
            diff = a[:, c:c + 1] - xjT[c:c + 1, :]
            s2 = s2 + diff * diff
    rinv = jax.lax.rsqrt(s2)
    # tiles may arrive bf16 (AnnealConfig.pair_bf16): convert on read
    u = 1.0 - t_ref[:].astype(jnp.float32) * rinv
    pv = bmr_ref[:] * bmc_ref[:]                   # (TM, TM)
    w = w_ref[:].astype(jnp.float32) * pv
    wu = w * u
    v = jnp.maximum(vdw_radius * rinv - 1.0, 0.0)
    rows_g = i * TM + jax.lax.broadcasted_iota(jnp.int32, (TM, TM), 0)
    cols_g = tj * TM + jax.lax.broadcasted_iota(jnp.int32, (TM, TM), 1)
    nb = (jnp.abs(rows_g - cols_g) >= 2).astype(jnp.float32) * pv
    nv = nb * v

    c_blk = ((2.0 * noe_w) * wu - (2.0 * vdw_w) * nv) * live   # (TM, TM)
    # e_blk carries the full kernel's per-ORDERED-pair 0.5; the diagonal
    # block holds both orders of its pairs (scale 1), an off-diagonal block
    # holds each unordered pair once (scale 2) — row sums then add up to the
    # same total as the full-matrix kernel
    e_scale = jnp.where(s == 0, 1.0, 2.0) * live
    e_blk = s2 * (
        (0.5 * noe_w) * (wu * u) + (0.5 * vdw_w) * (nv * v)
    )
    # COLUMN sums (lane-major (1, TM) — same total as the row sums)
    e_ref[0, 0] = e_scale * jnp.sum(e_blk, axis=0, keepdims=True)

    aT = xrowT_ref[0]                              # (3, TM)
    # row sums of c_blk in lane-major layout via a ones contraction (MXU)
    crowT = jax.lax.dot_general(
        jnp.ones((1, TM), jnp.float32), c_blk, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                              # (1, TM): sum_k c[r, k]
    cxjT = jax.lax.dot_general(
        xjT, c_blk, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                              # (3, TM)
    growT_ref[0, 0] = aT * crowT - cxjT

    # col-block gradient: zero on the diagonal shell (g_row already carries
    # the complete intra-block gradient there — the block is symmetric)
    col_live = jnp.where(s == 0, 0.0, 1.0)
    ccol = jnp.sum(c_blk, axis=0, keepdims=True)   # (1, TM)
    aTc = jax.lax.dot_general(
        a, c_blk, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                              # (3, TM)
    gcolT_ref[0, 0] = (xjT * ccol - aTc) * col_live


def _pick_tile_tri(L: int) -> int:
    """Block size for the triangular kernel: (TM, TM) restraint blocks, so
    VMEM scales with TM^2 — much larger tiles than the (TM, L) layout.
    Picks the candidate minimizing TOTAL pair work (live blocks x TM^2),
    which trades tile size against padding waste and shell coverage.

    Candidates that DIVIDE L exactly win any within-30% work comparison:
    a non-divisor tile forces jnp.pad of the (L, L) restraint tiles inside
    the jitted solve — at L = 32768 those two padded copies measured
    2 x 4.06 GB of remat'd HLO temps (plus their per-step recompute
    traffic), worth far more than a 30% pair-op-count edge. At reference
    scale the pads are KB and the work term dominates either way."""
    budget = 14 * 1024 * 1024
    best, best_work, best_div = 128, None, False
    for t in (512, 384, 256, 128):
        if 22 * t * t * 4 > budget:
            continue
        Lp = _round_up(max(L, 8), t)
        T = Lp // t
        S = T // 2 + 1
        live = T * S - (T // 2 if T % 2 == 0 else 0)
        work = live * t * t
        divides = L % t == 0
        if best_work is None:
            best, best_work, best_div = t, work, divides
            continue
        if divides and not best_div:
            if work < 1.30 * best_work:
                best, best_work, best_div = t, work, True
            continue
        if best_div and not divides:
            if work < 0.85 / 1.30 * best_work:
                best, best_work, best_div = t, work, False
            continue
        # same divisibility class: candidates iterate LARGEST first; a
        # smaller tile must cut the pair work by >15% to win (more grid
        # steps = more per-block overhead)
        if work < 0.85 * best_work:
            best, best_work, best_div = t, work, divides
    return best


def _dispatch_table_path() -> str:
    """Where `chromosome3d calibrate` WRITES its table: the explicit env
    override when set, else the per-user cache."""
    import os

    p = os.environ.get("CHROM3D_DISPATCH_TABLE", "").strip()
    if p:
        return p
    return os.path.expanduser("~/.cache/chromosome3d/dispatch.json")


def packaged_dispatch_path() -> str:
    """The dispatch table SHIPPED with the package (quiet-host chip
    calibration committed to the repo, keyed by device kind) — so kernel
    routing is deterministic on a fresh machine instead of depending on
    uncommitted ~/.cache state (which has been poisoned by a concurrent
    load once; see ops/calibrate.py's spread gate)."""
    import os

    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "data", "dispatch_v5e.json")


def _dispatch_sources():
    """Dispatch-table sources in precedence order, as (name, path) pairs.

    CHROM3D_DISPATCH_TABLE set -> that file ALONE (explicit override, also
    what a fresh `calibrate` run writes under the override). Otherwise the
    PACKAGED table is consulted before the user cache: a fresh checkout
    must route deterministically from committed, quiet-host-measured data;
    a machine-local table only applies for device kinds the shipped table
    does not cover (re-routing a covered kind = set the env var)."""
    import os

    p = os.environ.get("CHROM3D_DISPATCH_TABLE", "").strip()
    if p:
        return [("env", p)]
    return [
        ("packaged", packaged_dispatch_path()),
        ("user", os.path.expanduser("~/.cache/chromosome3d/dispatch.json")),
    ]


_DISPATCH_CACHE: dict = {}


def _load_dispatch_file(path: str):
    """One table file, memoized per (path, mtime). None when
    absent/invalid."""
    import json
    import os

    try:
        mtime = os.path.getmtime(path)
    except OSError:
        return None
    key = (path, mtime)
    if key not in _DISPATCH_CACHE:
        # drop stale mtimes for this path (keep other paths' entries live)
        for k in [k for k in _DISPATCH_CACHE if k[0] == path]:
            del _DISPATCH_CACHE[k]
        try:
            with open(path) as f:
                _DISPATCH_CACHE[key] = json.load(f)
        except (OSError, ValueError):
            return None
    return _DISPATCH_CACHE.get(key)


def _dispatch_table():
    """Back-compat single-table view: the first source file that loads
    (calibrate's merge logic reads its WRITE path directly instead)."""
    for _, path in _dispatch_sources():
        table = _load_dispatch_file(path)
        if table is not None:
            return table
    return None


def _active_dispatch(kind: str):
    """(entries, source_name) for this device kind: the first source in
    precedence order with entries for the kind wins; ([], 'none') when no
    source covers it (the frozen defaults then apply)."""
    for name, path in _dispatch_sources():
        table = _load_dispatch_file(path)
        if table is None:
            continue
        entries = (table.get(kind) or {}).get("entries", [])
        if entries:
            return entries, name
    return [], "none"


def dispatch_table_fingerprint() -> str:
    """Short content hash of the dispatch-table sources that can actually
    STEER routing on this device (or 'none') — the tables change TRACED
    programs, so the AOT executable cache keys on this
    (utils.aot.cache_key). Precedence-aware: when the packaged table
    covers the current device kind, the user-cache file is SHADOWED
    (never consulted, see _active_dispatch) and must not contribute — a
    routing-inert `calibrate` run writing ~/.cache would otherwise
    invalidate every serialized executable and cost minutes of remote
    recompiles for a byte-identical program."""
    import hashlib
    import os

    def digest(path):
        with open(path, "rb") as f:
            return hashlib.sha256(f.read()).hexdigest()[:12]

    sources = _dispatch_sources()
    parts = []
    shadowed = False
    for name, path in sources:
        if shadowed:
            break
        if not os.path.exists(path):
            continue
        parts.append(f"{name}:{digest(path)}")
        if name == "packaged":
            table = _load_dispatch_file(path)
            try:
                kind = _device_kind()
            except Exception:
                kind = None
            if (
                table is not None
                and kind is not None
                and (table.get(kind) or {}).get("entries")
            ):
                shadowed = True      # later sources can never apply
    return "+".join(parts) if parts else "none"


def _device_kind() -> str:
    d = jax.devices()[0]
    return getattr(d, "device_kind", d.platform)


def _select_dispatch_entry(entries, L: int, batch):
    """Nearest measured entry: primary key |log(L/entry L)|, tie-broken by
    |log(B/entry B)| when the caller knows its batch (entries without a
    recorded B are legacy round-3 measurements at B=4). Returns None when
    the nearest entry is more than 2x away in log-L space — a sparse table
    must not steer shapes it never measured (the frozen defaults apply)."""
    import math

    def ld(e):
        return abs(math.log(max(L, 1) / max(e["L"], 1)))

    best = min(ld(e) for e in entries)
    if best > math.log(2.0) + 1e-9:
        return None
    near = [e for e in entries if ld(e) <= best + 1e-9]
    if batch is not None and len(near) > 1:
        near = sorted(
            near,
            key=lambda e: abs(math.log(max(batch, 1) / max(e.get("B", 4), 1))),
        )
    return near[0]


def _entry_seconds(entry, key: str) -> float:
    """Variant seconds from a table entry; None/missing = infeasible
    (stored as null since round 4 — strict-JSON safe; legacy files with
    the nonstandard Infinity token still load through Python's json)."""
    v = entry.get(key)
    return float("inf") if v is None else float(v)


def use_triangular(L: int, for_unfused: bool = False,
                   batch: int | None = None) -> bool:
    """True when the symmetry-exploiting kernel pays at this length: the
    padded matrix spans >= 3 blocks AND the saving beats the alternative.

    The decision consults the MEASURED dispatch table when one exists
    (calibrate_dispatch writes it, keyed by device kind; nearest measured
    (L, B) in log space decides — see _select_dispatch_entry, which also
    refuses entries >2x away in log-L) and otherwise falls back to the
    frozen defaults from the round-2 measurement session (276-step turbo,
    4 models, ±8% single-run variance): against the FULLY FUSED
    whole-matrix step, L=1024 fused 0.111 s vs tri 0.131-0.139 (fused
    wins), L=2048 0.221 vs 0.217-0.224 (tie) — and past Lp ~= 2048 the
    fused step cannot lower at all (fused_step_feasible), so the
    fused-path crossover defaults to 2048. When the fused step is NOT an
    option (for_unfused=True: or-group solves, fuse_update=False, the
    enantiomer hot pick), the comparison is against the full-matrix row
    kernel doing ~2x the pair math, so the default crossover is 1024.
    CHROM3D_NO_TRI=1 disables the dispatch (A/B measurement).

    batch: the caller's structure count, used to pick between same-L
    entries measured at different B (round-4 tables carry the production
    bucket shapes; the per-step glue amortizes differently with B).

    Round-3 frozen fallback (no table): the calibrated measurement showed
    the FUSED step wins (or ties) wherever it can lower — 1024 tie, 2048
    win — so without a table the fused path defers to the triangular
    kernel only where the fused step is infeasible."""
    import math
    import os

    if os.environ.get("CHROM3D_NO_TRI"):
        return False
    TM = _pick_tile_tri(L)
    if _round_up(max(L, 8), TM) // TM < 3:
        return False                  # < 3 blocks: no symmetry to exploit

    entries, _src = _active_dispatch(_device_kind())
    best = _select_dispatch_entry(entries, L, batch) if entries else None
    if best is not None:
        # 3% hysteresis: a within-noise "win" (measured rel_spread is a
        # few %) must not flip dispatch away from the simpler variant
        if for_unfused:
            return (
                _entry_seconds(best, "tri_unfused_s")
                < 0.97 * _entry_seconds(best, "row_unfused_s")
            )
        if not fused_step_feasible(L):
            return True
        fused_s = _entry_seconds(best, "fused_s")
        if math.isinf(fused_s):
            # entry measured where the fused step could not lower, but it
            # CAN at the query length: the entry says nothing about the
            # comparison — frozen default (fused wherever feasible)
            return False
        return _entry_seconds(best, "semi_s") < 0.97 * fused_s

    if for_unfused:
        return L >= 1024
    return not fused_step_feasible(L)


def describe_dispatch(L: int, batch: int | None = None, exact: bool = True,
                      fusable: bool = True, or_groups: bool = False) -> dict:
    """Which step variant a solve at (L, batch) will actually run, plus the
    dispatch provenance behind the choice — the fields bench.py records so
    a headline number can never again move between runs without the
    artifact saying which kernel route carried it (round-4 VERDICT weak
    #1). Mirrors solver.anneal.solve_ensemble_impl's fused/semi/unfused
    selection exactly (same use_triangular/fused_step_feasible calls);
    changing that selection without updating this helper fails
    tests/test_dispatch_calibration.py::test_describe_dispatch_matches_anneal.
    """
    import os

    ff = fused_step_feasible(L)
    kind = _device_kind()
    entries, source = _active_dispatch(kind)
    entry = _select_dispatch_entry(entries, L, batch) if entries else None
    if not fusable:
        route = ("unfused_tri"
                 if use_triangular(L, for_unfused=True, batch=batch)
                 else "unfused_row")
    elif exact:
        fused = (
            not or_groups and not use_triangular(L, batch=batch) and ff
        )
        if fused:
            route = "fused"
        elif os.environ.get("CHROM3D_NO_TRI"):
            route = "unfused_row"
        else:
            # the triangular (or, for or-group solves, still triangular)
            # pair kernel + the fused update companion
            route = "semi"
    else:
        route = "semi_general"          # whole-matrix kernel + companion
    return {
        "route": route,
        "L": int(L),
        "batch": None if batch is None else int(batch),
        "fused_feasible": bool(ff),
        "tile_tri": int(_pick_tile_tri(L)),
        "tile_fused": _pick_tile_fused(_round_up(max(L, 8), TILE_M)),
        "device_kind": kind,
        "table_source": source,
        "table_entry": None if entry is None else {
            k: entry.get(k)
            for k in ("L", "B", "fused_s", "semi_s", "tri_unfused_s",
                      "row_unfused_s")
        },
        "table_fingerprint": dispatch_table_fingerprint(),
    }


def pallas_energy_grad_tri_batched(
    coords: jnp.ndarray,       # (B, L, 3)
    restraints: DenseRestraints,
    weights: EnergyWeights,
    bead_mask: jnp.ndarray,    # (L,)
    interpret: bool = False,
    tile: int | None = None,
    gram: bool = False,
    tiles=None,
    bf16: bool = False,
):
    """Batched exact-restraint pair energy+grad via the triangular kernel
    (valid only when lo == hi and the well is pure quadratic — the same
    contract as _kernel_exact). Drop-in for the exact path of
    _pairwise_energy_grad_batched; pays off once L spans several blocks
    (the dispatch in that function picks it for large L).

    tiles: optional precomputed (target, folded weight) pair
    (exact_pair_tiles) — scan callers pass it so the fold is hoisted
    outside the step rather than left to XLA's loop-invariant motion."""
    B, L, _ = coords.shape
    TM = tile or _pick_tile_tri(L)
    Lp = _round_up(max(L, 8), TM)
    padn = Lp - L
    T = Lp // TM
    S = T // 2 + 1

    if tiles is None:
        tiles = exact_pair_tiles(restraints)
    x = jnp.pad(coords.astype(jnp.float32), ((0, 0), (0, padn), (0, 0)))
    xt = jnp.swapaxes(x, 1, 2)
    t = jnp.pad(tiles[0], ((0, padn), (0, padn)))
    w = jnp.pad(tiles[1], ((0, padn), (0, padn)))
    if bf16 and t.dtype != jnp.bfloat16:
        t, w = t.astype(jnp.bfloat16), w.astype(jnp.bfloat16)
    bm = jnp.pad(bead_mask.astype(jnp.float32), (0, padn))

    params = jnp.stack([
        weights.noe.astype(jnp.float32),
        weights.vdw.astype(jnp.float32),
        weights.vdw_radius.astype(jnp.float32),
        jnp.float32(0), jnp.float32(L),
        jnp.float32(0), jnp.float32(0), jnp.float32(0),
    ])

    # batch FASTEST: the restraint blocks' index maps are b-independent, so
    # each (TM, TM) block is fetched once and consumed by all B structures
    grid = (T, S, B)

    def tj(i, s, b):
        return (i + s) % T

    e_parts, g_rowT, g_colT = pl.pallas_call(
        functools.partial(_kernel_exact_tri, gram=gram),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TM, 3), lambda i, s, b: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, TM), lambda i, s, b: (b, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, TM), lambda i, s, b: (b, 0, tj(i, s, b)), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, TM), lambda i, s, b: (i, tj(i, s, b)), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, TM), lambda i, s, b: (i, tj(i, s, b)), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, 1), lambda i, s, b: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TM), lambda i, s, b: (0, tj(i, s, b)), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 1, TM), lambda i, s, b: (b, s, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 3, TM), lambda i, s, b: (b, s, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 3, TM), lambda i, s, b: (b, s, 0, tj(i, s, b)), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            # lane-major partials: exact-sized under T(8, 128) tiling — the
            # old (B, S, Lp, 3)/(B, S, Lp, 1) layouts padded 42-128x and
            # alone exceeded HBM at L = 32768
            jax.ShapeDtypeStruct((B, S, 1, Lp), jnp.float32),
            jax.ShapeDtypeStruct((B, S, 3, Lp), jnp.float32),
            jax.ShapeDtypeStruct((B, S, 3, Lp), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(18 * TM) * TM * B * (T * S),
            bytes_accessed=int(8 * TM) * TM * (T * S) + B * Lp * 4 * 16,
            transcendentals=TM * TM * B * (T * S),
        ),
        interpret=interpret,
    )(params, x, xt, xt, t, w, bm[:, None], bm[None, :])
    gT = g_rowT.sum(axis=1) + g_colT.sum(axis=1)          # (B, 3, Lp)
    g = jnp.swapaxes(gT, 1, 2)
    return jnp.sum(e_parts[:, :, 0, :], axis=(1, 2)), g[:, :L, :]


def _kernel_exact_tri_strip(
    row0t_ref,    # PREFETCHED scalar (1,) int32: strip's first GLOBAL row TILE
    params_ref,   # SMEM (8,): noe_w, vdw_w, vdw_radius, ...
    xrow_ref,     # (1, TM, 3) row-block coords (global block row0t + i)
    xrowT_ref,    # (1, 3, TM) row-block coords, T layout (same block)
    xcolT_ref,    # (1, 3, TM) col-block coords (global block (row0t+i+s)%Tg)
    t_ref,        # (TM, TM) exact target block (strip row i, global col jj)
    w_ref,        # (TM, TM) mask-folded weights block (same)
    bmr_ref,      # (TM, 1) row-block bead mask
    bmc_ref,      # (1, TM) col-block bead mask
    e_ref,        # out (1, 1, 1, TM): col-summed energy partials of shell s
    growT_ref,    # out (1, 1, 3, TM): row-block gradient of shell s (T)
    gcolT_ref,    # out (1, 1, 3, TM): col-block gradient, COMPACT slot i
    *,
    Tg: int,      # static: global column tile count (= L // TM)
    gram: bool = False,
):
    """_kernel_exact_tri generalized to a SHARDED ROW STRIP: the global
    round-robin tile pairing (row tile i_g pairs with col tile
    (i_g + s) % Tg), with this device owning the strip's local row tiles
    i = 0..Tl-1 at global offset row0t. The union over devices covers every
    unordered tile pair exactly once — the triangular kernel's 33-45% pair-
    math saving, lifted across the sequence-parallel mesh axis.

    shard_map traces one SPMD program, so plain BlockSpec index maps cannot
    see the device's row offset. row0t therefore rides as a SCALAR-PREFETCH
    operand (pltpu.PrefetchScalarGridSpec): the index maps compute each
    block's GLOBAL position (i + row0t, (i + row0t + s) % Tg) directly on
    the unrolled strip/coords/bead inputs. (Round 4 first shipped this with
    caller-side jnp.roll copies of the strip and coords instead — two extra
    (Lb, L) restraint tensors live for the whole scan, doubling per-device
    restraint HBM in exactly the beyond-one-chip regime this kernel exists
    for, plus a (B, 3, L) roll every step. The prefetched offset removes
    all of them.) The body also reads row0t for the |i-j| >= 2 vdw
    predicate and the even-Tg dedup. Col-block gradients land in COMPACT
    slot i (for fixed s the map i -> jj is injective); slot i of shell s
    un-compacts to global tile (i + s + row0t) % Tg, which is exactly the
    static-shell-shift + traced-roll the caller's assemble_strip_tri_grad
    applies; it then psums across the axis."""
    i = pl.program_id(0)
    s = pl.program_id(1)
    S = pl.num_programs(1)
    TM = t_ref.shape[0]
    i_g = row0t_ref[0] + i

    noe_w = params_ref[0]
    vdw_w = params_ref[1]
    vdw_radius = params_ref[2]

    a = xrow_ref[0]                                # (TM, 3)
    xjT = xcolT_ref[0]                             # (3, TM)

    live = jnp.float32(1.0)
    if Tg % 2 == 0:
        # even Tg: shell s = Tg/2 double-covers; the i_g >= Tg/2 twin is dead
        live = jnp.where((s == S - 1) & (i_g >= Tg // 2), 0.0, 1.0)

    if gram:
        a2 = jnp.sum(a * a, axis=1, keepdims=True)
        x2 = jnp.sum(xjT * xjT, axis=0, keepdims=True)
        ax = jax.lax.dot_general(
            a, xjT, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        s2 = jnp.maximum(a2 + x2 - 2.0 * ax, 0.0) + _EPS
    else:
        s2 = jnp.full((TM, TM), _EPS, jnp.float32)
        for c in range(3):
            diff = a[:, c:c + 1] - xjT[c:c + 1, :]
            s2 = s2 + diff * diff
    rinv = jax.lax.rsqrt(s2)
    # tiles may arrive bf16 (AnnealConfig.pair_bf16): convert on read
    u = 1.0 - t_ref[:].astype(jnp.float32) * rinv
    pv = bmr_ref[:] * bmc_ref[:]                   # (TM, TM)
    w = w_ref[:].astype(jnp.float32) * pv
    wu = w * u
    v = jnp.maximum(vdw_radius * rinv - 1.0, 0.0)
    tj_g = jax.lax.rem(i_g + s, Tg)
    rows_g = i_g * TM + jax.lax.broadcasted_iota(jnp.int32, (TM, TM), 0)
    cols_g = tj_g * TM + jax.lax.broadcasted_iota(jnp.int32, (TM, TM), 1)
    nb = (jnp.abs(rows_g - cols_g) >= 2).astype(jnp.float32) * pv
    nv = nb * v

    c_blk = ((2.0 * noe_w) * wu - (2.0 * vdw_w) * nv) * live   # (TM, TM)
    e_scale = jnp.where(s == 0, 1.0, 2.0) * live
    e_blk = s2 * (
        (0.5 * noe_w) * (wu * u) + (0.5 * vdw_w) * (nv * v)
    )
    # lane-major partials throughout (see _kernel_exact_tri: the (TM, 1)/
    # (TM, 3)-minor layouts padded 42-128x at scale)
    e_ref[0, 0] = e_scale * jnp.sum(e_blk, axis=0, keepdims=True)

    aT = xrowT_ref[0]                              # (3, TM)
    crowT = jax.lax.dot_general(
        jnp.ones((1, TM), jnp.float32), c_blk, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                              # (1, TM): sum_k c[r, k]
    cxjT = jax.lax.dot_general(
        xjT, c_blk, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                              # (3, TM)
    growT_ref[0, 0] = aT * crowT - cxjT

    col_live = jnp.where(s == 0, 0.0, 1.0)
    ccol = jnp.sum(c_blk, axis=0, keepdims=True)
    aTc = jax.lax.dot_general(
        a, c_blk, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    gcolT_ref[0, 0] = (xjT * ccol - aTc) * col_live


def pick_tile_tri_strip(Lb: int) -> int:
    """(TM, TM) block size for the strip-tri kernel: must divide the strip
    height Lb (shard boundaries = tile boundaries, so rows need no padding
    and Lp = L exactly), under the same scoped-VMEM budget as the
    whole-matrix triangular kernel. Lb < 128 (tiny shards — CPU-mesh tests)
    degrades to sub-lane tiles, which interpret mode handles."""
    budget = 14 * 1024 * 1024
    for t in (512, 384, 256, 128, 64, 32, 16, 8):
        if t <= Lb and Lb % t == 0 and 22 * t * t * 4 <= budget:
            return t
    return 8


def strip_tri_feasible(L: int, n_dev: int) -> bool:
    """Whether the strip-tri kernel pays on an n_dev row-sharded solve:
    tile boundaries must align with shard boundaries and the global matrix
    must span >= 3 tiles (below that there is no symmetry to exploit —
    callers use the row-block kernel)."""
    if L % n_dev:
        return False
    Lb = L // n_dev
    TM = pick_tile_tri_strip(Lb)
    return Lb % TM == 0 and L % TM == 0 and L // TM >= 3


def pallas_strip_tri_energy_grad_batched(
    x: jnp.ndarray,            # (B, L, 3) replicated full coords
    xT: jnp.ndarray,           # (B, 3, L) the same coords, T layout
    t_strip: jnp.ndarray,      # (Lb, L) exact target strip, GLOBAL col order
    w_strip: jnp.ndarray,      # (Lb, L) mask-folded weights strip
    bead: jnp.ndarray,         # (L,) replicated bead mask
    row0_tiles: jnp.ndarray,   # traced int32: global row TILE offset
    weights: EnergyWeights,
    interpret: bool = False,
    gram: bool = False,
):
    """Symmetry-exploiting pair energy+grad for one row strip of a sharded
    exact-restraint solve (see _kernel_exact_tri_strip). All inputs are in
    GLOBAL (unrolled) layout — the strip's row-tile offset rides as a
    scalar-prefetch operand consumed by the block index maps, so no rolled
    copies of the tiles or coords exist. Returns
    (e partial (B,), growT (B, S, 3, Lb), gcolT compact (B, S, 3, Lb)) —
    all partials lane-major; assembly + collectives are the caller's
    (solver.sharded) job."""
    B, _, L = xT.shape
    Lb = t_strip.shape[0]
    TM = pick_tile_tri_strip(Lb)
    if Lb % TM or L % TM:
        raise ValueError(
            f"strip-tri needs TM={TM} to divide Lb={Lb} and L={L}"
        )
    Tl = Lb // TM
    Tg = L // TM
    S = Tg // 2 + 1

    params = jnp.stack([
        weights.noe.astype(jnp.float32),
        weights.vdw.astype(jnp.float32),
        weights.vdw_radius.astype(jnp.float32),
        jnp.float32(0), jnp.float32(L),
        jnp.float32(0), jnp.float32(0), jnp.float32(0),
    ])
    row0t = jnp.full((1,), row0_tiles, jnp.int32)

    def ii(i, s, b, off):
        return i + off[0]             # global row tile (no wrap: strip rows
        #                               are contiguous inside the matrix)

    def jj(i, s, b, off):
        return (i + off[0] + s) % Tg  # the round-robin column tile

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Tl, S, B),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TM, 3), lambda i, s, b, off: (b, ii(i, s, b, off), 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, TM), lambda i, s, b, off: (b, 0, ii(i, s, b, off)), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, TM), lambda i, s, b, off: (b, 0, jj(i, s, b, off)), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, TM), lambda i, s, b, off: (i, jj(i, s, b, off)), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, TM), lambda i, s, b, off: (i, jj(i, s, b, off)), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, 1), lambda i, s, b, off: (ii(i, s, b, off), 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TM), lambda i, s, b, off: (0, jj(i, s, b, off)), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 1, TM), lambda i, s, b, off: (b, s, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 3, TM), lambda i, s, b, off: (b, s, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 3, TM), lambda i, s, b, off: (b, s, 0, i), memory_space=pltpu.VMEM),
        ],
    )
    bm = bead.astype(jnp.float32)
    e_parts, g_rowT, g_colT = pl.pallas_call(
        functools.partial(_kernel_exact_tri_strip, Tg=Tg, gram=gram),
        grid_spec=grid_spec,
        out_shape=[
            # lane-major partials (see _kernel_exact_tri's layout note)
            jax.ShapeDtypeStruct((B, S, 1, Lb), jnp.float32),
            jax.ShapeDtypeStruct((B, S, 3, Lb), jnp.float32),
            jax.ShapeDtypeStruct((B, S, 3, Lb), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(18 * TM) * TM * B * (Tl * S),
            bytes_accessed=int(8 * TM) * TM * (Tl * S) + B * Lb * 4 * 16,
            transcendentals=TM * TM * B * (Tl * S),
        ),
        interpret=interpret,
    )(
        row0t, params, x.astype(jnp.float32), xT, xT,
        t_strip, w_strip, bm[:, None], bm[None, :],
    )
    return jnp.sum(e_parts[:, :, 0, :], axis=(1, 2)), g_rowT, g_colT


def assemble_strip_tri_grad(
    g_rowT: jnp.ndarray,    # (B, S, 3, Lb) from pallas_strip_tri_... (T)
    g_colT: jnp.ndarray,    # (B, S, 3, Lb) compact col-block gradients
    row0: jnp.ndarray,      # traced int32: global first ROW of the strip
    L: int,
):
    """Scatter one strip's tri-kernel gradient contributions into a full
    (B, 3, L) array (zeros elsewhere); psum over the mesh axis then yields
    the complete replicated gradient. Compact col slot i of shell s holds
    GLOBAL column tile (i + s + row0t) % Tg — placing slot i at position
    i*TM, shifting shell s by a STATIC roll of s*TM, and applying one
    traced roll by row0 = row0t*TM lands every slot at its global tile
    (the rolls compose to ((i + s + row0t) % Tg) * TM mod L)."""
    B, S, _, Lb = g_rowT.shape
    TM = pick_tile_tri_strip(Lb)
    pad = L - Lb
    acc = jnp.zeros((B, 3, L), jnp.float32)
    for s in range(S):
        strip = jnp.pad(g_colT[:, s], ((0, 0), (0, 0), (0, pad)))
        acc = acc + (jnp.roll(strip, s * TM, axis=2) if s else strip)
    g_col_global = jnp.roll(acc, row0, axis=2)
    g_rows_T = jnp.sum(g_rowT, axis=1)                         # (B, 3, Lb)
    own = jax.lax.dynamic_slice(g_col_global, (0, 0, row0), (B, 3, Lb))
    return jax.lax.dynamic_update_slice(
        g_col_global, own + g_rows_T, (0, 0, row0)
    )


def _pick_tile_rows(Lb: int, Lp: int, exact: bool):
    """Row-tile size for a ROW-BLOCK call: must divide the block height Lb
    (so no row padding is needed and every x slice stays in bounds), sized
    to the same scoped-VMEM budget as _pick_tile. Returns None when even
    the minimum (8, Lp) tile exceeds the budget (global L ~ >54k f32) —
    dispatching anyway would die in the Mosaic scoped-VMEM check at
    compile time, so callers must gate on row_block_feasible and keep the
    chunked jnp fallback."""
    budget = 14 * 1024 * 1024
    u = 8.5 if exact else 10.5
    for t in (Lb, 512, 384, 320, 256, 128, 64, 32, 16, 8):
        if t <= Lb and Lb % t == 0 and u * t * Lp * 4 <= budget:
            return t
    return None


def row_block_feasible(L: int, n_dev: int, exact: bool) -> bool:
    """Whether pallas_row_block_energy_grad_batched can tile an
    (L/n_dev, L) strip within the scoped-VMEM budget at this global L.
    The sharded solver consults this before selecting the row-block
    kernel; False routes the shard body to the chunked jnp fallback
    (solver/sharded.py), which exists for exactly this regime."""
    Lp = _round_up(max(L, 8), 128)
    return _pick_tile_rows(L // n_dev, Lp, exact) is not None


def pallas_row_block_energy_grad_batched(
    coords: jnp.ndarray,       # (B, L, 3) REPLICATED full coords
    lo: jnp.ndarray,           # (Lb, L) this shard's restraint row block
    hi: jnp.ndarray,           # (Lb, L) (ignored when exact=True)
    w: jnp.ndarray,            # (Lb, L) mask-folded weights block
    bead_mask: jnp.ndarray,    # (L,) replicated
    bm_rows: jnp.ndarray,      # (Lb,) this block's row-bead validity
    row_start: jnp.ndarray,    # traced int32 scalar: global first row
    weights: EnergyWeights,
    interpret: bool = False,
    exact: bool = False,
):
    """The sequence-parallel (sp) shard's step kernel: pair energy partial +
    gradient ROWS for one row block of the (L, L) tensors, batched over B
    structures sharing the block. This is the whole-matrix kernel's row-tile
    decomposition handed its shard's global row offset — called inside
    shard_map, it gives the row-sharded solver (solver/sharded.py) the same
    fused VMEM pass the single-chip path has; callers psum the energy and
    all-gather the (B, Lb, 3) rows (full-row convention: gradient rows never
    move). Returns (pair-energy partial (B,), grad rows (B, Lb, 3))."""
    B, L, _ = coords.shape
    Lb = lo.shape[0]
    Lp = _round_up(max(L, 8), 128)
    padc = Lp - L

    def padcols(m):
        return jnp.pad(m, ((0, 0), (0, padc)))

    x = jnp.pad(coords.astype(jnp.float32), ((0, 0), (0, padc), (0, 0)))
    xt = jnp.swapaxes(x, 1, 2)                     # (B, 3, Lp)
    bm = jnp.pad(bead_mask.astype(jnp.float32), (0, padc))

    params = jnp.stack(
        [
            weights.noe.astype(jnp.float32),
            weights.vdw.astype(jnp.float32),
            weights.vdw_radius.astype(jnp.float32),
            weights.noe_rswitch.astype(jnp.float32),
            jnp.float32(L),
            jnp.float32(0),
            jnp.float32(0),
            jnp.float32(0),
        ]
    )
    row0 = jnp.full((1,), row_start, jnp.int32)

    TM = _pick_tile_rows(Lb, Lp, exact)
    if TM is None:
        raise ValueError(
            f"row-block kernel infeasible at Lb={Lb}, Lp={Lp} (minimum tile "
            "exceeds the scoped-VMEM budget); gate on row_block_feasible"
        )
    tile_spec = pl.BlockSpec((TM, Lp), lambda i, b: (i, 0), memory_space=pltpu.VMEM)
    common_in = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, Lp, 3), lambda i, b: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3, Lp), lambda i, b: (b, 0, 0), memory_space=pltpu.VMEM),
    ]
    if exact:
        kernel = _kernel_exact
        tensors = (padcols(lo), padcols(w))
    else:
        kernel = _kernel
        tensors = (padcols(lo), padcols(hi), padcols(w))

    grid = (Lb // TM, B)
    e_parts, grad = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=common_in + [tile_spec] * len(tensors) + [
            pl.BlockSpec((1, Lp), lambda i, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, 1), lambda i, b: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TM, 1), lambda i, b: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TM, 3), lambda i, b: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Lb, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, Lb, 3), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int((22 if exact else 40) * Lp) * Lb * B,
            bytes_accessed=int(4 * Lp) * Lb * len(tensors) + B * Lp * 4 * 10,
            transcendentals=Lb * Lp * B,
        ),
        interpret=interpret,
    )(
        params, row0, x, xt, *tensors,
        bm[None, :], bm_rows.astype(jnp.float32)[:, None],
    )
    return jnp.sum(e_parts[:, :, 0], axis=1), grad


def _pairwise_energy_grad(
    coords: jnp.ndarray,
    restraints: DenseRestraints,
    weights: EnergyWeights,
    bead_mask: jnp.ndarray,
    interpret: bool = False,
    exact: bool = False,
):
    """Single-structure wrapper over the batched kernel."""
    e, g = _pairwise_energy_grad_batched(
        coords[None], restraints, weights, bead_mask, interpret, exact
    )
    return e[0], g[0]


def _bond_energy(coords, weights, bead_mask):
    from chromosome3d_tpu.ops.energy import _angle_energy

    bond_vec = coords[1:] - coords[:-1]
    bond_d = jnp.sqrt(jnp.sum(bond_vec * bond_vec, axis=-1) + _EPS)
    bond_valid = bead_mask[1:] * bead_mask[:-1]
    bdev = bond_d - weights.bond_length
    e = weights.bond * jnp.sum(bond_valid * bdev * bdev)
    # optional chain-stiffness term (AnnealConfig.angle_weight; rides the
    # jnp bonded path around the pair kernel, like the bond term)
    return e + _angle_energy(bond_vec, bond_d, bond_valid, weights)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def pallas_energy(
    coords: jnp.ndarray,
    restraints: DenseRestraints,
    weights: EnergyWeights,
    bead_mask: jnp.ndarray,
    interpret: bool = False,
    exact: bool = False,
) -> jnp.ndarray:
    """Total energy (NOE + vdw fused kernel, + jnp bond term). Same contract
    as ops.energy.energy; differentiable in coords only (the annealer's
    variables) — restraint/weight cotangents are structural zeros.
    exact=True selects the exact-restraint kernel (valid only when
    lo == hi and the well is pure quadratic; see _kernel_exact)."""
    e_pair, _ = _pairwise_energy_grad(
        coords, restraints, weights, bead_mask, interpret, exact
    )
    return e_pair + _bond_energy(coords, weights, bead_mask)


def _fwd(coords, restraints, weights, bead_mask, interpret=False, exact=False):
    e_pair, g_pair = _pairwise_energy_grad(
        coords, restraints, weights, bead_mask, interpret, exact
    )
    e_bond = _bond_energy(coords, weights, bead_mask)
    g_bond = jax.grad(_bond_energy)(coords, weights, bead_mask)
    residuals = (g_pair + g_bond, restraints, weights, bead_mask)
    return e_pair + e_bond, residuals


def _bwd(interpret, exact, residuals, ct):
    g, restraints, weights, bead_mask = residuals
    zero_r = jax.tree.map(jnp.zeros_like, restraints)
    zero_w = jax.tree.map(jnp.zeros_like, weights)
    return (ct * g, zero_r, zero_w, jnp.zeros_like(bead_mask))


pallas_energy.defvjp(_fwd, _bwd)


def _bond_energy_batched(coords, weights, bead_mask):
    """Batched bonded energy = vmap of _bond_energy, so the VALUE comes
    from the same implementation the batched GRADIENT differentiates
    (pallas_energy_and_grad_batched vmaps jax.grad(_bond_energy)) — a
    hand-inlined batched twin here once computed the angle term from a
    second copy of the formula, where an edit to ops.energy._angle_energy
    (the semantic reference) would silently desync energy from descent."""
    return jax.vmap(lambda c: _bond_energy(c, weights, bead_mask))(coords)


def pallas_energy_and_grad_batched(
    coords: jnp.ndarray,        # (B, L, 3)
    restraints: DenseRestraints,
    weights: EnergyWeights,
    bead_mask: jnp.ndarray,
    interpret: bool = False,
    exact: bool = False,
    bf16: bool = False,
):
    """Fused value-and-grad for a shared-restraint batch: the annealer's
    inner step. Returns (energies (B,), grads (B, L, 3)). Not an autodiff
    endpoint — the kernel already computed the exact gradient, so the
    optimizer consumes it directly (the custom_vjp wrapper exists for
    API parity; this path skips even that indirection)."""
    e_pair, g_pair = _pairwise_energy_grad_batched(
        coords, restraints, weights, bead_mask, interpret, exact, bf16=bf16
    )
    e_bond = _bond_energy_batched(coords, weights, bead_mask)
    g_bond = jax.vmap(lambda c: jax.grad(_bond_energy)(c, weights, bead_mask))(coords)
    return e_pair + e_bond, g_pair + g_bond
