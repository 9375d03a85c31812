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

from chromosome3d_tpu.ops.energy import DenseRestraints, EnergyWeights

_EPS = 1e-12
TILE_M = 128


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
    return 8


def _kernel(
    params_ref,   # SMEM (8,): noe_w, vdw_w, vdw_radius, rswitch, L_real (unused pad..)
    x_ref,        # (1, L, 3) this structure's coords
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

    noe_w = params_ref[0]
    vdw_w = params_ref[1]
    vdw_radius = params_ref[2]
    rswitch = params_ref[3]

    x = x_ref[0]                                   # (L, 3)
    a = x_ref[0, pl.ds(i * TM, TM), :]             # (TM, 3)

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
    rows = jax.lax.broadcasted_iota(jnp.int32, (TM, Lp), 0) + i * TM
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

    noe_w = params_ref[0]
    vdw_w = params_ref[1]
    vdw_radius = params_ref[2]

    x = x_ref[0]
    a = x_ref[0, pl.ds(i * TM, TM), :]

    d2 = jnp.zeros((TM, xt_ref.shape[2]), jnp.float32)
    for c in range(3):
        diff = a[:, c:c + 1] - xt_ref[0, c:c + 1, :]
        d2 = d2 + diff * diff
    rinv = jax.lax.rsqrt(d2 + _EPS)
    d = (d2 + _EPS) * rinv

    pair_valid = bmcol_ref[:] * bmrow_ref[:]
    w = w_ref[:] * pair_valid
    dev = d - t_ref[:]
    e_noe = 0.5 * noe_w * jnp.sum(w * dev * dev, axis=1, keepdims=True)
    c_noe = noe_w * w * (2.0 * dev)

    Lp = xt_ref.shape[2]
    rows = jax.lax.broadcasted_iota(jnp.int32, (TM, Lp), 0) + i * TM
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


@functools.partial(jax.jit, static_argnames=("interpret", "exact"))
def _pairwise_energy_grad_batched(
    coords: jnp.ndarray,       # (B, L, 3)
    restraints: DenseRestraints,
    weights: EnergyWeights,
    bead_mask: jnp.ndarray,    # (L,)
    interpret: bool = False,
    exact: bool = False,
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
    """
    B, L, _ = coords.shape
    Lp = _round_up(max(L, 8), TILE_M)
    padn = Lp - L

    def pad2(m):
        return jnp.pad(m, ((0, padn), (0, padn)))

    x = jnp.pad(coords.astype(jnp.float32), ((0, 0), (0, padn), (0, 0)))
    w = pad2(restraints.mask * restraints.weight)
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
        pl.BlockSpec((1, Lp, 3), lambda i, b: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3, Lp), lambda i, b: (b, 0, 0), memory_space=pltpu.VMEM),
    ]
    if exact:
        kernel = _kernel_exact
        # exact restraints: lo == hi == target, ONE restraint tensor
        tensors = (pad2(restraints.lo), w)
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
    )(params, x, xt, *tensors, bm[None, :], bm[:, None])
    return jnp.sum(e_parts[:, :, 0], axis=1), grad[:, :L, :]


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
    bond_vec = coords[1:] - coords[:-1]
    bond_d = jnp.sqrt(jnp.sum(bond_vec * bond_vec, axis=-1) + _EPS)
    bond_valid = bead_mask[1:] * bead_mask[:-1]
    bdev = bond_d - weights.bond_length
    return weights.bond * jnp.sum(bond_valid * bdev * bdev)


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
    bond_vec = coords[:, 1:, :] - coords[:, :-1, :]
    bond_d = jnp.sqrt(jnp.sum(bond_vec * bond_vec, axis=-1) + _EPS)
    bond_valid = (bead_mask[1:] * bead_mask[:-1])[None, :]
    bdev = bond_d - weights.bond_length
    return weights.bond * jnp.sum(bond_valid * bdev * bdev, axis=1)


def pallas_energy_and_grad_batched(
    coords: jnp.ndarray,        # (B, L, 3)
    restraints: DenseRestraints,
    weights: EnergyWeights,
    bead_mask: jnp.ndarray,
    interpret: bool = False,
    exact: bool = False,
):
    """Fused value-and-grad for a shared-restraint batch: the annealer's
    inner step. Returns (energies (B,), grads (B, L, 3)). Not an autodiff
    endpoint — the kernel already computed the exact gradient, so the
    optimizer consumes it directly (the custom_vjp wrapper exists for
    API parity; this path skips even that indirection)."""
    e_pair, g_pair = _pairwise_energy_grad_batched(
        coords, restraints, weights, bead_mask, interpret, exact
    )
    e_bond = _bond_energy_batched(coords, weights, bead_mask)
    g_bond = jax.vmap(lambda c: jax.grad(_bond_energy)(c, weights, bead_mask))(coords)
    return e_pair + e_bond, g_pair + g_bond
