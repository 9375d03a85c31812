"""Row-sharded energy + gradient: the sequence-parallel (sp) axis.

At the shipped problem sizes (L <= 663) one chip trivially holds the (L, L)
energy (SURVEY.md section 5), but the framework is built for production scale:
for ultra-high-resolution Hi-C (L in the tens of thousands) the L x L pair
work no longer fits one core's VMEM/HBM budget. The scaling-book recipe:

  * coordinates X (L, 3) are tiny — replicate them (the all-gather is O(L));
  * the (L, L) restraint tensors are sharded by ROW BLOCK over the `beads`
    mesh axis — they never move;
  * each device computes the energy partial + the gradient rows for its
    block (full-row convention: each unordered pair is seen by both
    endpoints' rows, so no gradient communication at all);
  * one psum of the scalar energy partials rides the ICI per step.

Implemented with shard_map; composes with the `chrom` data-parallel axis
(vmap/jit outside) into a 2-D mesh. The same decomposition is what the
Pallas kernel does across row *tiles* within a chip — this module is that
pattern lifted across chips.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from chromosome3d_tpu.ops.energy import DenseRestraints, EnergyWeights

_EPS = 1e-12


def _row_block_energy_grad(
    x: jnp.ndarray,          # (L, 3) replicated
    lo: jnp.ndarray,         # (Lb, L) this device's row block
    hi: jnp.ndarray,
    w: jnp.ndarray,          # mask-folded weights block
    bead_mask: jnp.ndarray,  # (L,) replicated
    row_start: jnp.ndarray,  # scalar: global index of this block's first row
    weights: EnergyWeights,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(NOE energy partial, vdw energy partial, gradient rows) for one row
    block (pair terms only; bond is O(L) and computed replicated by callers)."""
    Lb, L = lo.shape
    a = jax.lax.dynamic_slice(x, (row_start, 0), (Lb, 3))
    bm_rows = jax.lax.dynamic_slice(bead_mask, (row_start,), (Lb,))
    diff = a[:, None, :] - x[None, :, :]          # (Lb, L, 3)
    d = jnp.sqrt(jnp.sum(diff * diff, -1) + _EPS)
    pair_valid = bm_rows[:, None] * bead_mask[None, :]

    over = jnp.maximum(d - hi, 0.0)
    under = jnp.maximum(lo - d, 0.0)
    viol = over + under
    s = weights.noe_rswitch
    quad = viol <= s
    well = jnp.where(quad, viol * viol, s * s + 2.0 * s * (viol - s))
    wm = w * pair_valid
    e_noe = 0.5 * weights.noe * jnp.sum(wm * well)
    dwell = jnp.where(quad, 2.0 * viol, 2.0 * s)
    sgn = jnp.where(over > 0.0, 1.0, jnp.where(under > 0.0, -1.0, 0.0))
    c_noe = weights.noe * wm * dwell * sgn

    rows = row_start + jax.lax.broadcasted_iota(jnp.int32, (Lb, L), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (Lb, L), 1)
    nonbonded = (jnp.abs(rows - cols) >= 2).astype(x.dtype) * pair_valid
    overlap = jnp.maximum(weights.vdw_radius - d, 0.0)
    e_vdw = 0.5 * weights.vdw * jnp.sum(nonbonded * overlap * overlap)
    c_vdw = -2.0 * weights.vdw * nonbonded * overlap

    c = (c_noe + c_vdw) / d                        # (Lb, L)
    grad_rows = a * jnp.sum(c, 1, keepdims=True) - c @ x
    return e_noe, e_vdw, grad_rows


def make_sharded_energy_grad(mesh: Mesh, weights: EnergyWeights, axis: str = "beads"):
    """Build a shard_map'ed (energy, grad) function over `axis` of `mesh`.

    Inputs: coords (L, 3) + DenseRestraints with (L, L) tensors (rows will be
    sharded over `axis`; L must divide by the axis size) + bead_mask (L,).
    Returns (total pair energy scalar, grad (L, 3)). Bond term excluded
    (O(L); callers add it replicated, as ops.pallas_energy does).
    """
    n = mesh.shape[axis]

    def shard_fn(x, lo, hi, w, bead_mask):
        idx = jax.lax.axis_index(axis)
        Lb = lo.shape[0]
        row_start = idx * Lb
        e_noe, e_vdw, g_rows = _row_block_energy_grad(
            x, lo, hi, w, bead_mask, row_start, weights
        )
        return jax.lax.psum(e_noe + e_vdw, axis), g_rows

    mapped = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(axis, None), P(axis, None), P(axis, None), P()),
        out_specs=(P(), P(axis, None)),
        check_vma=False,
    )

    def fn(coords, restraints: DenseRestraints, bead_mask):
        L = coords.shape[0]
        if L % n:
            raise ValueError(f"L={L} must be a multiple of the {axis} axis size {n}")
        return mapped(
            coords,
            restraints.lo,
            restraints.hi,
            restraints.mask * restraints.weight,
            bead_mask,
        )

    return fn
