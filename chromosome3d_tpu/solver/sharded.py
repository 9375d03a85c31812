"""Sequence-parallel annealing: the full solve with the (L, L) energy
row-sharded over a `beads` mesh axis.

For L far beyond the shipped sizes (ultra-high-resolution Hi-C), one core
cannot hold the O(L^2) restraint tensors. This solver keeps coordinates and
optimizer state replicated (O(L) — tiny) and shards the quadratic work:
per step, each device computes its row block's energy partial + gradient
rows (parallel.sharded_energy), the gradient is all-gathered (L*3 floats,
rides the ICI), and every device applies the identical Adam/Langevin update.

Semantics match solver.anneal.solve_single exactly (same schedule, same RNG
stream shape); tested for trajectory equality on a CPU mesh.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

import optax

from chromosome3d_tpu.config import AnnealConfig
from chromosome3d_tpu.ops.energy import DenseRestraints, EnergyWeights
from chromosome3d_tpu.parallel.sharded_energy import _row_block_energy_grad
from chromosome3d_tpu.solver.anneal import (
    Schedule,
    build_schedule,
    _clip_per_bead,
    _final_weights,
)

_EPS = 1e-12


def solve_single_sharded(
    mesh: Mesh,
    restraints: DenseRestraints,
    cfg: AnnealConfig,
    key: jax.Array,
    x0: jnp.ndarray,
    bead_mask: Optional[jnp.ndarray] = None,
    schedule: Optional[Schedule] = None,
    axis: str = "beads",
):
    """Anneal one structure with row-sharded energy. Returns (coords, history).

    L must be a multiple of the `beads` axis size. All inputs arrive
    replicated; restraint rows are laid out over the axis by shard_map.
    """
    L = x0.shape[0]
    n = mesh.shape[axis]
    if L % n:
        raise ValueError(f"L={L} must be a multiple of the {axis} axis size {n}")
    if bead_mask is None:
        bead_mask = jnp.ones((L,), dtype=jnp.float32)
    sched = build_schedule(cfg) if schedule is None else schedule
    base = _final_weights(cfg)

    def shard_step_fn(x, lo, hi, w, bead, srow):
        """Runs per shard: full-row energy/grad for owned rows, then a
        replicated update from the all-gathered gradient."""
        idx = jax.lax.axis_index(axis)
        Lb = lo.shape[0]
        row_start = idx * Lb
        lr, sigma, vdw_w, repel = srow
        weights = EnergyWeights(
            noe=base.noe,
            bond=base.bond,
            bond_length=base.bond_length,
            vdw=vdw_w,
            vdw_radius=repel * cfg.vdw_radius,
            noe_rswitch=base.noe_rswitch,
        )
        e, g_rows = _row_block_energy_grad(x, lo, hi, w, bead, row_start, weights)
        e = jax.lax.psum(e, axis)
        grad = jax.lax.all_gather(g_rows, axis, axis=0, tiled=True)  # (L, 3)
        # bond term: O(L), computed replicated on every shard
        bond_vec = x[1:] - x[:-1]
        bond_d = jnp.sqrt(jnp.sum(bond_vec * bond_vec, -1) + _EPS)
        bond_valid = bead[1:] * bead[:-1]
        bdev = bond_d - weights.bond_length
        e = e + weights.bond * jnp.sum(bond_valid * bdev * bdev)
        gb = jax.grad(
            lambda c: weights.bond
            * jnp.sum(
                bond_valid
                * (jnp.sqrt(jnp.sum((c[1:] - c[:-1]) ** 2, -1) + _EPS) - weights.bond_length) ** 2
            )
        )(x)
        return e, grad + gb

    mapped = jax.shard_map(
        shard_step_fn,
        mesh=mesh,
        in_specs=(P(), P(axis, None), P(axis, None), P(axis, None), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )

    w_folded = restraints.mask * restraints.weight

    key, jkey = jax.random.split(key)
    x = x0 + cfg.init_noise * jax.random.normal(jkey, x0.shape) * bead_mask[:, None]

    opt = optax.scale_by_adam()
    opt_state = opt.init(x)

    def step(carry, srow):
        x, opt_state, k = carry
        e, g = mapped(x, restraints.lo, restraints.hi, w_folded, bead_mask, srow)
        g = _clip_per_bead(g, cfg.gradient_clip)
        updates, opt_state = opt.update(g, opt_state)
        k, nkey = jax.random.split(k)
        lr, sigma = srow[0], srow[1]
        noise = sigma * jax.random.normal(nkey, x.shape)
        x = x + (-lr * updates + noise) * bead_mask[:, None]
        return (x, opt_state, k), e

    srows = jnp.stack(
        [sched.lr, sched.sigma, sched.vdw_weight, sched.repel_scale], axis=-1
    )
    (x, _, _), history = jax.lax.scan(step, (x, opt_state, key), srows)
    return x, history
