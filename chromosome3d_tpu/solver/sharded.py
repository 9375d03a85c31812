"""Sequence-parallel annealing: the full solve with the (L, L) energy
row-sharded over a `beads` mesh axis.

For L far beyond the shipped sizes (ultra-high-resolution Hi-C), one core
cannot hold the O(L^2) restraint tensors. These solvers keep coordinates and
optimizer state replicated (O(L) — tiny) and shard the quadratic work:
per step, each device computes its row block's energy partial + gradient
rows (parallel.sharded_energy), the gradient is all-gathered (L*3 floats,
rides the ICI), and every device applies the identical Adam/Langevin update.

Two entry points:
  * solve_single_sharded  — one structure from a provided x0; trajectory-
    equal to solver.anneal.solve_single (tested on a CPU mesh).
  * solve_ensemble_sharded — the FULL production program at scale: landmark
    init computed from the sharded rows (no host-fed x0), mirror-pair
    batch, hot phase, CNS-style enantiomer pick, cool + final on the
    winners — the sharded counterpart of solver.anneal.solve_ensemble_impl.
    Per step the only collectives are one psum (scalars) and one
    all-gather of (n, L, 3) gradient rows, both riding the ICI. With
    cfg.use_pallas the per-shard hot loop runs the fused row-block Pallas
    kernel (ops.pallas_energy.pallas_row_block_energy_grad_batched) — the
    same VMEM pass the single-chip path has, handed the shard's global row
    offset.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
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
from chromosome3d_tpu.solver.init import (
    chain_metric_rows,
    clip_landmark_targets,
    landmark_indices,
    landmark_triangulate,
    relax_landmarks_block,
    relax_landmarks_lower_block,
)

_EPS = 1e-12
_BIG = 1e6


def _bonded_energy(c, bead, weights):
    """Bond + optional angle-stiffness energy of one structure — the O(L)
    bonded terms every shard computes replicated (ops.energy semantics)."""
    from chromosome3d_tpu.ops.energy import _angle_energy

    bond_vec = c[1:] - c[:-1]
    bond_d = jnp.sqrt(jnp.sum(bond_vec * bond_vec, -1) + _EPS)
    bond_valid = bead[1:] * bead[:-1]
    bdev = bond_d - weights.bond_length
    e = weights.bond * jnp.sum(bond_valid * bdev * bdev)
    return e + _angle_energy(bond_vec, bond_d, bond_valid, weights)


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
            angle=base.angle,
        )
        e_noe, e_vdw, g_rows = _row_block_energy_grad(
            x, lo, hi, w, bead, row_start, weights
        )
        e = jax.lax.psum(e_noe + e_vdw, axis)
        grad = jax.lax.all_gather(g_rows, axis, axis=0, tiled=True)  # (L, 3)
        # bonded terms (bond + optional angle): O(L), replicated per shard
        e_bond, gb = jax.value_and_grad(_bonded_energy)(x, bead, weights)
        return e + e_bond, grad + gb

    mapped = jax.shard_map(
        shard_step_fn,
        mesh=mesh,
        in_specs=(P(), P(axis, None), P(axis, None), P(axis, None), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )

    # alias-aware fold: for the two-tensor ExactRestraints form this is the
    # stored w (and lo/hi below are the SAME value, which XLA aliases to one
    # buffer) — the sharded solve then holds exactly 2 restraint tensors
    from chromosome3d_tpu.ops.pallas_energy import exact_pair_tiles

    _, w_folded = exact_pair_tiles(restraints)

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


class ShardedEnsembleResult(NamedTuple):
    coords: jnp.ndarray                 # (n_models, L, 3), centroid at origin
    energies: Dict[str, jnp.ndarray]    # each (n_models,), canonical weights
    history: jnp.ndarray                # (n_models, T) total energy per step


def _schedule_weights(cfg: AnnealConfig, base: EnergyWeights, vdw_w, repel):
    return EnergyWeights(
        noe=base.noe,
        bond=base.bond,
        bond_length=base.bond_length,
        vdw=vdw_w,
        vdw_radius=repel * cfg.vdw_radius,
        noe_rswitch=base.noe_rswitch,
        angle=base.angle,
    )


def solve_ensemble_sharded(
    mesh: Mesh,
    restraints: DenseRestraints,
    cfg: AnnealConfig,
    key: jax.Array,
    n_models: int,
    bead_mask: Optional[jnp.ndarray] = None,
    schedule: Optional[Schedule] = None,
    axis: str = "beads",
    or_groups=None,
) -> ShardedEnsembleResult:
    """The full ensemble solve with the O(L^2) work row-sharded over `axis`:
    landmark init from the sharded restraint rows, mirror-pair hot phase,
    CNS-style enantiomer pick (chromosome3D.pl:1605-1727), cool + final on
    the winners — no host-fed x0, no (L, L) tensor ever replicated.

    Matches solver.anneal.solve_ensemble_impl semantics with
    init="landmark" (tested equal on a CPU mesh). L must be a multiple of
    the axis size (pad with bead_mask; see pad_restraints_to_multiple).

    or_groups: optional ambiguous (`or`-group) restraints
    (ops.energy.OrGroupRestraints) — the group-min well joins the energy.
    Coordinates are replicated across the axis, so the O(R*G) group term
    computes REPLICATED on every shard like the bonded terms (no
    collectives; tiny next to the sharded O(L^2/n) pair work) — at-scale
    external CNS tbl files with ambiguous rows keep the sharded path
    (chromosome3D.pl:487-554 defines the layouts; CNS solves them at any
    size)."""
    L = restraints.lo.shape[0]
    n_dev = mesh.shape[axis]
    if L % n_dev:
        raise ValueError(f"L={L} must be a multiple of the {axis} axis size {n_dev}")
    if bead_mask is None:
        bead_mask = jnp.ones((L,), dtype=jnp.float32)
    sched = build_schedule(cfg) if schedule is None else schedule
    srows = jnp.stack(
        [sched.lr, sched.sigma, sched.vdw_weight, sched.repel_scale], axis=-1
    )
    shard_fn = _ensemble_shard_fn(
        cfg, n_models, L, n_dev, sched, axis, with_og=or_groups is not None
    )

    og_args = () if or_groups is None else (or_groups,)
    og_specs = () if or_groups is None else (P(),)   # replicated subtree
    mapped = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            P(axis, None), P(axis, None), P(axis, None), P(), P(), P(),
        ) + og_specs,
        out_specs=(P(), {"noe": P(), "bon": P(), "vdw": P(), "overall": P()}, P()),
        check_vma=False,
    )
    from chromosome3d_tpu.ops.pallas_energy import exact_pair_tiles

    t_lo, w_folded = exact_pair_tiles(restraints)
    coords, terms, history = mapped(
        t_lo,
        restraints.hi,   # == t_lo for ExactRestraints: XLA aliases, no copy
        w_folded,
        bead_mask,
        key,
        srows,
        *og_args,
    )
    return ShardedEnsembleResult(coords=coords, energies=terms, history=history)


def _ensemble_shard_fn(cfg: AnnealConfig, n_models: int, L: int, n_dev: int,
                       sched: Schedule, axis: str, with_og: bool = False):
    """Build the per-device ensemble shard body shared by the 1-D sp solver
    (solve_ensemble_sharded) and the 2-D chrom x beads genome solver
    (solve_genome_sharded, which vmaps it over chromosomes — the collectives
    inside batch cleanly under vmap).

    with_og: the body takes a trailing replicated OrGroupRestraints arg and
    adds the group-min well — computed per shard on the replicated coords
    like the bonded terms (identical on every device, no collectives)."""
    base = _final_weights(cfg)
    n_eff = n_models * 2 if cfg.enantiomer else n_models
    hot = cfg.hot_steps
    k_land = min(cfg.landmark_count, L)
    # hot-loop kernel selection: the Pallas row-block kernel gives each shard
    # the same fused VMEM pass the single-chip path has (interpret mode off
    # TPU, e.g. the CPU-mesh tests). The exact specialization mirrors
    # solver.anneal's condition.
    from chromosome3d_tpu.solver.anneal import resolve_use_pallas

    exact = cfg.exact_restraints and cfg.noe_rswitch >= 1e8
    pallas_req = resolve_use_pallas(cfg) and (L // n_dev) % 8 == 0  # sublane-tileable blocks
    interpret = jax.default_backend() != "tpu"
    # FUSED-UPDATE (semi) sharded path: the same gate as the single-chip
    # solve_ensemble_impl `fusable` — the pair kernel feeds the fused update
    # companion (bond/clip/Adam/noise/move in ONE kernel, T layout), killing
    # the optax+threefry glue the round-3 VERDICT measured at ~15%/step.
    # Where shard boundaries align with tri tiles, the pair math itself runs
    # the STRIP-TRIANGULAR kernel: the global round-robin tile pairing
    # distributed over the mesh axis, so each unordered tile pair is
    # computed once ACROSS shards (~2x less pair work than the full-row
    # convention); the gradient then needs a psum instead of an all_gather.
    from chromosome3d_tpu.ops.pallas_energy import (
        row_block_feasible,
        strip_tri_feasible,
    )

    # the row-block kernel's minimum (8, Lp) tile outgrows the scoped-VMEM
    # budget past global L ~ 54k — beyond that only the strip-tri kernel
    # (whose tiles span Lb, not L) or the chunked jnp fallback can run
    rb_ok = pallas_req and row_block_feasible(L, n_dev, exact)
    fusable = (
        pallas_req and cfg.fuse_update and cfg.angle_weight == 0.0
    )
    # the strip-triangular kernel reads the two-tensor (target, weight)
    # exact form; GENERAL (windowed) restraints keep the row-block pair
    # kernel but still feed the fused update companion (same round-4
    # dispatch symmetry as solve_ensemble_impl's semi-general path)
    strip_tri = fusable and exact and strip_tri_feasible(L, n_dev)
    fusable = fusable and (strip_tri or rb_ok)
    use_pallas = rb_ok or strip_tri

    def shard_fn(lo, hi, w, bead, key, srows, og=None):
        """Everything below runs per device on its (Lb, L) restraint rows;
        coordinates, optimizer state, and RNG are replicated (identical on
        every device), so only psum/pmin/all_gather touch the ICI."""
        idx = jax.lax.axis_index(axis)
        Lb = lo.shape[0]
        row_start = idx * Lb

        # ---- landmark init from the sharded rows ----
        # two-sided: the upper relaxation paths through HI edges (the
        # bounds-matrix convention — see solver.init landmark_targets'
        # edge_rows use_hi note).
        # Tiles may arrive bf16-STORED (device_prep out_dtype="bfloat16");
        # the init math runs f32 like the single-chip path's upcast — these
        # casts are init-transient, the hot loop reads the tiles natively
        target = (hi if cfg.embed_two_sided else 0.5 * (lo + hi)).astype(
            jnp.float32
        )
        rows_g = row_start + jax.lax.broadcasted_iota(jnp.int32, (Lb, L), 0)
        cols_g = jax.lax.broadcasted_iota(jnp.int32, (Lb, L), 1)
        bm_rows = jax.lax.dynamic_slice(bead, (row_start,), (Lb,))
        pair_real = (bm_rows[:, None] * bead[None, :]) > 0
        w_edges = jnp.where(w > 0, target, _BIG)
        adjacent = (jnp.abs(rows_g - cols_g) == 1) & pair_real
        w_edges = jnp.where(adjacent, jnp.minimum(w_edges, cfg.bond_length), w_edges)
        w_edges = jnp.where(rows_g == cols_g, 0.0, w_edges)
        n_real = bead.sum()
        lidx = landmark_indices(L, k_land, n_real)
        delta = chain_metric_rows(lidx, L, cfg.bond_length)

        def sweep(delta, _):
            cand = relax_landmarks_block(delta, w_edges, row_start)
            cand = jax.lax.pmin(cand, axis)
            return jnp.minimum(delta, cand), None

        delta, _ = jax.lax.scan(sweep, delta, None, length=cfg.landmark_iters)
        if cfg.embed_two_sided:
            # bounds-MATRIX semantics at scale (solver.init.landmark_targets
            # run on the sharded rows): raise landmark-row lower bounds by
            # the inverse-triangle sweep over this block's lo rows (pmax
            # across the axis), then clip restrained targets into their
            # smoothed window — identical to the single-device two-sided
            # landmark path (tested equal on the CPU mesh)
            mask_rows = (w > 0).astype(delta.dtype) * pair_real.astype(delta.dtype)
            lo_rows = jnp.where(mask_rows > 0, lo.astype(delta.dtype), 0.0)
            lrel = lidx - row_start
            own = (lrel >= 0) & (lrel < Lb)
            lsafe = jnp.clip(lrel, 0, Lb - 1)
            lo_land = jnp.where(
                own[:, None], jnp.take(lo_rows, lsafe, axis=0), -_BIG
            )
            mask_land = jnp.where(
                own[:, None], jnp.take(mask_rows, lsafe, axis=0), -_BIG
            )
            lo_land = jax.lax.pmax(lo_land, axis)
            mask_land = jax.lax.pmax(mask_land, axis)
            cand = jax.lax.pmax(
                relax_landmarks_lower_block(delta, lo_rows, row_start), axis
            )
            delta = clip_landmark_targets(
                delta, jnp.maximum(lo_land, cand), mask_land
            )
        x0 = landmark_triangulate(delta, lidx).astype(jnp.float32)
        x0 = x0 * bead[:, None]

        # ---- mirror pairs + per-restart jitter (replicated RNG) ----
        if cfg.enantiomer:
            signs = jnp.tile(jnp.asarray([1.0, -1.0], jnp.float32), n_models)
        else:
            signs = jnp.ones((n_eff,), jnp.float32)
        key_, jkey = jax.random.split(key)
        xs = x0[None, :, :] * jnp.stack(
            [signs, jnp.ones_like(signs), jnp.ones_like(signs)], axis=-1
        )[:, None, :]
        xs = xs + cfg.init_noise * jax.random.normal(jkey, xs.shape) * bead[None, :, None]

        def bond_energy(c):
            return _bonded_energy(c, bead, base)

        bond_vg = jax.vmap(jax.value_and_grad(bond_energy))

        if with_og:
            # group-min well on the replicated coords — per shard, no
            # collectives (ops.energy.or_group_energy; O(R*G) gathers)
            from chromosome3d_tpu.ops.energy import or_group_energy

            def og_vg(x, weights):
                return jax.vmap(
                    jax.value_and_grad(
                        lambda c: or_group_energy(c, og, weights, bead)
                    )
                )(x)
        else:
            og_vg = None    # use sites guard on with_og (static)

        def pair_terms(x, weights):
            """(e_noe, e_vdw, grad) per structure, psum'd/gathered."""
            e_noe, e_vdw, g_rows = jax.vmap(
                lambda c: _row_block_energy_grad(
                    c, lo, hi, w, bead, row_start, weights
                )
            )(x)
            e_noe = jax.lax.psum(e_noe, axis)
            e_vdw = jax.lax.psum(e_vdw, axis)
            g = jax.lax.all_gather(g_rows, axis, axis=1, tiled=True)  # (n, L, 3)
            return e_noe, e_vdw, g

        if use_pallas:
            from chromosome3d_tpu.ops.pallas_energy import (
                pallas_row_block_energy_grad_batched,
            )

            def pair_total_and_grad(x, weights):
                e_p, g_rows = pallas_row_block_energy_grad_batched(
                    x, lo, hi, w, bead, bm_rows, row_start, weights,
                    interpret=interpret, exact=exact,
                )
                e = jax.lax.psum(e_p, axis)
                g = jax.lax.all_gather(g_rows, axis, axis=1, tiled=True)
                return e, g
        else:
            def pair_total_and_grad(x, weights):
                e_noe, e_vdw, g = pair_terms(x, weights)
                return e_noe + e_vdw, g

        # Adam bias corrections precomputed for the whole schedule as srow
        # columns (identical to solver.anneal's scheme; the fused update
        # companion consumes them, the unfused path ignores them)
        tsteps = jnp.arange(1, srows.shape[0] + 1, dtype=jnp.float32)
        srows6 = jnp.concatenate(
            [
                srows,
                (1.0 / (1.0 - jnp.power(jnp.float32(0.9), tsteps)))[:, None],
                (1.0 / (1.0 - jnp.power(jnp.float32(0.999), tsteps)))[:, None],
            ],
            axis=1,
        )

        if fusable:
            # SEMI-fused sharded step: pair kernel -> psum/all_gather ->
            # fused update companion (pallas_fused_update_batched). The
            # update runs replicated on every shard (its counter-hash noise
            # is deterministic, so replicas stay bitwise identical); the
            # seed derivation mirrors solve_ensemble_impl's key sequence.
            from chromosome3d_tpu.ops.pallas_energy import (
                assemble_strip_tri_grad,
                pallas_fused_update_batched,
                pallas_strip_tri_energy_grad_batched,
                pick_tile_tri_strip,
            )

            if strip_tri:
                TM_s = pick_tile_tri_strip(Lb)
                row0t = row_start // TM_s
                # the kernel reads the UNROLLED strip/coords/bead — the
                # row-tile offset rides as a scalar-prefetch operand of the
                # block index maps, so no rolled tile copies exist (the
                # first round-4 version rolled lo/w per solve and xT per
                # step: 2 extra (Lb, L) tensors live for the whole scan)
                t_strip, w_strip = lo, w
                if cfg.pair_bf16:
                    # AnnealConfig.pair_bf16: bf16 tiles, f32 math (no-op
                    # when the tiles already arrive bf16-STORED)
                    t_strip = t_strip.astype(jnp.bfloat16)
                    w_strip = w_strip.astype(jnp.bfloat16)

                def pair_T(xT, weights):
                    """(pair energy (n,), pair grad (n, 3, L)) — T layout,
                    ready for the companion; ~half the pair math of the
                    full-row convention, one psum of (n, 3, L)."""
                    e_p, grow, gcol = pallas_strip_tri_energy_grad_batched(
                        jnp.swapaxes(xT, 1, 2), xT, t_strip, w_strip,
                        bead, row0t, weights,
                        interpret=interpret, gram=cfg.gram_d2,
                    )
                    g_loc = assemble_strip_tri_grad(grow, gcol, row_start, L)
                    return (
                        jax.lax.psum(e_p, axis),
                        jax.lax.psum(g_loc, axis),
                    )
            else:
                def pair_T(xT, weights):
                    e, g = pair_total_and_grad(jnp.swapaxes(xT, 1, 2), weights)
                    return e, jnp.swapaxes(g, 1, 2)

            key_, skey = jax.random.split(key_)
            seed = jax.random.randint(skey, (), 0, jnp.int32(2**31 - 1))
            clip_val = -1.0 if cfg.gradient_clip is None else cfg.gradient_clip
            xsT = jnp.swapaxes(xs, 1, 2)
            carry0 = (xsT, jnp.zeros_like(xsT), jnp.zeros_like(xsT), jnp.int32(0))

            def step(carry, srow):
                xT, muT, nuT, count = carry
                lr, sigma, vdw_w, repel = srow[0], srow[1], srow[2], srow[3]
                weights = _schedule_weights(cfg, base, vdw_w, repel)
                e_pair, gT = pair_T(xT, weights)
                if with_og:
                    # the group term rides OUTSIDE the kernels as an
                    # additive value-and-grad, joining gT before the fused
                    # update companion (same scheme as the single-chip
                    # semi path)
                    e_og, g_og = og_vg(jnp.swapaxes(xT, 1, 2), weights)
                    e_pair = e_pair + e_og
                    gT = gT + jnp.swapaxes(g_og, 1, 2)
                e_b, xT, muT, nuT = pallas_fused_update_batched(
                    xT, gT, muT, nuT, weights, bead, lr, sigma,
                    srow[4], srow[5], seed, count, clip_val,
                    interpret=interpret,
                )
                return (xT, muT, nuT, count + 1), e_pair + e_b

            def select(carry, sel):
                xT, muT, nuT, count = carry
                return (xT[sel], muT[sel], nuT[sel], count)

            def carry_coords(carry):
                return jnp.swapaxes(carry[0], 1, 2)

            def hot_pair_energy(x, weights):
                return pair_T(jnp.swapaxes(x, 1, 2), weights)[0]
        else:
            opt = optax.scale_by_adam()
            carry0 = (xs, opt.init(xs), key_)

            def step(carry, srow):
                x, opt_state, k = carry
                lr, sigma, vdw_w, repel = srow[0], srow[1], srow[2], srow[3]
                weights = _schedule_weights(cfg, base, vdw_w, repel)
                e_pair, g = pair_total_and_grad(x, weights)
                e_bond, g_bond = bond_vg(x)
                if with_og:
                    e_og, g_og = og_vg(x, weights)
                    e_pair = e_pair + e_og
                    g = g + g_og
                e = e_pair + e_bond
                g = _clip_per_bead(g + g_bond, cfg.gradient_clip)
                updates, opt_state = opt.update(g, opt_state)
                k, nkey = jax.random.split(k)
                noise = sigma * jax.random.normal(nkey, x.shape)
                x = x + (-lr * updates + noise) * bead[None, :, None]
                return (x, opt_state, k), e

            def select(carry, sel):
                x, opt_state, k = carry
                opt_state = jax.tree.map(
                    lambda a: a[sel]
                    if (hasattr(a, "ndim") and a.ndim >= 1 and a.shape[0] == n_eff)
                    else a,
                    opt_state,
                )
                return (x[sel], opt_state, k)

            def carry_coords(carry):
                return carry[0]

            def hot_pair_energy(x, weights):
                e_noe, e_vdw, _ = pair_terms(x, weights)
                return e_noe + e_vdw

        if cfg.enantiomer:
            carry, hist_hot = jax.lax.scan(step, carry0, srows6[:hot])
            w_hot = _schedule_weights(
                cfg, base, sched.vdw_weight[hot - 1], sched.repel_scale[hot - 1]
            )
            e_bond, _ = bond_vg(carry_coords(carry))
            e_hot = hot_pair_energy(carry_coords(carry), w_hot) + e_bond
            if with_og:
                e_hot = e_hot + og_vg(carry_coords(carry), w_hot)[0]
            pick = jnp.argmin(e_hot.reshape(n_models, 2), axis=1)
            sel = jnp.arange(n_models) * 2 + pick
            carry = select(carry, sel)
            hist_hot = hist_hot[:, sel]
            carry, hist_rest = jax.lax.scan(step, carry, srows6[hot:])
            history = jnp.concatenate([hist_hot, hist_rest], axis=0).T
        else:
            carry, history = jax.lax.scan(step, carry0, srows6)
            history = history.T
        xs = carry_coords(carry)

        # ---- final canonical-weight terms + centroid to origin ----
        e_noe, e_vdw, _ = pair_terms(xs, base)
        if with_og:
            # the group well reports inside `noe` (ops.energy.energy_terms
            # convention)
            e_noe = e_noe + og_vg(xs, base)[0]
        e_bond, _ = bond_vg(xs)
        terms = {
            "noe": e_noe,
            "bon": e_bond,
            "vdw": e_vdw,
            "overall": e_noe + e_vdw + e_bond,
        }
        nvalid = jnp.maximum(bead.sum(), 1.0)
        centroid = (xs * bead[None, :, None]).sum(axis=1, keepdims=True) / nvalid
        xs = (xs - centroid) * bead[None, :, None]
        return xs, terms, history

    return shard_fn


def solve_genome_sharded(
    mesh: Mesh,
    batched: DenseRestraints,
    cfg: AnnealConfig,
    keys: jax.Array,
    n_models: int,
    bead_masks: Optional[jnp.ndarray] = None,
    schedule: Optional[Schedule] = None,
    chrom_axis: str = "chrom",
    beads_axis: str = "beads",
) -> ShardedEnsembleResult:
    """Many chromosomes, each beyond one chip, in ONE program: the full
    sharded ensemble solve over a 2-D (chrom x beads) mesh. Chromosomes
    split over `chrom_axis` (data parallel, zero collectives between them);
    each chromosome's O(L^2) restraint rows split over `beads_axis` exactly
    as solve_ensemble_sharded does (the same shard body, vmapped over the
    device-local chromosomes — its psum/pmin/all_gather batch under vmap).

    This composes the genome runner's dp axis with the sp axis: the
    reference's whole-genome story is 46 independent processes
    (test.sh:4-11) capped at 663 beads each (chromosome3D.pl:93-94); here
    one mesh covers arbitrarily many chromosomes of one-chip-exceeding
    length. batched: (B, L, L) tensors; keys: (B, 2) one PRNG key per
    chromosome; B must divide the chrom axis, L the beads axis.
    Returns batched results with a leading chromosome axis."""
    B, L = batched.lo.shape[0], batched.lo.shape[1]
    nc, nb = mesh.shape[chrom_axis], mesh.shape[beads_axis]
    if B % nc:
        raise ValueError(f"B={B} must be a multiple of the {chrom_axis} axis {nc}")
    if L % nb:
        raise ValueError(f"L={L} must be a multiple of the {beads_axis} axis {nb}")
    if bead_masks is None:
        bead_masks = jnp.ones((B, L), dtype=jnp.float32)
    sched = build_schedule(cfg) if schedule is None else schedule
    srows = jnp.stack(
        [sched.lr, sched.sigma, sched.vdw_weight, sched.repel_scale], axis=-1
    )
    shard_fn = _ensemble_shard_fn(cfg, n_models, L, nb, sched, beads_axis)
    vshard = jax.vmap(shard_fn, in_axes=(0, 0, 0, 0, 0, None))

    Pc, Pcb = P(chrom_axis), P(chrom_axis, beads_axis, None)
    mapped = jax.shard_map(
        vshard,
        mesh=mesh,
        in_specs=(Pcb, Pcb, Pcb, P(chrom_axis, None), P(chrom_axis, None), P()),
        out_specs=(Pc, {"noe": Pc, "bon": Pc, "vdw": Pc, "overall": Pc}, Pc),
        check_vma=False,
    )
    from chromosome3d_tpu.ops.pallas_energy import exact_pair_tiles

    t_lo, w_folded = exact_pair_tiles(batched)
    coords, terms, history = mapped(
        t_lo,
        batched.hi,      # == t_lo for ExactRestraints: XLA aliases, no copy
        w_folded,
        bead_masks,
        keys,
        srows,
    )
    return ShardedEnsembleResult(coords=coords, energies=terms, history=history)


def pad_restraints_to_multiple(restraints, n_dev: int):
    """Host-side helper: pad a chromosome3d_tpu.restraints.Restraints to the
    next multiple of n_dev and return (padded Restraints, bead_mask ndarray).
    Use before dense_restraints_from_numpy for the sharded solvers."""
    L = restraints.length
    L_pad = -(-L // n_dev) * n_dev
    bead = np.zeros(L_pad, dtype=np.float32)
    bead[:L] = 1.0
    return restraints.padded(L_pad), bead
