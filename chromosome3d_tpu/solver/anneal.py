"""The annealing solver: jit lax.scan over the full DGSA-shaped schedule.

TPU-native replacement for the CNS dgsa.inp protocol (SURVEY.md section 3.2;
chromosome3D.pl:882-1846). CNS runs, per model: mmdg embed -> enantiomer
trial -> hot Cartesian MD (T=2000, weight ramps) -> 80-cycle slow cool
(vdw x1.094/cycle 0.003 -> 4.0, repel radius 1.0 -> 0.85, bath -25 K/cycle)
-> 10 x 15000-step LBFGS minimization.

Here the whole protocol is ONE compiled lax.scan of noisy-Adam (Langevin)
steps driven by a precomputed per-step schedule table: temperature becomes
coordinate-noise sigma, the MD integrator becomes Adam (whose per-coordinate
step magnitude is bounded by lr, playing the role of dt), and the final
minimization is the same scan with zero noise and cosine-decayed lr. The
multi-model loop (20 models, chromosome3D.pl:1492,1574) becomes vmap over
PRNG keys; the enantiomer trial mirrors the shared embedding for half the
restarts and keeps the lower-energy member of each pair.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from chromosome3d_tpu.config import AnnealConfig
from chromosome3d_tpu.ops.energy import (
    DenseRestraints,
    EnergyWeights,
    OrGroupRestraints,
    energy,
    energy_terms,
    energy_terms_chunked,
    or_group_energy,
)

# beyond this (padded) L the final canonical-terms pass runs row-chunked;
# below it the dense reference evaluation keeps its exact float-summation
# order (reference-scale buckets top out at Lp = 768)
_CHUNKED_TERMS_MIN_L = 8192
from chromosome3d_tpu.solver.init import (
    landmark_init,
    mds_init,
    random_init,
    spiral_init,
)


class Schedule(NamedTuple):
    """Per-step hyperparameters, stacked as (T,) arrays and scanned over."""

    lr: jnp.ndarray
    sigma: jnp.ndarray        # Langevin noise stddev (A)
    vdw_weight: jnp.ndarray
    repel_scale: jnp.ndarray


class AnnealResult(NamedTuple):
    coords: jnp.ndarray                 # (n, L, 3)
    energies: Dict[str, jnp.ndarray]    # each (n,), final canonical weights
    history: jnp.ndarray                # (n, T) total energy per step


def build_schedule(cfg: AnnealConfig) -> Schedule:
    """Materialize the hot -> cool -> final-min schedule as static arrays.

    Shapes mirror the CNS protocol:
      hot   (ref :1644-1709): T = hot_temperature, vdw tiny, repel 1.0
      cool  (ref :1740-1782): geometric vdw ramp vdw_start -> vdw_final
            (the x1.094/cycle of CNS), linear repel 1.0 -> 0.85, bath
            -temperature_step per cycle
      final (ref :1800-1803): zero temperature, full vdw, cosine-decayed lr
    """
    hot_T = np.full(cfg.hot_steps, cfg.hot_temperature)
    hot_lr = np.full(cfg.hot_steps, cfg.hot_lr)
    hot_vdw = np.full(cfg.hot_steps, cfg.vdw_weight_start)
    hot_rep = np.full(cfg.hot_steps, cfg.repel_start)

    cycles = np.arange(cfg.cool_cycles)
    frac = cycles / max(cfg.cool_cycles - 1, 1)
    cyc_T = np.maximum(
        cfg.hot_temperature - (cycles + 1) * cfg.cool_temperature_step, 0.0
    )
    cyc_vdw = cfg.vdw_weight_start * (
        (cfg.vdw_weight_final / cfg.vdw_weight_start) ** frac
    )
    cyc_rep = cfg.repel_start + (cfg.repel_end - cfg.repel_start) * frac
    reps = cfg.cool_steps_per_cycle
    cool_T = np.repeat(cyc_T, reps)
    cool_vdw = np.repeat(cyc_vdw, reps)
    cool_rep = np.repeat(cyc_rep, reps)
    cool_lr = np.full(cfg.cool_steps, cfg.cool_lr)

    fsteps = np.arange(cfg.final_steps)
    final_lr = cfg.final_lr * 0.5 * (
        1.0 + np.cos(np.pi * fsteps / max(cfg.final_steps - 1, 1))
    )
    final_T = np.zeros(cfg.final_steps)
    final_vdw = np.full(cfg.final_steps, cfg.vdw_weight_final)
    final_rep = np.full(cfg.final_steps, cfg.repel_end)

    temp = np.concatenate([hot_T, cool_T, final_T])
    sigma = cfg.noise_scale * np.sqrt(temp / cfg.hot_temperature)
    return Schedule(
        lr=jnp.asarray(np.concatenate([hot_lr, cool_lr, final_lr]), jnp.float32),
        sigma=jnp.asarray(sigma, jnp.float32),
        vdw_weight=jnp.asarray(np.concatenate([hot_vdw, cool_vdw, final_vdw]), jnp.float32),
        repel_scale=jnp.asarray(np.concatenate([hot_rep, cool_rep, final_rep]), jnp.float32),
    )


def _final_weights(cfg: AnnealConfig) -> EnergyWeights:
    """Canonical end-of-protocol weights used for ranking energies, matching
    what CNS reports in the REMARK block after final minimization."""
    return EnergyWeights(
        noe=jnp.float32(cfg.noe_weight),
        bond=jnp.float32(cfg.bond_weight),
        bond_length=jnp.float32(cfg.bond_length),
        vdw=jnp.float32(cfg.vdw_weight_final),
        vdw_radius=jnp.float32(cfg.repel_end * cfg.vdw_radius),
        noe_rswitch=jnp.float32(cfg.noe_rswitch),
        angle=jnp.float32(cfg.angle_weight),
    )


def _clip_per_bead(g: jnp.ndarray, clip: Optional[float]) -> jnp.ndarray:
    """Scale each bead's gradient 3-vector down to at most `clip` norm
    (AnnealConfig.gradient_clip); identity when clip is None. Works on any
    (..., L, 3) batch."""
    if clip is None:
        return g
    norm = jnp.sqrt(jnp.sum(g * g, axis=-1, keepdims=True) + 1e-12)
    return g * jnp.minimum(1.0, clip / norm)


def resolve_use_pallas(cfg: AnnealConfig) -> bool:
    """AnnealConfig.use_pallas=None means AUTO: the Pallas kernels on TPU
    backends, the dense jnp path elsewhere (pallas_call does not lower on
    CPU without interpret mode). Resolved at trace time."""
    if cfg.use_pallas is None:
        return jax.default_backend() == "tpu"
    return cfg.use_pallas


def _energy_fn(cfg: AnnealConfig):
    if resolve_use_pallas(cfg):
        from chromosome3d_tpu.ops.pallas_energy import pallas_energy

        exact = cfg.exact_restraints and cfg.noe_rswitch >= 1e8

        def efn(x, restraints, weights, bead_mask):
            return pallas_energy(x, restraints, weights, bead_mask, False, exact)

        return efn
    return energy


def solve_single(
    restraints: DenseRestraints,
    cfg: AnnealConfig,
    key: jax.Array,
    x0: jnp.ndarray,
    bead_mask: Optional[jnp.ndarray] = None,
    schedule: Optional[Schedule] = None,
    or_groups: Optional[OrGroupRestraints] = None,
):
    """Anneal one structure from x0 (+ per-restart jitter). Returns
    (final coords (L, 3), per-step total-energy history (T,)).

    schedule overrides the cfg-built table — it is a runtime input, so
    hyperparameter sweeps with equal step counts share one compilation."""
    L = x0.shape[0]
    if bead_mask is None:
        bead_mask = jnp.ones((L,), dtype=jnp.float32)
    sched = build_schedule(cfg) if schedule is None else schedule
    efn = _energy_fn(cfg)
    if or_groups is not None:
        _base_efn = efn

        def efn(x, r, w, bm):
            return _base_efn(x, r, w, bm) + or_group_energy(x, or_groups, w, bm)

    grad_fn = jax.value_and_grad(efn)

    key, jkey = jax.random.split(key)
    x = x0 + cfg.init_noise * jax.random.normal(jkey, x0.shape) * bead_mask[:, None]

    opt = optax.scale_by_adam()
    opt_state = opt.init(x)

    base = _final_weights(cfg)

    def step(carry, srow):
        x, opt_state, key = carry
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
        e, g = grad_fn(x, restraints, weights, bead_mask)
        g = _clip_per_bead(g, cfg.gradient_clip)
        updates, opt_state = opt.update(g, opt_state)
        key, nkey = jax.random.split(key)
        noise = sigma * jax.random.normal(nkey, x.shape)
        x = x + (-lr * updates + noise) * bead_mask[:, None]
        return (x, opt_state, key), e

    srows = jnp.stack([sched.lr, sched.sigma, sched.vdw_weight, sched.repel_scale], axis=-1)
    (x, _, _), history = jax.lax.scan(step, (x, opt_state, key), srows)
    return x, history


def solve_ensemble_impl(
    restraints: DenseRestraints,
    cfg: AnnealConfig,
    key: jax.Array,
    n_models: int,
    bead_mask: Optional[jnp.ndarray] = None,
    x0: Optional[jnp.ndarray] = None,
    schedule: Optional[Schedule] = None,
    or_groups: Optional[OrGroupRestraints] = None,
) -> AnnealResult:
    """Build n_models structures: one batched scan over all restarts
    (+ enantiomer pairs) at once.

    or_groups: optional ambiguous (`or`-group) restraints; their group-min
    well joins the energy (ops.energy.or_group_energy). The fully fused
    Pallas step covers the dense pair terms only, so group solves run the
    unfused scan (the group term is O(R*G), tiny; the pair kernel still
    carries the O(L^2) work).

    Replaces the reference's `loop dgsa` over 20 models
    (chromosome3D.pl:1574-1829) with one compiled program. The batch shares
    one restraint set, which the Pallas path exploits: restraint tiles are
    fetched from HBM once per step, not once per structure.

    Enantiomer semantics match CNS exactly: both mirror images run through
    the HOT phase only, the lower-energy image is picked, and only the
    winner pays for slow-cool + final minimization (chromosome3D.pl:
    1605-1727 picks handedness between the hot and cool stages) — roughly
    halving the dominant cool+final compute vs annealing both mirrors
    end-to-end.
    """
    L = restraints.lo.shape[0]
    if bead_mask is None:
        bead_mask = jnp.ones((L,), dtype=jnp.float32)

    if x0 is None:
        init = cfg.init
        if init == "auto":
            # classical MDS's O(L^3 log L) bounds smoothing dominates the
            # whole solve past ~2048 beads; landmark MDS is O(k L^2) and
            # quality-equal on real data (DESIGN.md)
            init = "mds" if L < 2048 else "landmark"
        if init == "mds":
            # bf16-STORED tiles (device_prep out_dtype="bfloat16"): the mds
            # embed math must run f32 — one transient upcast (mds is the
            # small-L route, so the f32 twin is cheap there). The landmark
            # path below takes the RAW tiles: it converts per <= 4096-row
            # strip itself (landmark_targets), and a whole-tile upcast here
            # would be hoisted out of its relaxation scan by XLA — exactly
            # the persistent f32 (L, L) the blocked init exists to avoid.
            init_restraints = restraints
            if restraints.lo.dtype == jnp.bfloat16:
                init_restraints = jax.tree.map(
                    lambda a: a.astype(jnp.float32), restraints
                )
            x0 = mds_init(
                init_restraints,
                bond_length=cfg.bond_length,
                unknown_fill=cfg.mds_unknown_fill,
                bead_mask=bead_mask,
                two_sided=cfg.embed_two_sided,
            )
        elif init == "landmark":
            x0 = landmark_init(
                restraints,
                bond_length=cfg.bond_length,
                k=cfg.landmark_count,
                n_iters=cfg.landmark_iters,
                bead_mask=bead_mask,
                two_sided=cfg.embed_two_sided,
            )
        elif init == "spiral":
            x0 = spiral_init(L, bond_length=cfg.bond_length)
        else:
            key, ikey = jax.random.split(key)
            x0 = random_init(ikey, L)
    x0 = x0 * bead_mask[:, None]

    n_eff = n_models * 2 if cfg.enantiomer else n_models
    if cfg.enantiomer:
        # pairs (direct, mirrored): flip the x axis of the shared embedding
        signs = jnp.tile(jnp.asarray([1.0, -1.0], dtype=jnp.float32), n_models)
    else:
        signs = jnp.ones((n_eff,), dtype=jnp.float32)

    key, jkey = jax.random.split(key)
    xs = x0[None, :, :] * jnp.stack(
        [signs, jnp.ones_like(signs), jnp.ones_like(signs)], axis=-1
    )[:, None, :]
    xs = xs + cfg.init_noise * jax.random.normal(jkey, xs.shape) * bead_mask[None, :, None]

    sched = build_schedule(cfg) if schedule is None else schedule
    base = _final_weights(cfg)

    exact = cfg.exact_restraints and cfg.noe_rswitch >= 1e8
    use_pallas = resolve_use_pallas(cfg)
    # the fused step / update-companion kernels carry bond but not the
    # optional angle term; a nonzero angle_weight rides the unfused path
    # (where _bond_energy includes it). Or-group solves can still run SEMI
    # (the group term joins the pair gradient before the update companion)
    # but not the fully fused step (its update happens inside the kernel,
    # before any external gradient could join).
    fusable = (
        use_pallas and cfg.fuse_update and cfg.angle_weight == 0.0
    )
    fused = semi = False
    if fusable and exact:
        # at large L the triangular (symmetry-exploiting) pair kernel beats
        # the fully fused whole-matrix step: each unordered tile pair is
        # computed once (33-45% less pair math) — and past Lp ~= 2048 the
        # fused step cannot lower at all. There the scan runs SEMI-fused:
        # the triangular/row pair kernel + the fused UPDATE companion
        # (pallas_fused_update_batched), which folds the bond/clip/Adam/
        # noise/update glue into one kernel — the round-2 ~15%/step XLA
        # op-launch overhead the unfused scan paid at exactly those L.
        from chromosome3d_tpu.ops.pallas_energy import (
            fused_step_feasible,
            use_triangular,
        )

        import os as _os

        fused = (
            or_groups is None
            and not use_triangular(L, batch=n_eff)
            and fused_step_feasible(L)
        )
        # the semi path IS the triangular kernel (+ companion), so the
        # CHROM3D_NO_TRI A/B override must push it to the unfused scan
        semi = not fused and not _os.environ.get("CHROM3D_NO_TRI")
    elif fusable:
        # GENERAL (windowed-deviation / soft-square) restraints: no exact
        # specialization and no triangular kernel, but the update half of
        # the step is restraint-agnostic — the general whole-matrix pair
        # kernel feeds the same fused update companion, killing the same
        # optax/threefry/clip glue the exact semi path killed (the last
        # dispatch asymmetry: external .rr/.tbl files with real deviation
        # windows used to pay the round-2 unfused step cost forever).
        semi = True
    if use_pallas:
        from chromosome3d_tpu.ops.pallas_energy import pallas_energy_and_grad_batched

        # interpret mode keeps a use_pallas=True config functional (and
        # testable) on non-TPU backends, where pallas_call cannot lower
        interp = jax.default_backend() != "tpu"

        if or_groups is None:
            def vag(x, weights):
                return pallas_energy_and_grad_batched(
                    x, restraints, weights, bead_mask, interpret=interp,
                    exact=exact, bf16=cfg.pair_bf16 and exact,
                )
        else:
            # group-min term rides OUTSIDE the kernel as an additive jnp
            # value-and-grad (O(R*G) gathers, fused by XLA around the call)
            _og_vg = jax.value_and_grad(or_group_energy)

            def vag(x, weights):
                e, g = pallas_energy_and_grad_batched(
                    x, restraints, weights, bead_mask, interpret=interp,
                    exact=exact, bf16=cfg.pair_bf16 and exact,
                )
                e_og, g_og = jax.vmap(
                    lambda c: _og_vg(c, or_groups, weights, bead_mask)
                )(x)
                return e + e_og, g + g_og
    else:
        _single = jax.value_and_grad(energy)

        def vag(x, weights):
            return jax.vmap(
                lambda c: _single(c, restraints, weights, bead_mask, or_groups)
            )(x)

    def sched_weights(vdw_w, repel):
        return EnergyWeights(
            noe=base.noe,
            bond=base.bond,
            bond_length=base.bond_length,
            vdw=vdw_w,
            vdw_radius=repel * cfg.vdw_radius,
            noe_rswitch=base.noe_rswitch,
            angle=base.angle,
        )

    if fused or semi:
        # the carry holds the Adam moments directly, in the kernels'
        # lane-major (B, 3, L) layout
        key, skey = jax.random.split(key)
        seed = jax.random.randint(skey, (), 0, jnp.int32(2**31 - 1))
        clip_val = -1.0 if cfg.gradient_clip is None else cfg.gradient_clip
        xsT = jnp.swapaxes(xs, 1, 2)
        carry0 = (xsT, jnp.zeros_like(xsT), jnp.zeros_like(xsT), jnp.int32(0))

        if fused:
            # the whole step runs inside ONE kernel invocation per row tile
            # (ops.pallas_energy.pallas_fused_step_batched)
            from chromosome3d_tpu.ops.pallas_energy import (
                fused_step_tiles,
                pallas_fused_step_batched,
            )

            # static per solve: masked (2*noe_w-scaled) weight/vdw tiles,
            # folded ONCE (not per step; the noe weight is schedule-constant)
            tiles = fused_step_tiles(restraints, bead_mask, base.noe)
            if cfg.pair_bf16:
                # halve the dominant per-step HBM stream; math stays f32
                # (kernels convert tiles on read) — AnnealConfig.pair_bf16
                tiles = tuple(t.astype(jnp.bfloat16) for t in tiles)

            def step(carry, srow):
                xT, muT, nuT, count = carry
                lr, sigma, vdw_w, repel, bc1, bc2 = srow
                e, xT, muT, nuT = pallas_fused_step_batched(
                    xT, muT, nuT, restraints, sched_weights(vdw_w, repel),
                    bead_mask, lr, sigma, bc1, bc2, seed, count, clip_val,
                    masked_tiles=tiles, gram=cfg.gram_d2, interpret=interp,
                )
                return (xT, muT, nuT, count + 1), e
        else:
            # SEMI-fused. Exact restraints: the TRIANGULAR pair kernel +
            # the fused update companion — exactly the combination the
            # calibration timed as `semi_s` (the unfused tri-vs-row
            # dispatch answers a different question and must not leak in
            # here). General (windowed) restraints: the whole-matrix
            # soft-square pair kernel + the same companion (there is no
            # triangular variant for the general well; the win here is
            # purely the update half). The two O(B*L*3) transposes are
            # noise next to the O(L^2) pair work. The noise stream is
            # bitwise the fused step's.
            from chromosome3d_tpu.ops.pallas_energy import (
                _pairwise_energy_grad_batched,
                exact_pair_tiles,
                pallas_energy_grad_tri_batched,
                pallas_fused_update_batched,
            )

            if exact:
                # (target, folded weight) hoisted OUTSIDE the scan: aliases
                # of the stored tensors for the two-tensor ExactRestraints
                # form (zero copies — the at-scale path's live restraint
                # HBM is then exactly the two uploaded tensors), one
                # explicit fold otherwise
                tri_tiles = exact_pair_tiles(restraints)
                if cfg.pair_bf16:
                    tri_tiles = tuple(
                        t.astype(jnp.bfloat16) for t in tri_tiles
                    )

                def pair_vag(x, weights):
                    return pallas_energy_grad_tri_batched(
                        x, restraints, weights, bead_mask, interpret=interp,
                        gram=cfg.gram_d2, tiles=tri_tiles,
                    )
            else:
                def pair_vag(x, weights):
                    return _pairwise_energy_grad_batched(
                        x, restraints, weights, bead_mask, interp, False,
                        gram=cfg.gram_d2,
                    )

            if or_groups is not None:
                _og_vg_semi = jax.value_and_grad(or_group_energy)

            def step(carry, srow):
                xT, muT, nuT, count = carry
                lr, sigma, vdw_w, repel, bc1, bc2 = srow
                weights = sched_weights(vdw_w, repel)
                x = jnp.swapaxes(xT, 1, 2)
                e_pair, g = pair_vag(x, weights)
                if or_groups is not None:
                    # the O(R*G) group-min term joins the pair gradient
                    # BEFORE the update companion — or-group solves keep
                    # the semi-fused path (round-4: at-scale external tbl
                    # files with ambiguous rows, chromosome3D.pl:487-554)
                    e_og, g_og = jax.vmap(
                        lambda c: _og_vg_semi(c, or_groups, weights, bead_mask)
                    )(x)
                    e_pair = e_pair + e_og
                    g = g + g_og
                e_b, xT, muT, nuT = pallas_fused_update_batched(
                    xT, jnp.swapaxes(g, 1, 2), muT, nuT, weights, bead_mask,
                    lr, sigma, bc1, bc2, seed, count, clip_val,
                    interpret=interp,
                )
                return (xT, muT, nuT, count + 1), e_pair + e_b

        def select(carry, sel):
            xT, muT, nuT, count = carry
            return (xT[sel], muT[sel], nuT[sel], count)

        def carry_coords(carry):
            return jnp.swapaxes(carry[0], 1, 2)
    else:
        opt = optax.scale_by_adam()
        carry0 = (xs, opt.init(xs), key)

        def step(carry, srow):
            x, opt_state, k = carry
            lr, sigma, vdw_w, repel = srow[0], srow[1], srow[2], srow[3]
            e, g = vag(x, sched_weights(vdw_w, repel))
            g = _clip_per_bead(g, cfg.gradient_clip)
            updates, opt_state = opt.update(g, opt_state)
            k, nkey = jax.random.split(k)
            noise = sigma * jax.random.normal(nkey, x.shape)
            x = x + (-lr * updates + noise) * bead_mask[None, :, None]
            return (x, opt_state, k), e

        n_eff_sel = n_eff

        def select(carry, sel):
            x, opt_state, k = carry
            opt_state = jax.tree.map(
                lambda a: a[sel]
                if (hasattr(a, "ndim") and a.ndim >= 1 and a.shape[0] == n_eff_sel)
                else a,
                opt_state,
            )
            return (x[sel], opt_state, k)

        def carry_coords(carry):
            return carry[0]

    # Adam bias corrections precomputed for the WHOLE schedule as srow
    # columns: the scan body then has zero per-step scalar ops for them
    # (the Adam time index == global schedule position — `count` survives
    # the enantiomer selection, so the alignment holds across both scans)
    tsteps = jnp.arange(1, sched.lr.shape[0] + 1, dtype=jnp.float32)
    bc1s = 1.0 / (1.0 - jnp.power(jnp.float32(0.9), tsteps))
    bc2s = 1.0 / (1.0 - jnp.power(jnp.float32(0.999), tsteps))
    srows = jnp.stack(
        [sched.lr, sched.sigma, sched.vdw_weight, sched.repel_scale,
         bc1s, bc2s],
        axis=-1,
    )
    unroll = max(1, cfg.scan_unroll)
    if cfg.enantiomer:
        # hot phase on all 2n mirror-pair members
        hot = cfg.hot_steps
        carry, hist_hot = jax.lax.scan(step, carry0, srows[:hot],
                                       unroll=unroll)
        # pick handedness per pair by energy under the end-of-hot weights
        # (ref :1710-1727: CNS evaluates with the flags active at that point)
        w_hot = sched_weights(sched.vdw_weight[hot - 1], sched.repel_scale[hot - 1])
        e_hot, _ = vag(carry_coords(carry), w_hot)              # (2n,)
        pick = jnp.argmin(e_hot.reshape(n_models, 2), axis=1)   # (n,)
        sel = jnp.arange(n_models) * 2 + pick
        carry = select(carry, sel)
        hist_hot = hist_hot[:, sel]                             # (hot, n)
        # only the winners pay for slow-cool + final minimization
        carry, hist_rest = jax.lax.scan(step, carry, srows[hot:],
                                        unroll=unroll)
        history = jnp.concatenate([hist_hot, hist_rest], axis=0).T  # (n, T)
    else:
        carry, history = jax.lax.scan(step, carry0, srows, unroll=unroll)
        history = history.T                        # (n_eff, T)
    coords = carry_coords(carry)

    # Final canonical terms: beyond reference scale the dense evaluation's
    # (n, L, L) well temp — not the hot loop — is the single-chip memory
    # ceiling (measured: a 9 GB HLO temp OOM'd L=24576 on v5e while the
    # solve itself fit). The row-chunked evaluation computes the same terms
    # in O(row_chunk * L); reference-scale buckets keep the dense path so
    # their NOE-ranking float-summation order (and the byte artifacts it
    # feeds) stays frozen.
    if L >= _CHUNKED_TERMS_MIN_L:
        term_fn = energy_terms_chunked
    else:
        term_fn = energy_terms
    terms = jax.vmap(
        lambda c: term_fn(c, restraints, base, bead_mask, or_groups)
    )(coords)

    # centroid to origin (ref :1805-1816), padding excluded
    nvalid = bead_mask.sum()
    centroid = (coords * bead_mask[None, :, None]).sum(axis=1, keepdims=True) / nvalid
    coords = (coords - centroid) * bead_mask[None, :, None]

    return AnnealResult(coords=coords, energies=terms, history=history)


solve_ensemble = jax.jit(solve_ensemble_impl, static_argnames=("cfg", "n_models"))

