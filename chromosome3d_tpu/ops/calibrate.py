"""Kernel-dispatch calibration: measure, don't hardcode, the crossovers.

`use_triangular`'s defaults are frozen from one round-2 measurement session
(±8% single-run variance). This module measures the per-step cost of every
step variant at a set of lengths with >= `repeats` repeats and writes a
dispatch table that `ops.pallas_energy.use_triangular` consults (nearest
measured L in log space), keyed by device kind:

    {"<device_kind>": {"entries": [
        {"L": 2048, "fused_s": ..., "semi_s": ...,
         "tri_unfused_s": ..., "row_unfused_s": ...,
         "rel_spread": {...}}, ...],
      "repeats": 5, "steps": 24, "batch": 4}}

Variants (all exact-restraint, the production path):
  fused        — the fully fused whole-matrix step (inf where it cannot
                 lower, fused_step_feasible)
  semi         — triangular pair kernel + the fused update companion
  tri_unfused  — triangular pair kernel + jnp Adam/noise glue
  row_unfused  — whole-matrix row kernel + jnp glue (CHROM3D_NO_TRI path)

Run via `chromosome3d calibrate` (NOT on first use: on a remote-compile
backend each variant x length costs a multi-minute XLA compile, so
calibration is an explicit, cacheable step; the table file is content-
hashed into the AOT executable cache key). The table merges per length,
so repeated runs refine coverage. Tests inject a fake `timer`.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Dict, Optional, Sequence

import numpy as np


def _real_timer(steps: int, batch: int):
    """Build the measured-variant timer: returns timer(variant, L) ->
    seconds per scan call (min over caller's repeats happens outside)."""
    import jax
    import jax.numpy as jnp

    from chromosome3d_tpu.config import AnnealConfig
    from chromosome3d_tpu.ops import pallas_energy as pe
    from chromosome3d_tpu.ops.energy import DenseRestraints
    from chromosome3d_tpu.solver.anneal import _final_weights

    interpret = jax.default_backend() != "tpu"
    cfg = AnnealConfig(exact_restraints=True)
    weights = _final_weights(cfg)

    def make_case(L: int):
        rng = np.random.RandomState(L)
        # synthetic exact restraints with realistic density/coverage
        t = np.abs(np.subtract.outer(np.arange(L), np.arange(L))).astype(
            np.float64
        )
        target = (3.8 * t ** 0.6).astype(np.float32)
        mask = ((t >= 5) & (rng.rand(L, L) < 0.5)).astype(np.float32)
        mask = np.maximum(mask, mask.T)
        w = np.where(mask > 0, 1.0 / np.maximum(target, 1.0), 0.0)
        if mask.any():
            w = w / w[mask > 0].mean()
        dense = DenseRestraints(
            lo=jnp.asarray(target), hi=jnp.asarray(target),
            mask=jnp.asarray(mask), weight=jnp.asarray(w.astype(np.float32)),
        )
        bead = jnp.ones((L,), jnp.float32)
        x = jnp.asarray(rng.randn(batch, L, 3) * 10, jnp.float32)
        return dense, bead, x

    def scan_of(step, carry0):
        def run(carry):
            import jax.lax as lax

            carry, _ = lax.scan(step, carry, jnp.arange(steps))
            return carry

        return jax.jit(run), carry0

    def build(variant: str, L: int):
        dense, bead, x = make_case(L)
        xT = jnp.swapaxes(x, 1, 2)
        z = jnp.zeros_like(xT)

        if variant == "fused":
            if not pe.fused_step_feasible(L):
                return None
            tiles = pe.fused_step_tiles(dense, bead, weights.noe)

            def step(carry, i):
                xT, mu, nu = carry
                e, xT, mu, nu = pe.pallas_fused_step_batched(
                    xT, mu, nu, dense, weights, bead, 0.02, 0.1, 1.0, 1.0,
                    7, i, -1.0, interpret=interpret, masked_tiles=tiles,
                )
                return (xT, mu, nu), e

            return scan_of(step, (xT, z, z))

        if variant == "semi":

            def step(carry, i):
                xT, mu, nu = carry
                xb = jnp.swapaxes(xT, 1, 2)
                e_p, g = pe.pallas_energy_grad_tri_batched(
                    xb, dense, weights, bead, interpret=interpret
                )
                e_b, xT, mu, nu = pe.pallas_fused_update_batched(
                    xT, jnp.swapaxes(g, 1, 2), mu, nu, weights, bead,
                    0.02, 0.1, 1.0, 1.0, 7, i, -1.0, interpret=interpret,
                )
                return (xT, mu, nu), e_p + e_b

            return scan_of(step, (xT, z, z))

        # unfused variants: pair kernel + jnp Adam/noise glue
        import optax

        opt = optax.scale_by_adam()

        def glue(x, opt_state, k, e, g):
            updates, opt_state = opt.update(g, opt_state)
            k, nk = jax.random.split(k)
            noise = 0.1 * jax.random.normal(nk, x.shape)
            return (x - 0.02 * updates + noise, opt_state, k), e

        if variant == "tri_unfused":

            def step(carry, i):
                x, opt_state, k = carry
                e, g = pe.pallas_energy_grad_tri_batched(
                    x, dense, weights, bead, interpret=interpret
                )
                return glue(x, opt_state, k, e, g)

        elif variant == "row_unfused":

            def _row_kernel(x):
                # force the whole-matrix row kernel (bypass tri dispatch;
                # the env var is read at trace time inside use_triangular)
                had = os.environ.get("CHROM3D_NO_TRI")
                os.environ["CHROM3D_NO_TRI"] = "1"
                try:
                    return pe._pairwise_energy_grad_batched(
                        x, dense, weights, bead, interpret, True
                    )
                finally:
                    if had is None:
                        os.environ.pop("CHROM3D_NO_TRI", None)
                    else:
                        os.environ["CHROM3D_NO_TRI"] = had

            def step(carry, i):
                x, opt_state, k = carry
                e, g = _row_kernel(x)
                return glue(x, opt_state, k, e, g)

        else:
            raise ValueError(variant)
        return scan_of(step, (x, opt.init(x), jax.random.PRNGKey(0)))

    built_cache: dict = {}

    def timer(variant: str, L: int) -> Optional[float]:
        key = (variant, L)
        if key not in built_cache:
            built = build(variant, L)
            if built is not None:
                fn, carry0 = built
                out = fn(carry0)          # compile + warm ONCE per variant
                np.asarray(jax.tree.leaves(out)[0])
            built_cache[key] = built
        built = built_cache[key]
        if built is None:
            return None
        fn, carry0 = built
        t0 = time.perf_counter()
        out = fn(carry0)
        np.asarray(jax.tree.leaves(out)[0])  # host fence (remote backends)
        return time.perf_counter() - t0

    return timer


VARIANTS = ("fused", "semi", "tri_unfused", "row_unfused")


def calibrate_dispatch(
    lengths: Sequence[int] = (1024, 2048, 4096),
    repeats: int = 5,
    steps: int = 24,
    batch: int = 4,
    out_path: Optional[str] = None,
    timer: Optional[Callable[[str, int], Optional[float]]] = None,
    device_kind: Optional[str] = None,
) -> Dict:
    """Measure every variant at every length (min over `repeats`, relative
    spread recorded) and write/merge the dispatch table. Returns the table.

    timer(variant, L) -> seconds (or None = variant infeasible at L);
    injectable for tests. The default timer runs real kernels on the
    current backend."""
    from chromosome3d_tpu.ops.pallas_energy import (
        _DISPATCH_CACHE,
        _device_kind,
        _dispatch_table_path,
    )

    timer = timer or _real_timer(steps, batch)
    kind = device_kind or _device_kind()
    out_path = out_path or _dispatch_table_path()

    entries = []
    for L in lengths:
        row: Dict = {"L": int(L), "rel_spread": {}}
        for variant in VARIANTS:
            ts = []
            for _ in range(repeats):
                t = timer(variant, L)
                if t is None:
                    break
                ts.append(t)
            if not ts:
                row[f"{variant}_s"] = float("inf")
                row["rel_spread"][variant] = 0.0
            else:
                best = min(ts)
                row[f"{variant}_s"] = best
                row["rel_spread"][variant] = (
                    (max(ts) - best) / best if best > 0 else 0.0
                )
        entries.append(row)

    table: Dict = {}
    if os.path.exists(out_path):
        try:
            with open(out_path) as f:
                table = json.load(f)
        except (OSError, ValueError):
            table = {}
    dev = table.setdefault(kind, {})
    old = {e["L"]: e for e in dev.get("entries", [])}
    for e in entries:
        old[e["L"]] = e
    dev["entries"] = sorted(old.values(), key=lambda e: e["L"])
    dev.update({"repeats": repeats, "steps": steps, "batch": batch})

    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    tmp = out_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(table, f, indent=1)
    os.replace(tmp, out_path)
    _DISPATCH_CACHE.clear()
    return table
