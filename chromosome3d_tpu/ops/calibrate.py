"""Kernel-dispatch calibration: measure, don't hardcode, the crossovers.

`use_triangular`'s defaults are frozen from one round-2 measurement session
(±8% single-run variance). This module measures the per-step cost of every
step variant at a set of (length, batch) cases with >= `repeats` repeats and
writes a dispatch table that `ops.pallas_energy.use_triangular` consults
(nearest measured (L, B) in log space, with a 2x log-L distance bound),
keyed by device kind:

    {"<device_kind>": {"entries": [
        {"L": 2048, "B": 4, "fused_s": ..., "semi_s": ...,
         "tri_unfused_s": ..., "row_unfused_s": ...,
         "rel_spread": {...}}, ...],
      "repeats": 5, "steps": 24}}

Infeasible variants store null (strict-JSON safe; the reader treats
missing/null as infinity). Legacy round-3 entries carry no "B" (they were
measured at B=4) and the nonstandard Infinity token — both still load.

Variants (all exact-restraint, the production path):
  fused        — the fully fused whole-matrix step (null where it cannot
                 lower, fused_step_feasible)
  semi         — triangular pair kernel + the fused update companion
  tri_unfused  — triangular pair kernel + jnp Adam/noise glue
  row_unfused  — whole-matrix row kernel + jnp glue (the static no_tri
                 argument pins it; an env-var read at trace time would not
                 key jax's in-memory jit cache)

The default cases cover the PRODUCTION shapes: the shipped length bucket at
its real model counts (512 x B=10 and B=20 — round-3 item: probe-vs-
production shape mismatch once flipped the L=456 bench onto a 40%-slower
path) plus the at-scale lengths at a small batch.

Run via `chromosome3d calibrate` (NOT on first use: on a remote-compile
backend each variant x case costs a multi-minute XLA compile, so
calibration is an explicit, cacheable step; the table file is content-
hashed into the AOT executable cache key). The table merges per (L, B),
so repeated runs refine coverage. Tests inject a fake `timer`.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Callable, Dict, Optional, Sequence, Tuple

import numpy as np

log = logging.getLogger("chromosome3d")

# production-shape default cases: (L, B)
DEFAULT_CASES: Tuple[Tuple[int, int], ...] = (
    (512, 10), (512, 20), (1024, 4), (2048, 4), (4096, 4),
)

# A case whose repeat timings spread more than this (max/min - 1) is
# SUSPECT — a concurrent host load (the recorded incident: a pytest run
# alongside calibrate inflated the (512, 20) fused timing 2x and the
# poisoned table silently routed the headline bench onto a 22%-slower
# path) or a tunnel hiccup contaminated it. Suspect cases are NOT written:
# the previous entry (or the frozen defaults) stays in force. The largest
# quiet-host spread ever recorded on this backend is 0.33 (round-3
# tri_unfused at L=768), so 0.5 keeps legitimate tunnel-variance
# measurements while catching contention.
DEFAULT_SPREAD_GATE = 0.5

# Real-timer calibrations refuse to start when the 1-minute load average
# exceeds this (force=True overrides): timing on a loaded single-vCPU host
# is how the recorded poisoning happened, and uniform contention inflates
# every repeat equally — a pattern the spread gate cannot see.
DEFAULT_MAX_LOAD = 1.5

# Scan length per timed call. Round 3/4 used 24 — which, on a remote-execute
# backend with a ~29 ms fixed round trip, made the small-L measurements
# ~95% round-trip: the per-step cost difference between variants (the
# entire signal) was ~2% of the measured wall, and the round-5 spread gate
# correctly rejected most such cases as jitter. 960 steps puts scan
# execution at or above the round trip everywhere from L=512 up (70-180 ms
# at the production shapes), so the min-of-repeats measures the DEVICE.
# Compile cost is unchanged (lax.scan compiles once regardless of length).
DEFAULT_STEPS = 960


def _check_quiet_host(max_load: float) -> None:
    try:
        load1 = os.getloadavg()[0]
    except (AttributeError, OSError):
        return
    if load1 > max_load:
        raise RuntimeError(
            f"host is not quiet (1-min load {load1:.2f} > {max_load}): "
            "a concurrent load poisons calibration timings (a recorded "
            "incident inflated one entry 2x and silently cost 22% of "
            "headline perf). Stop other work or pass force=True/--force."
        )


def _real_timer(steps: int):
    """Build the measured-variant timer: returns timer(variant, L, B) ->
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

    def make_case(L: int, batch: int):
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

    def build(variant: str, L: int, batch: int):
        dense, bead, x = make_case(L, batch)
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

            def step(carry, i):
                x, opt_state, k = carry
                # no_tri is a STATIC argument: it keys both jax's in-memory
                # jit cache and the AOT disk cache, so this trace can never
                # leak into a later dispatch-driven exact solve
                e, g = pe._pairwise_energy_grad_batched(
                    x, dense, weights, bead, interpret, True, no_tri=True
                )
                return glue(x, opt_state, k, e, g)

        else:
            raise ValueError(variant)
        return scan_of(step, (x, opt.init(x), jax.random.PRNGKey(0)))

    built_cache: dict = {}

    def timer(variant: str, L: int, batch: int) -> Optional[float]:
        key = (variant, L, batch)
        if key not in built_cache:
            built = build(variant, L, batch)
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
    cases: Optional[Sequence[Tuple[int, int]]] = None,
    lengths: Optional[Sequence[int]] = None,
    repeats: int = 5,
    steps: int = DEFAULT_STEPS,
    batch: int = 4,
    out_path: Optional[str] = None,
    timer: Optional[Callable[[str, int, int], Optional[float]]] = None,
    device_kind: Optional[str] = None,
    spread_gate: float = DEFAULT_SPREAD_GATE,
    max_load: float = DEFAULT_MAX_LOAD,
    force: bool = False,
) -> Dict:
    """Measure every variant at every (L, B) case (min over `repeats`,
    relative spread recorded) and write/merge the dispatch table. Returns
    the table.

    cases: (L, B) pairs; default DEFAULT_CASES (production shapes).
    lengths: legacy spelling — lengths all measured at `batch`.
    timer(variant, L, B) -> seconds (or None = variant infeasible);
    injectable for tests. The default timer runs real kernels on the
    current backend.

    Poisoning defenses (round-4 VERDICT item 4 — one contaminated table
    already cost 22% of headline perf): real-timer runs refuse to start on
    a loaded host (max_load; force=True overrides), and any case whose
    repeat spread exceeds spread_gate is REJECTED — the previous entry (or
    the frozen defaults) stays in force, and the rejection is recorded in
    the table's per-device "rejected" list for the operator to see."""
    from chromosome3d_tpu.ops.pallas_energy import (
        _DISPATCH_CACHE,
        _device_kind,
        _dispatch_table_path,
    )

    if cases is None:
        cases = (
            tuple((int(L), int(batch)) for L in lengths)
            if lengths is not None
            else DEFAULT_CASES
        )
    if timer is None and not force:
        _check_quiet_host(max_load)   # fake timers (tests) skip the check
    timer = timer or _real_timer(steps)
    kind = device_kind or _device_kind()
    out_path = out_path or _dispatch_table_path()

    entries = []
    rejected = []
    for L, B in cases:
        # per-entry steps: entries measured under different protocols can
        # coexist in one table (only intra-entry ratios decide dispatch)
        row: Dict = {"L": int(L), "B": int(B), "steps": int(steps),
                     "rel_spread": {}}
        for variant in VARIANTS:
            ts = []
            for _ in range(repeats):
                t = timer(variant, L, B)
                if t is None:
                    break
                ts.append(t)
            if not ts:
                row[f"{variant}_s"] = None      # infeasible: strict-JSON null
                row["rel_spread"][variant] = 0.0
            else:
                best = min(ts)
                row[f"{variant}_s"] = best
                row["rel_spread"][variant] = (
                    (max(ts) - best) / best if best > 0 else 0.0
                )
        worst = max(row["rel_spread"].values(), default=0.0)
        if worst > spread_gate:
            # suspect measurement: do NOT let it steer dispatch
            rejected.append({
                "L": row["L"], "B": row["B"],
                "rel_spread": row["rel_spread"], "gate": spread_gate,
            })
            log.warning(
                f"calibrate: case (L={L}, B={B}) REJECTED — repeat spread "
                f"{worst:.2f} exceeds the {spread_gate} gate (concurrent "
                "load or tunnel hiccup?); previous entry kept"
            )
            continue
        entries.append(row)

    table: Dict = {}
    if os.path.exists(out_path):
        try:
            with open(out_path) as f:
                table = json.load(f)
        except (OSError, ValueError):
            table = {}
    dev = table.setdefault(kind, {})

    def _sanitize(e):
        # legacy tables stored inf (the nonstandard Infinity token); the
        # round-4 schema stores null — rewrite on merge so the output is
        # strict JSON end to end
        import math

        for v_ in VARIANTS:
            k = f"{v_}_s"
            if isinstance(e.get(k), float) and not math.isfinite(e[k]):
                e[k] = None
        return e

    # merge on (L, B); legacy entries without B were measured at batch=4
    old = {
        (e["L"], e.get("B", 4)): _sanitize(e) for e in dev.get("entries", [])
    }
    for e in entries:
        old[(e["L"], e["B"])] = e
    dev["entries"] = sorted(old.values(), key=lambda e: (e["L"], e.get("B", 4)))
    dev.update({"repeats": repeats, "steps": steps})
    if rejected:
        dev["rejected"] = rejected               # visible audit trail
    else:
        dev.pop("rejected", None)
    dev.pop("batch", None)                       # superseded by per-entry B

    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    tmp = out_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(table, f, indent=1, allow_nan=False)
    os.replace(tmp, out_path)
    _DISPATCH_CACHE.clear()
    # use_triangular reads the table at TRACE time, so jax's in-memory jit
    # cache is not keyed on it: a solve traced before this rewrite would
    # silently reuse the old kernel choice at the same shape. Drop the
    # in-process traces (the AOT disk cache already keys on the table
    # fingerprint; cross-process callers re-trace anyway).
    import jax

    jax.clear_caches()
    return table


def verify_dispatch(
    repeats: int = 3,
    timer: Optional[Callable[[str, int, int], Optional[float]]] = None,
    device_kind: Optional[str] = None,
    max_load: float = DEFAULT_MAX_LOAD,
    force: bool = False,
) -> Dict:
    """Re-time the ACTIVE dispatch table's routes and report drift
    (`chromosomed calibrate --verify`): for every (L, B) entry the reader
    would consult on this device kind, measure each feasible variant again
    and compare against the stored seconds. Writes nothing — this is the
    audit tool for "is the committed/cached table still right on this
    machine?" (round-4 VERDICT item 4).

    Returns {"device_kind", "source", "entries": [{L, B, steps, variant:
    {stored_s, measured_s, drift_pct}, choice, choice_stored,
    choice_changed}]}. A changed choice means a recalibration (on a quiet
    host) would re-route that shape.

    Protocol fidelity: each entry is re-timed at ITS OWN recorded scan
    length (the per-entry "steps" field; pre-round-5 entries without one
    were measured at 24) — comparing a 24-step measurement against a
    960-step one would report ~40x phantom drift. An injected `timer` is
    used as-is (tests)."""
    from chromosome3d_tpu.ops.pallas_energy import (
        _active_dispatch,
        _device_kind,
        _entry_seconds,
        fused_step_feasible,
    )

    if timer is None and not force:
        _check_quiet_host(max_load)
    kind = device_kind or _device_kind()
    entries, source = _active_dispatch(kind)
    report: Dict = {"device_kind": kind, "source": source, "entries": []}
    timers: Dict[int, Callable] = {}

    def timer_for(entry_steps: int):
        if timer is not None:
            return timer
        if entry_steps not in timers:
            timers[entry_steps] = _real_timer(entry_steps)
        return timers[entry_steps]

    def choice(L: int, fused_s: float, semi_s: float) -> str:
        # mirror use_triangular's exact-path decision: structural
        # feasibility first, then the measured comparison with its 3%
        # hysteresis; an entry silent on fused (inf) at a fused-feasible L
        # falls back to the frozen default (fused), exactly as the reader
        # does
        if not fused_step_feasible(L):
            return "semi"
        if not np.isfinite(fused_s):
            return "fused"
        return "semi" if semi_s < 0.97 * fused_s else "fused"

    for e in entries:
        L, B = int(e["L"]), int(e.get("B", 4))
        e_steps = int(e.get("steps", 24))
        t_fn = timer_for(e_steps)
        row: Dict = {"L": L, "B": B, "steps": e_steps}
        measured: Dict[str, float] = {}
        for variant in VARIANTS:
            stored = e.get(f"{variant}_s")
            ts = []
            for _ in range(repeats):
                t = t_fn(variant, L, B)
                if t is None:
                    break
                ts.append(t)
            m = min(ts) if ts else None
            if m is not None:
                measured[variant] = m
            drift = (
                None
                if stored is None or m is None or stored <= 0
                else round(100.0 * (m - stored) / stored, 1)
            )
            row[variant] = {
                "stored_s": stored,
                "measured_s": m,
                "drift_pct": drift,
            }
        row["choice_stored"] = choice(
            L, _entry_seconds(e, "fused_s"), _entry_seconds(e, "semi_s")
        )
        row["choice"] = choice(
            L,
            measured.get("fused", float("inf")),
            measured.get("semi", float("inf")),
        )
        row["choice_changed"] = row["choice"] != row["choice_stored"]
        report["entries"].append(row)
    return report
