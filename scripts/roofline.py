#!/usr/bin/env python3
"""Measured roofline for the fused Pallas energy+grad kernel on the real
accelerator: times the kernel alone (scan-amortized) at several (L, B)
shapes, derives achieved pair-rate / FLOP/s / HBM bandwidth from the
analytic per-step costs, and prints a markdown table for DESIGN.md.

  python scripts/roofline.py            # real device (TPU via axon)
  python scripts/roofline.py --cpu      # interpret-mode smoke run
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("CHROM3D_AOT_CACHE", "/root/.chrom3d_aot")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

# v5e published peaks (per chip): 197 TFLOP/s bf16 MXU, 819 GB/s HBM.
# The kernel is f32 VPU work; the VPU's f32 throughput is not published —
# (8x128) lanes x ~2 ALUs x ~1.7 GHz ~= 3.5 Tops/s is the usual estimate.
HBM_PEAK_GBS = 819.0
VPU_EST_GOPS = 3500.0


def synthetic_case(L, seed=0):
    from chromosome3d_tpu.config import RestraintConfig
    from chromosome3d_tpu.ops.energy import dense_restraints_from_numpy
    from chromosome3d_tpu.restraints import build_restraints

    rng = np.random.RandomState(seed)
    base = rng.gamma(2.0, 50.0, size=(L, L))
    m = (base + base.T) / 2
    np.fill_diagonal(m, 5000.0)
    rc = RestraintConfig()
    return dense_restraints_from_numpy(build_restraints(m, rc), rc.weighting)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--shapes", default="456:20,1024:8,2048:4")
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--exact", action="store_true", default=True)
    ap.add_argument("--fused", action="store_true",
                    help="measure the fully fused step (pallas_fused_step_"
                         "batched) instead of the energy+grad kernel")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    interpret = jax.devices()[0].platform != "tpu"

    from chromosome3d_tpu.ops.energy import weights_from_config
    from chromosome3d_tpu.config import AnnealConfig
    from chromosome3d_tpu.ops.pallas_energy import (
        _round_up,
        pallas_energy_and_grad_batched,
        pallas_fused_step_batched,
    )

    w = weights_from_config(AnnealConfig())
    rows = []
    for spec in args.shapes.split(","):
        L, B = (int(v) for v in spec.split(":"))
        dense = synthetic_case(L)
        bead = jnp.ones((L,), jnp.float32)
        key = jax.random.PRNGKey(0)
        x = 10.0 * jax.random.normal(key, (B, L, 3), jnp.float32)

        steps = args.steps if not interpret else 2

        if args.fused:
            def body(carry, _):
                cT, muT, nuT, count = carry
                e, cT, muT, nuT = pallas_fused_step_batched(
                    cT, muT, nuT, dense, w, bead, 1e-6, 0.01,
                    1.0, 1.0, 7, count, -1.0, interpret=interpret,
                )
                return (cT, muT, nuT, count + 1), e

            def scan_fn(c, n):
                cT = jnp.swapaxes(c, 1, 2)      # state rides the T layout
                z = jnp.zeros_like(cT)
                return jax.lax.scan(
                    body, (cT, z, z, jnp.int32(0)), None, length=n
                )[1]
        else:
            def body(c, _):
                e, g = pallas_energy_and_grad_batched(
                    c, dense, w, bead, interpret, args.exact
                )
                # consume the gradient (no dead code); keep shapes static
                return c - 1e-6 * g, e

            def scan_fn(c, n):
                return jax.lax.scan(body, c, None, length=n)[1]

        # differential timing: the remote-execution path carries a fixed
        # per-call overhead (tens of ms through the tunnel) that would
        # inflate per-step time; time scans of N and 5N steps and take the
        # slope, which cancels the constant.
        def make(n):
            return jax.jit(lambda c: scan_fn(c, n))

        run1, run5 = make(steps), make(5 * steps)
        np.asarray(run1(x)); np.asarray(run5(x))    # compile + warm

        def best(fn):
            ts = []
            for _ in range(5):
                t0 = time.time()
                np.asarray(fn(x))                   # host fence (axon-safe)
                ts.append(time.time() - t0)
            return min(ts)

        per_step = (best(run5) - best(run1)) / (4 * steps)

        Lp = _round_up(max(L, 8), 128)
        pairs = B * Lp * Lp
        flops = (22 if args.exact else 40) * pairs  # VPU ops incl. rsqrt slot
        # HBM per step: restraint tiles fetched once (batch-invariant),
        # coords/outputs per structure
        n_tensors = 2 if args.exact else 3
        bytes_step = n_tensors * Lp * Lp * 4 + B * Lp * 4 * (3 + 3 + 3 + 1 + 1)
        row = {
            "L": L,
            "B": B,
            "us_per_step": round(per_step * 1e6, 1),
            "pairs_per_s": round(pairs / per_step / 1e9, 2),      # Gpair/s
            "gflops": round(flops / per_step / 1e9, 1),
            "hbm_gbs": round(bytes_step / per_step / 1e9, 1),
            "pct_hbm_peak": round(100 * bytes_step / per_step / 1e9 / HBM_PEAK_GBS, 1),
            "pct_vpu_est": round(100 * flops / per_step / 1e9 / VPU_EST_GOPS, 1),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    print("\n| L | B | us/step | Gpair/s | GFLOP/s | HBM GB/s | %HBM peak | %VPU est |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['L']} | {r['B']} | {r['us_per_step']} | {r['pairs_per_s']} "
            f"| {r['gflops']} | {r['hbm_gbs']} | {r['pct_hbm_peak']} "
            f"| {r['pct_vpu_est']} |"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
