#!/usr/bin/env python3
"""A/B the bf16 restraint-tile path (AnnealConfig.pair_bf16) on the real
chip at the HEADLINE shape: chr1_500kb (L=456 -> pad 512), 10 restarts,
full DGSA schedule — the exact bench.py workload — plus quality (best
Spearman(IF, 1/d) of the ensemble, each arm on the same keys).

This is the round-3 DESIGN.md "measured floor" claim's one named untested
lever: the (L, L) tiles are the dominant per-step HBM stream, bf16 halves
it; all pair math stays f32 (kernels upcast on read). Accept only if the
steps/s gain is real AND quality holds; otherwise record the negative
result.

  python scripts/bf16_ab.py [--sizes 512,8192]   # synthetic sizes too
"""

import argparse
import dataclasses
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("CHROM3D_AOT_CACHE", "/root/.chrom3d_aot")

REF = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def run_arm(dense, cfg, n_models, matrix, tag):
    import jax

    from chromosome3d_tpu.solver.anneal import solve_ensemble_impl
    from chromosome3d_tpu.utils.aot import load_or_compile

    t0 = time.time()
    solve = load_or_compile(
        jax.jit(lambda d, k: solve_ensemble_impl(d, cfg, k, n_models)),
        (dense, jax.random.PRNGKey(0)),
        tag=tag,
        statics=f"{cfg!r}|n={n_models}",
    )
    np.asarray(solve(dense, jax.random.PRNGKey(0)).coords)  # warm + fence
    compile_s = time.time() - t0
    wall = float("inf")
    coords = None
    for _ in range(3):
        t0 = time.time()
        res = solve(dense, jax.random.PRNGKey(82364))
        c = np.asarray(res.coords)
        wall = min(wall, time.time() - t0)
        coords = c
    from chromosome3d_tpu.metrics import spearman_if_inv_d

    best = (
        max(spearman_if_inv_d(matrix, c) for c in coords)
        if matrix is not None
        else None
    )
    return {
        "compile_s": round(compile_s, 1),
        "wall_s": round(wall, 3),
        "steps_per_sec": round(cfg.total_steps / wall, 1),
        "best_spearman": None if best is None else round(float(best), 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--headline", action="store_true", default=True)
    ap.add_argument("--models", type=int, default=10)
    args = ap.parse_args()

    import jax

    from chromosome3d_tpu.config import AnnealConfig, RestraintConfig
    from chromosome3d_tpu.io.matrix import load_if_matrix
    from chromosome3d_tpu.ops.energy import dense_restraints_from_numpy
    from chromosome3d_tpu.restraints import build_restraints

    platform = jax.devices()[0].platform
    matrix = load_if_matrix(os.path.join(REF, "input", "chr1_500kb_matrix.txt"))
    rc = RestraintConfig()
    dense = dense_restraints_from_numpy(
        build_restraints(matrix, rc), rc.weighting, rc.weight_exponent
    )
    base = AnnealConfig(use_pallas=(platform == "tpu"), exact_restraints=True)
    for bf16 in (False, True):
        cfg = dataclasses.replace(base, pair_bf16=bf16)
        # f32 arm shares bench.py's AOT blob (same tag + statics repr)
        row = run_arm(dense, cfg, args.models, matrix, tag="bench_headline")
        row.update({"arm": "bf16" if bf16 else "f32", "platform": platform})
        print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
