#!/usr/bin/env python3
"""A/B the round-4 SEMI-GENERAL path on the real chip: windowed
(non-exact) restraints with fuse_update=True (general whole-matrix pair
kernel + the fused update companion) vs fuse_update=False (the round-2
unfused optax/threefry scan) — the last dispatch asymmetry, closed in
solver.anneal / solver.sharded.

Windowed restraints are the external-.tbl input class (CNS deviation
windows, chromosome3D.pl:352-354 generalized); the pipeline's own
restraints are exact and never take this path. Case: chr1_500kb targets
widened to a +-10% well, B=10, full DGSA schedule (the headline shape,
windowed), plus a synthetic L=2048 B=4 probe where round 3 measured the
unfused glue at ~15%/step on the exact path.

  python scripts/semi_general_ab.py
"""

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


def windowed(dense, frac=0.1):
    """Widen exact targets into a symmetric +-frac deviation well."""
    mid = 0.5 * (dense.lo + dense.hi)
    return dense._replace(lo=mid * (1.0 - frac), hi=mid * (1.0 + frac))


def synthetic_matrix(L, seed=0):
    rng = np.random.RandomState(seed)
    base = rng.gamma(2.0, 50.0, size=(L, L))
    m = (base + base.T) / 2
    np.fill_diagonal(m, 5000.0)
    return m


def main():
    import jax

    from chromosome3d_tpu.config import AnnealConfig, RestraintConfig
    from chromosome3d_tpu.io.matrix import load_if_matrix
    from chromosome3d_tpu.ops.energy import dense_restraints_from_numpy
    from chromosome3d_tpu.restraints import build_restraints

    platform = jax.devices()[0].platform
    rc = RestraintConfig()
    cases = []
    m1 = load_if_matrix(os.path.join(REF, "input", "chr1_500kb_matrix.txt"))
    cases.append(("chr1_500kb_windowed", m1, 10))
    cases.append(("synthetic_L2048_windowed", synthetic_matrix(2048), 4))

    for name, matrix, n_models in cases:
        dense = windowed(
            dense_restraints_from_numpy(
                build_restraints(matrix, rc), rc.weighting, rc.weight_exponent
            )
        )
        base = AnnealConfig(
            use_pallas=(platform == "tpu"), exact_restraints=False
        )
        for semi in (False, True):
            cfg = dataclasses.replace(base, fuse_update=semi)
            row = run_arm(
                dense, cfg, n_models, matrix, tag=f"semi_general_ab_{name}"
            )
            row.update(
                {
                    "case": name,
                    "arm": "semi" if semi else "unfused",
                    "platform": platform,
                }
            )
            print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
