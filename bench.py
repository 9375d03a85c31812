#!/usr/bin/env python3
"""Headline benchmark (BASELINE.json config 4): chr1_500kb (L=456), 10
restarts (20 annealed structures with enantiomer pairs), full DGSA-shaped
schedule, on whatever accelerator jax.devices() provides.

Prints ONE JSON line:
  metric      anneal steps/sec on the chr1-500kb x10 ensemble (one "step" =
              one scheduled Langevin/Adam update of all 20 structures)
  vs_baseline our best model's Spearman(IF, 1/d) divided by the published
              reference model's (output_models/chr1_500kb_rank03_a11.pdb) —
              >= 1.0 means reconstruction quality beats the reference.
"""

import json
import os
import sys
import time

import numpy as np

REF = "/root/reference"

# persistent compilation cache: the remote-TPU platform here compiles via a
# tunnel (minutes for the full solve program); cache across processes.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
# ...and the AOT serialized-executable cache, which DOES reliably reload
# across processes on this backend (utils/aot.py): a fresh bench process
# skips the compile entirely once any prior run has populated it
os.environ.setdefault("CHROM3D_AOT_CACHE", "/root/.chrom3d_aot")


def _backend_responsive(timeout_s: float = 240.0) -> bool:
    """The axon remote-TPU backend can HANG at client init when its tunnel
    is down (observed round 4: jax.devices() blocked past every timeout,
    after an earlier fail-fast UNAVAILABLE phase). Probe it in a subprocess
    with a hard timeout so the bench always emits its one JSON line; on a
    dead backend main() falls back to CPU and extra.platform records what
    actually ran."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s,
            capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main() -> int:
    if os.environ.get("JAX_PLATFORMS", "") != "cpu" and not _backend_responsive():
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # CLAUDE.md: env var alone does not defeat the axon plugin's
        # registration — the config update is required as well
        jax.config.update("jax_platforms", "cpu")

    try:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from chromosome3d_tpu.config import AnnealConfig, PipelineConfig, RestraintConfig
    from chromosome3d_tpu.io.matrix import load_if_matrix
    from chromosome3d_tpu.io.pdb import read_ca_pdb
    from chromosome3d_tpu.metrics import spearman_if_inv_d
    from chromosome3d_tpu.ops.energy import dense_restraints_from_numpy
    from chromosome3d_tpu.restraints import build_restraints
    from chromosome3d_tpu.solver.anneal import solve_ensemble_impl
    from chromosome3d_tpu.utils.aot import load_or_compile

    platform = jax.devices()[0].platform
    use_pallas = platform == "tpu"

    matrix = load_if_matrix(os.path.join(REF, "input", "chr1_500kb_matrix.txt"))
    rc = RestraintConfig()  # alpha 0.5: the quality default (see PARITY.md)
    dense = dense_restraints_from_numpy(
        build_restraints(matrix, rc), rc.weighting, rc.weight_exponent
    )
    # pipeline restraints are exact (negdev = posdev = 0) -> fast kernel
    cfg = AnnealConfig(use_pallas=use_pallas, exact_restraints=True)
    if os.environ.get("CHROM3D_BENCH_FAST"):
        # smoke-test mode (NOT for recorded numbers): 5% schedule so the
        # CPU-fallback emit path can be exercised in seconds
        from chromosome3d_tpu.config import fast_anneal

        cfg = fast_anneal(cfg, 0.05)
    n_models = 10

    def make_solve(c):
        return load_or_compile(
            jax.jit(lambda d, k: solve_ensemble_impl(d, c, k, n_models)),
            (dense, jax.random.PRNGKey(0)),
            tag="bench_headline",
            statics=f"{c!r}|n={n_models}",
        )

    solve = None

    def run(seed):
        res = solve(dense, jax.random.PRNGKey(seed))
        # device_get rather than block_until_ready: on this remote-TPU
        # platform block_until_ready returns before execution finishes; the
        # host transfer is the reliable fence (and is part of the job anyway)
        coords = np.asarray(res.coords)
        return res, coords

    from chromosome3d_tpu.utils import aot as aot_mod

    aot_mark = aot_mod.event_mark()
    try:
        solve = make_solve(cfg)  # compile (or AOT-cache load)
        run(0)  # warm + prove the executable
    except Exception:
        if not use_pallas:
            raise
        # fall back to the dense XLA energy path if the Pallas kernel fails
        # to lower on this backend (keeps the benchmark alive on new stacks)
        use_pallas = False
        cfg = AnnealConfig(use_pallas=False, exact_restraints=True)
        solve = make_solve(cfg)
        run(0)
    # min over N timed runs, ALL runs recorded: the remote execute/transfer
    # path varies run to run (round 4's 12.0k-vs-14.5k headline split was
    # unattributable because only the min survived), and the metric should
    # reflect the device, not the tunnel's worst draw — while the recorded
    # distribution shows exactly how much the tunnel moved this session
    n_timed = 5
    runs = []
    for _ in range(n_timed):
        t0 = time.time()
        result, coords_np = run(82364)
        runs.append(time.time() - t0)
    wall = min(runs)

    n_structs = n_models * (2 if cfg.enantiomer else 1)
    steps_per_sec = cfg.total_steps / wall

    ours = max(spearman_if_inv_d(matrix, c) for c in coords_np)
    ref_model = read_ca_pdb(
        os.path.join(REF, "output_models", "chr1_500kb_rank03_a11.pdb")
    )
    ref_score = spearman_if_inv_d(matrix, ref_model)

    # ---- provenance: which kernel route/dispatch state/cache produced the
    # number (round-4 VERDICT item 1: a headline that moves between
    # identical-code runs must carry enough state to attribute the move) --
    from chromosome3d_tpu.ops.pallas_energy import describe_dispatch

    L = matrix.shape[0]
    dispatch = describe_dispatch(
        L, batch=n_structs, exact=cfg.exact_restraints,
        fusable=cfg.fuse_update and cfg.angle_weight == 0.0,
    )
    if not use_pallas:
        dispatch["route"] = "jnp_dense"     # the non-Pallas fallback ran
    aot_events = [
        {"tag": e["tag"], "hit": e.get("hit"),
         "seconds": round(e["seconds"], 2)}
        for e in aot_mod.events_since(aot_mark)
    ]

    print(
        json.dumps(
            {
                "metric": "anneal_steps_per_sec_chr1_500kb_x10",
                "value": round(steps_per_sec, 2),
                "unit": "ensemble_steps/s",
                "vs_baseline": round(ours / ref_score, 4),
                "extra": {
                    "platform": platform,
                    "pallas": use_pallas,
                    "wall_seconds": round(wall, 3),
                    "run_seconds": [round(r, 3) for r in runs],
                    "run_median_seconds": round(sorted(runs)[len(runs) // 2], 3),
                    "schedule_steps": cfg.total_steps,
                    "structures": n_structs,
                    "structure_steps_per_sec": round(steps_per_sec * n_structs, 1),
                    "best_spearman_if_inv_d": round(float(ours), 4),
                    "reference_spearman_if_inv_d": round(float(ref_score), 4),
                    "dispatch": dispatch,
                    "aot": aot_events,
                },
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
