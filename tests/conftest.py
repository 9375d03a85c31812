"""Test env: 8 virtual CPU devices so mesh/sharding tests run without TPUs
(SURVEY.md section 4's 'multi-node without a cluster' equivalent)."""

import os

# Must happen before the CPU backend initializes. NOTE: this environment's
# sitecustomize registers a remote-TPU PJRT plugin and forces
# JAX_PLATFORMS=axon at interpreter start, so a plain env-var setdefault is
# not enough — override at the jax.config level too.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# kernel-dispatch decisions must come from the FROZEN defaults in tests,
# not from whatever table `chromosome3d calibrate` may have written on this
# machine (the default path is user-global); tests that exercise the table
# point this env var at their own tmp file via monkeypatch.
os.environ["CHROM3D_DISPATCH_TABLE"] = "/nonexistent/c3d-test-dispatch.json"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

REFERENCE = "/root/reference"

# ---------------------------------------------------------------------------
# Tiered suite: the default run (`pytest tests/ -x -q`) deselects the tests
# below (pytest.ini addopts) to stay fast enough that verification is never
# skipped; `pytest tests/ -m ""` runs everything. Names listed here (base
# name, parametrizations included) are the measured heavyweights — mostly
# full-schedule quality runs and interpret-mode kernel-equivalence tests —
# each of which has a faster sibling left in the default tier.
# ---------------------------------------------------------------------------
SLOW_TESTS = {
    # ground-truth reconstruction through the product path (~20 s / ~100 s)
    "test_ground_truth_reconstruction_reference_scale",
    "test_ground_truth_reconstruction_at_scale",
    # kernel equivalence at large L / full schedules (interpret mode)
    "test_triangular_kernel_matches_full",
    "test_triangular_kernel_grad_matches_autodiff",
    "test_exact_solve_matches_general",
    "test_exact_kernel_batched_matches_general",
    "test_fused_step_vmappable",
    "test_fused_step_matches_unfused",
    "test_fused_step_noise_statistics",
    "test_fused_update_matches_fused_step_with_noise",
    "test_semi_fused_solve_matches_unfused",
    "test_semi_general_solve_matches_unfused",
    "test_sharded_ensemble_semi_general_matches_single_chip",
    "test_fused_update_padded_and_noise_stats",
    "test_pallas_vmap",
    "test_pallas_vmap_grad",
    # sharded-solver equivalence on the CPU mesh
    "test_genome_sharded_2d_matches_1d",
    "test_sharded_ensemble_pallas_matches_jnp",
    "test_sharded_ensemble_fused_matches_single_chip",
    "test_sharded_ensemble_fused_single_device_degenerate",
    "test_sharded_ensemble_fused_rowblock_fallback",
    "test_sharded_ensemble_matches_dense_landmark",
    "test_sharded_ensemble_bf16_stored_tiles",
    "test_solve_with_bf16_stored_tiles",
    "test_sharded_solve_matches_single",
    "test_genome_sharded_matches_plain_bucket",
    "test_run_genome_mixed_scale",
    "test_run_genome_resume_with_large_bucket",
    # end-to-end pipeline variants
    "test_bucketed_single_runs_share_one_program",
    "test_genome_sharded_matches_single_device",
    "test_genome_resume_skips_finished",
    "test_dp_sharded_anneal_trajectory_equal",
    "test_bucket_padding_quality_equivalence",
    "test_pipeline_alpha_ensemble",
    "test_genome_alpha_ensemble",
    "test_run_pipeline_aot_roundtrip",
    "test_run_pipeline_from_cooler",
    "test_run_pipeline_from_hic_v9_with_norm",
    "test_restraints_file_request",
    "test_solve_from_rr",
    "test_cli_coinit",
    "test_solve_coinit_cross_resolution",
    # round-4 equivalence tests (sharded/semi paths, interpret-mode kernels)
    "test_strip_tri_kernel_matches_full",
    "test_sharded_ensemble_with_groups_matches_single_chip",
    "test_sharded_ensemble_accepts_exact_form",
    "test_semi_fused_og_matches_unfused_zero_noise",
    "test_sharded_landmark_two_sided_matches_single",
    "test_landmark_targets_respect_lower_bounds",
    "test_restraints_pipeline_or_groups_dispatch_sharded",
    "test_restraints_pipeline_conf_rr_dispatch_sharded",
    "test_genome_bucket_stacks_exact_form",
    # solver protocol variants (full or near-full schedules)
    "test_landmark_init_quality_parity",
    "test_auto_init_dispatch",
    "test_gradient_clip_changes_solve",
    "test_mds_unknown_fill_modes",
    "test_absolute_weighting_mode",
    "test_runtime_schedule_override",
    "test_solver_deterministic",
    "test_group_term_composes_with_pallas_kernel",
    "test_solver_satisfies_group_restraint",
    # round-3 additions measured >= 10 s each with a faster sibling kept
    # in the default tier
    "test_restraints_pipeline_auto_enables",
    "test_fused_update_matches_unfused",
    "test_solve_from_tbl",
    "test_ping_during_slow_solve",
    "test_sharded_ensemble_padded_bead_mask",
    "test_sharded_solve_program_memoized",
    "test_run_pipeline_shard_large_off_keeps_plain_path",
    "test_solve_bucket_2d_model_axis",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.name.split("[")[0] in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def reference_available():
    return os.path.isdir(REFERENCE)


@pytest.fixture(scope="session")
def chr21_1mb_matrix():
    from chromosome3d_tpu.io.matrix import load_if_matrix

    path = os.path.join(REFERENCE, "input", "chr21_1mb_matrix.txt")
    if not os.path.exists(path):
        pytest.skip("reference inputs not available")
    return load_if_matrix(path)


@pytest.fixture(scope="session")
def chr22_1mb_matrix():
    from chromosome3d_tpu.io.matrix import load_if_matrix

    path = os.path.join(REFERENCE, "input", "chr22_1mb_matrix.txt")
    if not os.path.exists(path):
        pytest.skip("reference inputs not available")
    return load_if_matrix(path)


@pytest.fixture()
def tiny_matrix():
    """Deterministic small IF matrix with the reference's properties:
    symmetric, large diagonal, a few zeros."""
    rng = np.random.RandomState(7)
    L = 16
    base = rng.gamma(2.0, 50.0, size=(L, L))
    m = (base + base.T) / 2
    np.fill_diagonal(m, 5000.0)
    m[0, 9] = m[9, 0] = 0.0
    m[2, 12] = m[12, 2] = 0.0
    return m
