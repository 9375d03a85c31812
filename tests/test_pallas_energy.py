"""Pallas fused kernel vs the jnp reference energy (interpret mode on CPU;
the same tests compile natively on a real TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chromosome3d_tpu.config import RestraintConfig
from chromosome3d_tpu.ops.energy import (
    EnergyWeights,
    dense_restraints_from_numpy,
    energy,
)
from chromosome3d_tpu.ops.pallas_energy import pallas_energy
from chromosome3d_tpu.restraints import build_restraints


def make_case(L=50, seed=0, alpha=1.1):
    rng = np.random.RandomState(seed)
    base = rng.gamma(2.0, 50.0, size=(L, L))
    m = (base + base.T) / 2
    np.fill_diagonal(m, 5000.0)
    r = build_restraints(m, RestraintConfig(alpha=alpha))
    dense = dense_restraints_from_numpy(r)
    x = jnp.asarray(rng.randn(L, 3) * 10, jnp.float32)
    w = EnergyWeights(
        noe=jnp.float32(10.0),
        bond=jnp.float32(10.0),
        bond_length=jnp.float32(3.8),
        vdw=jnp.float32(4.0),
        vdw_radius=jnp.float32(3.06),
        noe_rswitch=jnp.float32(1.0),
    )
    bead = jnp.ones((L,), jnp.float32)
    return x, dense, w, bead


@pytest.mark.parametrize("L", [16, 50, 130, 260])
def test_pallas_energy_matches_dense(L):
    x, dense, w, bead = make_case(L)
    e_ref = float(energy(x, dense, w, bead))
    e_pal = float(pallas_energy(x, dense, w, bead, True))
    assert e_pal == pytest.approx(e_ref, rel=2e-5)


@pytest.mark.parametrize("L", [50, 130])
def test_pallas_grad_matches_dense(L):
    x, dense, w, bead = make_case(L)
    g_ref = jax.grad(energy)(x, dense, w, bead)
    g_pal = jax.grad(lambda c: pallas_energy(c, dense, w, bead, True))(x)
    np.testing.assert_allclose(
        np.asarray(g_pal), np.asarray(g_ref), rtol=2e-4, atol=2e-4
    )


def test_pallas_padded_beads_ignored():
    x, dense, w, bead = make_case(40)
    e0 = float(pallas_energy(x, dense, w, bead, True))
    # pad with garbage beads, masked out
    from chromosome3d_tpu.restraints import build_restraints as _b

    rng = np.random.RandomState(3)
    base = rng.gamma(2.0, 50.0, size=(40, 40))
    m = (base + base.T) / 2
    np.fill_diagonal(m, 5000.0)
    r = _b(m, RestraintConfig(alpha=1.1)).padded(56)
    dense_p = dense_restraints_from_numpy(r)
    xp = jnp.concatenate([x, jnp.asarray(rng.randn(16, 3) * 100, jnp.float32)])
    bead_p = jnp.asarray([1.0] * 40 + [0.0] * 16, jnp.float32)
    # rebuild the unpadded case from the same matrix for a like-for-like check
    dense_u = dense_restraints_from_numpy(_b(m, RestraintConfig(alpha=1.1)))
    e_ref = float(pallas_energy(x, dense_u, w, jnp.ones(40, jnp.float32), True))
    e_pad = float(pallas_energy(xp, dense_p, w, bead_p, True))
    assert e_pad == pytest.approx(e_ref, rel=2e-5)


def test_pallas_vmap():
    x, dense, w, bead = make_case(30)
    xs = jnp.stack([x, x * 1.1, x * 0.9])
    f = jax.vmap(lambda c: pallas_energy(c, dense, w, bead, True))
    es = np.asarray(f(xs))
    singles = [float(pallas_energy(c, dense, w, bead, True)) for c in xs]
    np.testing.assert_allclose(es, singles, rtol=2e-5)


def test_pallas_vmap_grad():
    x, dense, w, bead = make_case(30)
    xs = jnp.stack([x, x * 1.2])
    f = jax.vmap(jax.grad(lambda c: pallas_energy(c, dense, w, bead, True)))
    gs = np.asarray(f(xs))
    for k, c in enumerate(xs):
        g = jax.grad(lambda cc: pallas_energy(cc, dense, w, bead, True))(c)
        np.testing.assert_allclose(gs[k], np.asarray(g), rtol=2e-4, atol=2e-4)


def make_exact_case(L=50, seed=0):
    """Pipeline-realistic case: exact restraints (lo == hi), quadratic well."""
    rng = np.random.RandomState(seed)
    base = rng.gamma(2.0, 50.0, size=(L, L))
    m = (base + base.T) / 2
    np.fill_diagonal(m, 5000.0)
    r = build_restraints(m, RestraintConfig(alpha=0.5))
    assert not r.negdev.any() and not r.posdev.any()
    dense = dense_restraints_from_numpy(r)
    x = jnp.asarray(rng.randn(L, 3) * 10, jnp.float32)
    w = EnergyWeights(
        noe=jnp.float32(10.0),
        bond=jnp.float32(10.0),
        bond_length=jnp.float32(3.8),
        vdw=jnp.float32(4.0),
        vdw_radius=jnp.float32(3.06),
        noe_rswitch=jnp.float32(1e9),
    )
    bead = jnp.ones((L,), jnp.float32)
    return x, dense, w, bead


@pytest.mark.parametrize("L", [16, 50, 130])
def test_exact_kernel_matches_dense(L):
    """The exact-restraint kernel == the jnp reference on exact restraints."""
    x, dense, w, bead = make_exact_case(L)
    e_ref = float(energy(x, dense, w, bead))
    e_exact = float(pallas_energy(x, dense, w, bead, True, True))
    assert e_exact == pytest.approx(e_ref, rel=2e-5)
    g_ref = jax.grad(energy)(x, dense, w, bead)
    g_exact = jax.grad(lambda c: pallas_energy(c, dense, w, bead, True, True))(x)
    np.testing.assert_allclose(
        np.asarray(g_exact), np.asarray(g_ref), rtol=2e-4, atol=2e-4
    )


def test_exact_kernel_batched_matches_general():
    from chromosome3d_tpu.ops.pallas_energy import pallas_energy_and_grad_batched

    x, dense, w, bead = make_exact_case(40)
    xb = jnp.stack([x, x * 0.7 + 1.0])
    e_g, g_g = pallas_energy_and_grad_batched(xb, dense, w, bead, True, False)
    e_x, g_x = pallas_energy_and_grad_batched(xb, dense, w, bead, True, True)
    np.testing.assert_allclose(np.asarray(e_x), np.asarray(e_g), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(g_x), np.asarray(g_g), rtol=2e-4, atol=2e-4)


def test_exact_solve_matches_general(tiny_matrix):
    """solve_ensemble with exact_restraints=True reproduces the general-
    kernel trajectories on pipeline restraints (same RNG, same schedule)."""
    import dataclasses

    from chromosome3d_tpu.config import AnnealConfig, fast_anneal
    from chromosome3d_tpu.solver.anneal import solve_ensemble

    r = build_restraints(tiny_matrix, RestraintConfig())
    dense = dense_restraints_from_numpy(r)
    # interpret-mode pallas on CPU: tiny schedule keeps this fast
    base = dataclasses.replace(fast_anneal(AnnealConfig(), 0.05), use_pallas=False)
    key = jax.random.PRNGKey(5)
    ref = solve_ensemble(dense, base, key, 2)
    cfgx = dataclasses.replace(base, exact_restraints=True)
    got = solve_ensemble(dense, cfgx, key, 2)
    # non-pallas path ignores the flag entirely -> bitwise equal
    np.testing.assert_array_equal(np.asarray(got.coords), np.asarray(ref.coords))


def test_auto_exact_detection(tiny_matrix):
    from chromosome3d_tpu.config import PipelineConfig
    from chromosome3d_tpu.pipeline import auto_exact
    from chromosome3d_tpu.restraints import Restraints

    r = build_restraints(tiny_matrix, RestraintConfig())
    cfg = auto_exact(PipelineConfig(), r)
    assert cfg.anneal.exact_restraints
    # nonzero deviations -> stays off
    r2 = Restraints(
        target=r.target,
        negdev=np.where(r.mask, 0.1, 0.0).astype(np.float32),
        posdev=r.posdev,
        mask=r.mask,
    )
    assert not auto_exact(PipelineConfig(), r2).anneal.exact_restraints
    # soft-square tail active -> stays off
    import dataclasses

    from chromosome3d_tpu.config import AnnealConfig

    cfg3 = PipelineConfig(anneal=AnnealConfig(noe_rswitch=2.0))
    assert not auto_exact(cfg3, r).anneal.exact_restraints


def _fused_step_rowapi(xb, mu, nu, *args, **kw):
    """Row-layout adapter over the T-layout fused step (tests compare
    against row-layout references)."""
    from chromosome3d_tpu.ops.pallas_energy import pallas_fused_step_batched

    def T(a):
        return jnp.swapaxes(jnp.asarray(a, jnp.float32), 1, 2)

    e, xT, muT, nuT = pallas_fused_step_batched(T(xb), T(mu), T(nu), *args, **kw)
    return (
        e,
        jnp.swapaxes(xT, 1, 2),
        jnp.swapaxes(muT, 1, 2),
        jnp.swapaxes(nuT, 1, 2),
    )


def _ref_adam_step(xb, mu, nu, g, lr, t, clip=None):
    """Reference Adam update matching optax.scale_by_adam defaults."""
    from chromosome3d_tpu.solver.anneal import _clip_per_bead

    g = np.asarray(_clip_per_bead(jnp.asarray(g), clip))
    mu2 = 0.9 * mu + 0.1 * g
    nu2 = 0.999 * nu + 0.001 * g * g
    bc1 = 1.0 / (1.0 - 0.9 ** t)
    bc2 = 1.0 / (1.0 - 0.999 ** t)
    upd = (mu2 * bc1) / (np.sqrt(nu2 * bc2) + 1e-8)
    return xb - lr * upd, mu2, nu2, bc1, bc2


@pytest.mark.parametrize("clip", [None, 0.5])
def test_fused_step_matches_unfused(clip):
    """pallas_fused_step_batched with sigma=0 == the unfused step exactly:
    same energies, same Adam moments, same coordinates."""
    from chromosome3d_tpu.ops.pallas_energy import pallas_energy_and_grad_batched

    x, dense, w, bead = make_exact_case(40)
    rng = np.random.RandomState(0)
    xb = jnp.stack([x, x * 0.8 + 0.5, -x])
    mu = rng.normal(0, 0.1, xb.shape).astype(np.float32)
    nu = np.abs(rng.normal(0, 0.01, xb.shape)).astype(np.float32)
    lr, t = 0.05, 7

    e_ref, g = pallas_energy_and_grad_batched(xb, dense, w, bead, True, True)
    x_ref, mu_ref, nu_ref, bc1, bc2 = _ref_adam_step(
        np.asarray(xb), mu, nu, np.asarray(g), lr, t, clip
    )
    e_f, x_f, mu_f, nu_f = _fused_step_rowapi(
        xb, mu, nu, dense, w, bead,
        lr, 0.0, bc1, bc2, 1, t - 1,
        -1.0 if clip is None else clip, interpret=True,
    )
    # rowsums ride the MXU in the T-layout kernel; reduction reassociation
    # shifts a handful of elements by ~2e-4 relative
    np.testing.assert_allclose(np.asarray(e_f), np.asarray(e_ref), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(mu_f), mu_ref, rtol=5e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(nu_f), nu_ref, rtol=5e-4, atol=1e-8)
    np.testing.assert_allclose(np.asarray(x_f), x_ref, rtol=5e-4, atol=5e-4)


def test_fused_step_padded_beads_stay_zero():
    x, dense, w, bead = make_exact_case(30)
    L = 30
    bead2 = jnp.asarray(np.concatenate([np.ones(20), np.zeros(10)]), jnp.float32)
    xb = jnp.stack([x * jnp.asarray(bead2)[:, None]])
    z = jnp.zeros_like(xb)
    e, x2, mu2, nu2 = _fused_step_rowapi(
        xb, z, z, dense, w, bead2, 0.05, 0.7, 1.0, 1.0, 3, 0, -1.0,
        interpret=True,
    )
    x2 = np.asarray(x2)
    assert np.isfinite(x2).all()
    # padding rows get neither update nor noise
    np.testing.assert_array_equal(x2[:, 20:, :], 0.0)
    assert np.abs(x2[:, :20, :] - np.asarray(xb)[:, :20, :]).max() > 0


def test_fused_step_noise_statistics():
    """lr=0, sigma=1: the coordinate delta IS the noise — check it is
    standard-normal-ish and differs across steps."""
    x, dense, w, bead = make_exact_case(130)
    xb = jnp.stack([x, x])
    z = jnp.zeros_like(xb)

    def noise_at(step):
        _, x2, _, _ = _fused_step_rowapi(
            xb, z, z, dense, w, bead, 0.0, 1.0, 1.0, 1.0, 42, step, -1.0,
            interpret=True,
        )
        return np.asarray(x2 - xb).ravel()

    n1, n2 = noise_at(0), noise_at(1)
    assert abs(n1.mean()) < 0.06
    assert 0.9 < n1.std() < 1.1
    # skewness/extremes sane for a normal
    assert np.abs(n1).max() < 6.0
    assert not np.allclose(n1, n2)
    # deterministic for the same (seed, step)
    np.testing.assert_array_equal(n1, noise_at(0))


def test_fused_step_vmappable():
    """The genome runner vmaps solve_ensemble_impl over chromosomes; the
    fused step must batch cleanly (per-lane restraints AND per-lane noise
    seeds — batched scalars cannot ride SMEM, see the (1, 128) ints block)."""
    from chromosome3d_tpu.ops.energy import DenseRestraints

    cases = [make_exact_case(40, seed=s) for s in (0, 1)]
    dense = DenseRestraints(
        lo=jnp.stack([c[1].lo for c in cases]),
        hi=jnp.stack([c[1].hi for c in cases]),
        mask=jnp.stack([c[1].mask for c in cases]),
        weight=jnp.stack([c[1].weight for c in cases]),
    )
    w = cases[0][2]
    bead = jnp.stack([c[3] for c in cases])
    xb = jnp.stack([jnp.stack([c[0], c[0] * 0.9]) for c in cases])  # (2, 2, L, 3)
    z = jnp.zeros_like(xb)
    seeds = jnp.asarray([3, 9], jnp.int32)

    f = jax.vmap(
        lambda d, x, m, n, b, s: _fused_step_rowapi(
            x, m, n, d, w, b, 0.05, 0.3, 1.0, 1.0, s, 0, -1.0, interpret=True
        )
    )
    e, x2, mu2, nu2 = f(dense, xb, z, z, bead, seeds)
    assert e.shape == (2, 2) and x2.shape == xb.shape
    assert np.isfinite(np.asarray(x2)).all()
    # per-lane results match the unvmapped call (including the seed routing)
    for lane in range(2):
        e1, x1, _, _ = _fused_step_rowapi(
            xb[lane], z[lane], z[lane],
            DenseRestraints(*(t[lane] for t in dense)), w, bead[lane],
            0.05, 0.3, 1.0, 1.0, seeds[lane], 0, -1.0, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(e[lane]), np.asarray(e1), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(x2[lane]), np.asarray(x1), rtol=1e-6)


def test_triangular_kernel_matches_full():
    """The symmetry-exploiting triangular kernel must reproduce the full
    exact kernel (energies + gradients) across odd/even block counts,
    padded lengths, and bead masks."""
    from chromosome3d_tpu.config import RestraintConfig
    from chromosome3d_tpu.ops.energy import dense_restraints_from_numpy
    from chromosome3d_tpu.ops.pallas_energy import (
        _pairwise_energy_grad_batched,
        pallas_energy_grad_tri_batched,
    )
    from chromosome3d_tpu.ops.energy import EnergyWeights
    from chromosome3d_tpu.restraints import build_restraints

    wts = EnergyWeights(
        noe=jnp.float32(7.0), bond=jnp.float32(0.0),
        bond_length=jnp.float32(3.8), vdw=jnp.float32(1.3),
        vdw_radius=jnp.float32(2.0), noe_rswitch=jnp.float32(1e9),
    )
    rng = np.random.RandomState(0)
    for L, tile, bead_cut in (
        (40, 16, None),   # T=3 (odd shells)
        (50, 16, 44),     # T=4 (even: duplicated last shell) + padding + mask
        (33, 8, 30),      # T=5, ragged pad
        (16, 16, None),   # T=1 (single diagonal block)
    ):
        base = rng.gamma(2.0, 50.0, size=(L, L))
        m = (base + base.T) / 2
        np.fill_diagonal(m, 5000.0)
        dense = dense_restraints_from_numpy(build_restraints(m, RestraintConfig()))
        bead = np.ones(L, np.float32)
        if bead_cut:
            bead[bead_cut:] = 0.0
        x = jnp.asarray(rng.normal(0, 5, (3, L, 3)), jnp.float32)
        e_t, g_t = pallas_energy_grad_tri_batched(
            x, dense, wts, jnp.asarray(bead), interpret=True, tile=tile
        )
        e_f, g_f = _pairwise_energy_grad_batched(
            x, dense, wts, jnp.asarray(bead), True, True
        )
        np.testing.assert_allclose(np.asarray(e_t), np.asarray(e_f), rtol=3e-5)
        np.testing.assert_allclose(
            np.asarray(g_t), np.asarray(g_f), rtol=2e-4, atol=2e-4
        )


def test_triangular_dispatch_threshold():
    """Small (shipped-genome) lengths stay on the fused whole-matrix path;
    the triangular kernel engages past the L=1024 crossover."""
    from chromosome3d_tpu.ops.pallas_energy import use_triangular

    assert not use_triangular(456)
    assert not use_triangular(512)
    assert not use_triangular(1024)
    # round-3 calibration: the fused step wins wherever it lowers (ties at
    # 1024, wins at 2048) -> tri engages only past the fused VMEM cap
    assert not use_triangular(2048)
    assert use_triangular(2176)
    assert use_triangular(4096)


def test_triangular_kernel_grad_matches_autodiff():
    """Independent check: the triangular kernel's gradient equals autodiff
    of the dense jnp energy (not just the full-matrix kernel)."""
    from chromosome3d_tpu.ops.pallas_energy import pallas_energy_grad_tri_batched

    x, dense, w, bead = make_exact_case(44)
    xb = jnp.stack([x, -0.8 * x])
    e_t, g_t = pallas_energy_grad_tri_batched(
        xb, dense, w, bead, interpret=True, tile=16
    )
    w0 = w._replace(bond=jnp.float32(0.0))  # tri kernel covers pair terms only
    for k in range(2):
        e_ref = float(energy(xb[k], dense, w0, bead))
        g_ref = jax.grad(energy)(xb[k], dense, w0, bead)
        assert float(e_t[k]) == pytest.approx(e_ref, rel=3e-5)
        np.testing.assert_allclose(
            np.asarray(g_t[k]), np.asarray(g_ref), rtol=2e-4, atol=2e-4
        )


# ---------------------------------------------------------------------------
# Fused UPDATE companion kernel (round 3): the triangular/row pair kernel +
# pallas_fused_update_batched must reproduce both the unfused optax step and
# the fully fused step (same noise stream by construction).
# ---------------------------------------------------------------------------

def _semi_step_rowapi(xb, mu, nu, dense, w, bead, lr, sigma, bc1, bc2,
                      seed, step, clip):
    """Row-layout adapter over the semi-fused step: exact pair kernel grad
    (tri-or-row dispatch) + the fused update companion."""
    from chromosome3d_tpu.ops.pallas_energy import (
        _pairwise_energy_grad_batched,
        pallas_fused_update_batched,
    )

    def T(a):
        return jnp.swapaxes(jnp.asarray(a, jnp.float32), 1, 2)

    e_pair, g = _pairwise_energy_grad_batched(
        jnp.asarray(xb, jnp.float32), dense, w, bead, True, True
    )
    e_b, xT, muT, nuT = pallas_fused_update_batched(
        T(xb), T(g), T(mu), T(nu), w, bead, lr, sigma, bc1, bc2,
        seed, step, clip, interpret=True,
    )
    return (
        e_pair + e_b,
        jnp.swapaxes(xT, 1, 2),
        jnp.swapaxes(muT, 1, 2),
        jnp.swapaxes(nuT, 1, 2),
    )


@pytest.mark.parametrize("clip", [None, 0.5])
def test_fused_update_matches_unfused(clip):
    """Pair kernel + update companion with sigma=0 == the unfused step:
    same total energy, same Adam moments, same coordinates."""
    from chromosome3d_tpu.ops.pallas_energy import pallas_energy_and_grad_batched

    x, dense, w, bead = make_exact_case(40)
    rng = np.random.RandomState(1)
    xb = jnp.stack([x, x * 0.8 + 0.5, -x])
    mu = rng.normal(0, 0.1, xb.shape).astype(np.float32)
    nu = np.abs(rng.normal(0, 0.01, xb.shape)).astype(np.float32)
    lr, t = 0.05, 7

    e_ref, g = pallas_energy_and_grad_batched(xb, dense, w, bead, True, True)
    x_ref, mu_ref, nu_ref, bc1, bc2 = _ref_adam_step(
        np.asarray(xb), mu, nu, np.asarray(g), lr, t, clip
    )
    e_s, x_s, mu_s, nu_s = _semi_step_rowapi(
        xb, mu, nu, dense, w, bead, lr, 0.0, bc1, bc2, 1, t - 1,
        -1.0 if clip is None else clip,
    )
    np.testing.assert_allclose(np.asarray(e_s), np.asarray(e_ref), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(mu_s), mu_ref, rtol=5e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(nu_s), nu_ref, rtol=5e-4, atol=1e-8)
    np.testing.assert_allclose(np.asarray(x_s), x_ref, rtol=5e-4, atol=5e-4)


def test_fused_update_matches_fused_step_with_noise():
    """With the SAME seed/step the semi-fused combo and the fully fused step
    produce the same trajectory update including noise (the noise stream is
    bitwise shared; pair-gradient reassociation gives ~1e-4 tolerance)."""
    x, dense, w, bead = make_exact_case(40)
    rng = np.random.RandomState(2)
    xb = jnp.stack([x, -x])
    mu = rng.normal(0, 0.1, xb.shape).astype(np.float32)
    nu = np.abs(rng.normal(0, 0.01, xb.shape)).astype(np.float32)
    args = (0.05, 0.7, 1.0, 1.0, 12345, 3, -1.0)

    e_f, x_f, mu_f, nu_f = _fused_step_rowapi(
        xb, mu, nu, dense, w, bead, *args, interpret=True
    )
    e_s, x_s, mu_s, nu_s = _semi_step_rowapi(xb, mu, nu, dense, w, bead, *args)
    np.testing.assert_allclose(np.asarray(e_s), np.asarray(e_f), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(x_s), np.asarray(x_f),
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(mu_s), np.asarray(mu_f),
                               rtol=5e-4, atol=1e-5)


def test_semi_fused_solve_matches_unfused(monkeypatch):
    """solve_ensemble_impl's semi-fused path (forced via use_triangular)
    with zero noise must track the unfused solve trajectory."""
    import dataclasses

    import chromosome3d_tpu.ops.pallas_energy as pe
    from chromosome3d_tpu.config import AnnealConfig, fast_anneal
    from chromosome3d_tpu.solver.anneal import solve_ensemble_impl

    _, dense, w, bead = make_exact_case(44)
    base = fast_anneal(AnnealConfig(), 0.1)
    cfg_semi = dataclasses.replace(
        base, use_pallas=True, exact_restraints=True, fuse_update=True,
        noise_scale=0.0,
    )
    cfg_ref = dataclasses.replace(cfg_semi, use_pallas=False)
    key = jax.random.PRNGKey(5)

    monkeypatch.setattr(
        pe, "use_triangular", lambda L, for_unfused=False, batch=None: True
    )
    res_semi = solve_ensemble_impl(dense, cfg_semi, key, 2, bead)
    monkeypatch.undo()
    res_ref = solve_ensemble_impl(dense, cfg_ref, key, 2, bead)
    np.testing.assert_allclose(
        np.asarray(res_semi.coords), np.asarray(res_ref.coords),
        rtol=1e-3, atol=2e-3,
    )
    np.testing.assert_allclose(
        np.asarray(res_semi.energies["overall"]),
        np.asarray(res_ref.energies["overall"]),
        rtol=1e-4,
    )


def test_semi_general_solve_matches_unfused():
    """GENERAL (windowed) restraints with fuse_update: the semi path is the
    whole-matrix soft-square pair kernel + the fused update companion
    (round 4 — external .rr/.tbl files with real deviation windows no
    longer pay the unfused optax/threefry glue). With zero noise it must
    track the unfused jnp solve trajectory."""
    import dataclasses

    from chromosome3d_tpu.config import AnnealConfig, fast_anneal
    from chromosome3d_tpu.solver.anneal import solve_ensemble_impl

    _, dense, w, bead = make_exact_case(44)
    # widen the wells so the case genuinely exercises the windowed
    # (lo < hi) branch of the general kernel, not exact-in-disguise
    dense = dense._replace(lo=dense.lo * 0.8, hi=dense.hi * 1.2)
    base = fast_anneal(AnnealConfig(), 0.1)
    cfg_semi = dataclasses.replace(
        base, use_pallas=True, exact_restraints=False, fuse_update=True,
        noise_scale=0.0,
    )
    cfg_ref = dataclasses.replace(cfg_semi, use_pallas=False)
    key = jax.random.PRNGKey(5)

    res_semi = solve_ensemble_impl(dense, cfg_semi, key, 2, bead)
    res_ref = solve_ensemble_impl(dense, cfg_ref, key, 2, bead)
    np.testing.assert_allclose(
        np.asarray(res_semi.coords), np.asarray(res_ref.coords),
        rtol=1e-3, atol=2e-3,
    )
    np.testing.assert_allclose(
        np.asarray(res_semi.energies["overall"]),
        np.asarray(res_ref.energies["overall"]),
        rtol=1e-4,
    )


def test_fused_update_padded_and_noise_stats():
    """Padded beads stay pinned; the companion's noise is ~N(0, sigma^2)."""
    x, dense, w, bead = make_exact_case(30)
    bead2 = jnp.asarray(np.concatenate([np.ones(20), np.zeros(10)]), jnp.float32)
    xb = jnp.stack([x * bead2[:, None]])
    z = jnp.zeros_like(xb)
    sigma = 0.7
    deltas = []
    # seeds must be SPREAD (sequential small seeds share high hash bits and
    # correlate — the production seed is a random int32)
    for seed in [13, 990, 48271, 104729, 1299709, 15485863,
                 32452843, 49979687, 67867967, 86028121, 982451653, 2038074743]:
        from chromosome3d_tpu.ops.pallas_energy import pallas_fused_update_batched

        def T(a):
            return jnp.swapaxes(jnp.asarray(a, jnp.float32), 1, 2)

        e_b, xT, _, _ = pallas_fused_update_batched(
            T(xb), T(z), T(z), T(z), w, bead2, 0.0, sigma, 1.0, 1.0,
            seed, 0, -1.0, interpret=True,
        )
        x2 = np.asarray(jnp.swapaxes(xT, 1, 2))
        assert np.abs(x2[0, 20:]).max() == 0.0  # padded beads pinned
        deltas.append((x2 - np.asarray(xb))[0, :20].ravel())
    d = np.concatenate(deltas)  # lr=0, g=0 -> pure noise
    assert abs(d.mean()) < 0.08
    assert abs(d.std() - sigma) < 0.08


def test_gram_d2_parity():
    """The MXU-hybrid d^2 (gram=True) must match broadcast differencing to
    ~1e-3 relative in both the fused step and the triangular kernel."""
    from chromosome3d_tpu.ops.pallas_energy import (
        pallas_energy_grad_tri_batched,
    )

    x, dense, w, bead = make_exact_case(40)
    xb = jnp.stack([x, -x])
    z = jnp.zeros_like(jnp.swapaxes(xb, 1, 2))
    args = (0.05, 0.0, 1.0, 1.0, 3, 0, -1.0)

    e_a, x_a, _, _ = _fused_step_rowapi(
        xb, np.zeros(xb.shape, np.float32), np.zeros(xb.shape, np.float32),
        dense, w, bead, *args, interpret=True,
    )
    e_b, x_b, _, _ = _fused_step_rowapi(
        xb, np.zeros(xb.shape, np.float32), np.zeros(xb.shape, np.float32),
        dense, w, bead, *args, interpret=True, gram=True,
    )
    np.testing.assert_allclose(np.asarray(e_b), np.asarray(e_a), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(x_b), np.asarray(x_a),
                               rtol=1e-3, atol=1e-3)

    e_t, g_t = pallas_energy_grad_tri_batched(xb, dense, w, bead,
                                              interpret=True, tile=16)
    e_g, g_g = pallas_energy_grad_tri_batched(xb, dense, w, bead,
                                              interpret=True, tile=16,
                                              gram=True)
    np.testing.assert_allclose(np.asarray(e_g), np.asarray(e_t), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(g_g), np.asarray(g_t),
                               rtol=2e-2, atol=2e-2)


def test_strip_tri_kernel_matches_full():
    """The strip-triangular kernel (the tri round-robin lifted across a
    row-sharded mesh axis, round-4 item 1): simulating every shard serially
    and summing the assembled contributions must reproduce the full exact
    kernel's energy and gradient — odd/even global tile counts, bead masks,
    several shard counts."""
    from chromosome3d_tpu.config import RestraintConfig
    from chromosome3d_tpu.ops.energy import (
        EnergyWeights,
        dense_restraints_from_numpy,
    )
    from chromosome3d_tpu.ops.pallas_energy import (
        _pairwise_energy_grad_batched,
        assemble_strip_tri_grad,
        pallas_strip_tri_energy_grad_batched,
        pick_tile_tri_strip,
        strip_tri_feasible,
    )
    from chromosome3d_tpu.restraints import build_restraints

    wts = EnergyWeights(
        noe=jnp.float32(7.0), bond=jnp.float32(0.0),
        bond_length=jnp.float32(3.8), vdw=jnp.float32(1.3),
        vdw_radius=jnp.float32(2.0), noe_rswitch=jnp.float32(1e9),
    )
    rng = np.random.RandomState(5)
    for L, n_dev, bead_cut in (
        (48, 2, None),    # Lb=24, TM=8 -> Tg=6 (even, dedup shell)
        (80, 4, 72),      # Lb=20 (TM divisor hunt), mask
        (120, 8, None),   # Lb=15 -> TM must divide 15... skip-check below
        (64, 4, 60),      # Lb=16, TM=16, Tg=4
        (40, 5, None),    # Lb=8, TM=8, Tg=5 (odd shells)
    ):
        if not strip_tri_feasible(L, n_dev):
            continue
        Lb = L // n_dev
        TM = pick_tile_tri_strip(Lb)
        base = rng.gamma(2.0, 50.0, size=(L, L))
        m = (base + base.T) / 2
        np.fill_diagonal(m, 5000.0)
        dense = dense_restraints_from_numpy(build_restraints(m, RestraintConfig()))
        bead = np.ones(L, np.float32)
        if bead_cut:
            bead[bead_cut:] = 0.0
        bead_j = jnp.asarray(bead)
        B = 3
        x = jnp.asarray(rng.normal(0, 5, (B, L, 3)), jnp.float32)
        xT = jnp.swapaxes(x, 1, 2)
        w_full = dense.mask * dense.weight

        e_total = jnp.zeros((B,), jnp.float32)
        g_total = jnp.zeros((B, 3, L), jnp.float32)
        for d in range(n_dev):
            row0 = jnp.int32(d * Lb)
            # unrolled global-layout strips: the row-tile offset reaches the
            # kernel as a scalar-prefetch operand (no rolled copies)
            t_strip = jax.lax.dynamic_slice(dense.lo, (row0, 0), (Lb, L))
            w_strip = jax.lax.dynamic_slice(w_full, (row0, 0), (Lb, L))
            e_p, grow, gcol = pallas_strip_tri_energy_grad_batched(
                x, xT, t_strip, w_strip, bead_j,
                row0 // TM, wts, interpret=True,
            )
            e_total = e_total + e_p
            g_total = g_total + assemble_strip_tri_grad(grow, gcol, row0, L)

        e_f, g_f = _pairwise_energy_grad_batched(
            x, dense, wts, bead_j, True, True
        )
        np.testing.assert_allclose(
            np.asarray(e_total), np.asarray(e_f), rtol=3e-5,
            err_msg=f"L={L} n_dev={n_dev}",
        )
        np.testing.assert_allclose(
            np.asarray(jnp.swapaxes(g_total, 1, 2)), np.asarray(g_f),
            rtol=2e-4, atol=2e-4, err_msg=f"L={L} n_dev={n_dev}",
        )


def test_bf16_tiles_close_to_f32():
    """AnnealConfig.pair_bf16: bf16 restraint tiles with f32 math must track
    the f32-tile kernels to bf16 precision (~0.4% relative) in both the row
    and triangular exact kernels, and through a short solve."""
    import dataclasses

    from chromosome3d_tpu.config import AnnealConfig, fast_anneal
    from chromosome3d_tpu.ops.pallas_energy import (
        _pairwise_energy_grad_batched,
        pallas_energy_grad_tri_batched,
    )
    from chromosome3d_tpu.solver.anneal import solve_ensemble_impl

    x, dense, w, bead = make_exact_case(300)
    xb = jnp.stack([x, x * 0.9])

    e32, g32 = _pairwise_energy_grad_batched(
        xb, dense, w, bead, interpret=True, exact=True, no_tri=True
    )
    e16, g16 = _pairwise_energy_grad_batched(
        xb, dense, w, bead, interpret=True, exact=True, no_tri=True, bf16=True
    )
    np.testing.assert_allclose(np.asarray(e16), np.asarray(e32), rtol=2e-2)
    np.testing.assert_allclose(
        np.asarray(g16), np.asarray(g32),
        rtol=5e-2, atol=2e-2 * float(jnp.abs(g32).max()),
    )

    et32, gt32 = pallas_energy_grad_tri_batched(
        xb, dense, w, bead, interpret=True, tile=128
    )
    et16, gt16 = pallas_energy_grad_tri_batched(
        xb, dense, w, bead, interpret=True, tile=128, bf16=True
    )
    np.testing.assert_allclose(np.asarray(et16), np.asarray(et32), rtol=2e-2)
    np.testing.assert_allclose(
        np.asarray(gt16), np.asarray(gt32),
        rtol=5e-2, atol=2e-2 * float(jnp.abs(gt32).max()),
    )

    # a short fused-path solve with bf16 tiles stays finite and lands near
    # the f32 solve's energy (not bitwise: targets carry ~0.4% error)
    _, dense_s, _, bead_s = make_exact_case(44)
    cfg32 = dataclasses.replace(
        fast_anneal(AnnealConfig(), 0.1), use_pallas=True,
        exact_restraints=True, noise_scale=0.0,
    )
    cfg16 = dataclasses.replace(cfg32, pair_bf16=True)
    key = jax.random.PRNGKey(3)
    r32 = solve_ensemble_impl(dense_s, cfg32, key, 2, bead_s)
    r16 = solve_ensemble_impl(dense_s, cfg16, key, 2, bead_s)
    e_a = np.asarray(r32.energies["overall"])
    e_b = np.asarray(r16.energies["overall"])
    assert np.isfinite(e_b).all()
    np.testing.assert_allclose(e_b, e_a, rtol=0.1)


def test_row_block_feasible_bounds():
    """The sharded row-block kernel's minimum (8, Lp) tile outgrows the
    scoped-VMEM budget past global L ~ 54k: the dispatcher must refuse it
    there (the chunked jnp fallback takes over) and _pick_tile_rows must
    return None rather than an uncompilable tile size."""
    from chromosome3d_tpu.ops.pallas_energy import (
        _pick_tile_rows,
        _round_up,
        row_block_feasible,
    )

    assert row_block_feasible(8192, 8, True)
    assert row_block_feasible(32768, 8, True)
    assert not row_block_feasible(65536, 8, True)
    assert not row_block_feasible(65536, 64, False)
    assert _pick_tile_rows(8192, _round_up(65536, 128), True) is None
    # the budget rule itself: every returned tile fits 8.5*t*Lp*4 <= 14 MiB
    for L in (456, 2048, 8192, 24576, 53248):
        Lp = _round_up(L, 128)
        t = _pick_tile_rows(L // 8, Lp, True)
        if t is not None:
            assert 8.5 * t * Lp * 4 <= 14 * 1024 * 1024
