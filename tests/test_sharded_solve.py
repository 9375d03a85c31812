"""Sequence-parallel solve: the row-sharded annealer must reproduce the
single-device solve_single trajectory exactly (same RNG stream)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from chromosome3d_tpu.config import AnnealConfig, RestraintConfig, fast_anneal
from chromosome3d_tpu.ops.energy import dense_restraints_from_numpy
from chromosome3d_tpu.restraints import build_restraints
from chromosome3d_tpu.solver.anneal import solve_single
from chromosome3d_tpu.solver.init import mds_init
from chromosome3d_tpu.solver.sharded import solve_single_sharded


def make_case(L):
    rng = np.random.RandomState(0)
    base = rng.gamma(2.0, 50.0, size=(L, L))
    m = (base + base.T) / 2
    np.fill_diagonal(m, 5000.0)
    return dense_restraints_from_numpy(build_restraints(m, RestraintConfig()))


def test_sharded_solve_matches_single():
    L = 16 * 8
    dense = make_case(L)
    cfg = fast_anneal(AnnealConfig())
    x0 = mds_init(dense)
    key = jax.random.PRNGKey(3)
    mesh = Mesh(np.array(jax.devices()), ("beads",))
    c_sharded, h_sharded = jax.jit(
        lambda d, k, x: solve_single_sharded(mesh, d, cfg, k, x)
    )(dense, key, x0)
    c_single, h_single = solve_single(dense, cfg, key, x0)
    np.testing.assert_allclose(
        np.asarray(h_sharded), np.asarray(h_single), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(c_sharded), np.asarray(c_single), atol=1e-3
    )


def test_sharded_solve_rejects_bad_length():
    dense = make_case(50)
    cfg = fast_anneal(AnnealConfig())
    mesh = Mesh(np.array(jax.devices()), ("beads",))
    with pytest.raises(ValueError):
        solve_single_sharded(
            mesh, dense, cfg, jax.random.PRNGKey(0), jnp.zeros((50, 3))
        )
