"""Mixed-precision iterative refinement (SURVEY.md section 7.3 "fp64 on
TPU"): f32 CG inner solves + f64 true-residual outer loop must converge past
the f32 residual floor, with fem/stencil.apply_numpy as the independent
float64 operator."""

import numpy as np

import jax.numpy as jnp

from stan_tpu.core import meshgen
from stan_tpu.fem import stencil
from stan_tpu.solvers import cg as cg_mod

import pytest

pytestmark = pytest.mark.slow  # interpret-mode Pallas / large meshes: minutes on CPU



def _setup(nx=6, ny=4, nz=4):
    m = meshgen.hex_beam(nx, ny, nz)
    op32 = stencil.build_stencil_operator(m, dtype=jnp.float32)
    t64, d64 = stencil.exact_tables(m)
    free = np.asarray(op32.free_mask, np.float64)

    def A_hi(x):
        return (free * stencil.apply_numpy(t64, d64, free * x)
                + (1.0 - free) * x)

    f = np.asarray(op32.to_grid(jnp.asarray(m.load_vector()))) * free
    return m, op32, A_hi, f, free


def test_apply_numpy_matches_device_f64():
    m = meshgen.hex_beam(4, 3, 3)
    op64 = stencil.build_stencil_operator(m, dtype=jnp.float64)
    u = np.random.default_rng(0).normal(size=(3,) + op64.node_shape)
    f_dev = np.asarray(op64.apply_raw(jnp.asarray(u)))
    f_np = stencil.apply_numpy(op64.tables, op64.deltas, u)
    scale = np.abs(f_dev).max()
    np.testing.assert_allclose(f_np, f_dev, atol=1e-12 * scale)


def test_refined_reaches_f64_tolerance():
    m, op32, A_hi, f, free = _setup()
    res = cg_mod.pcg_refined(
        op32.apply, f, A_hi,
        diag=op32.diagonal(), tol=1e-10, inner_tol=1e-6,
        ndof=3 * m.nnode,
    )
    assert res.converged, f"stalled at rel residual {res.rel_residual}"
    assert res.rel_residual <= 1e-10
    assert res.cycles >= 2  # a single f32 solve cannot reach 1e-10


def test_refined_beats_plain_f32_floor():
    m, op32, A_hi, f, free = _setup()
    # Plain f32 solve: drive the recurrence residual as far as it goes.
    plain = cg_mod.pcg(op32.apply, jnp.asarray(f, jnp.float32),
                       diag=op32.diagonal(), tol=1e-12, ndof=3 * m.nnode)
    x32 = np.asarray(plain.u, np.float64)
    bnorm = np.linalg.norm(f.ravel())
    rel32 = np.linalg.norm((f - A_hi(x32)).ravel()) / bnorm

    refined = cg_mod.pcg_refined(
        op32.apply, f, A_hi, diag=op32.diagonal(), tol=1e-11,
        inner_tol=1e-6, ndof=3 * m.nnode,
    )
    assert refined.rel_residual < rel32 * 1e-2, (
        f"refined {refined.rel_residual} vs plain f32 floor {rel32}")


def test_refined_matches_f64_direct_solve():
    m, op32, A_hi, f, free = _setup(4, 3, 3)
    op64 = stencil.build_stencil_operator(m, dtype=jnp.float64)
    ref = cg_mod.pcg(op64.apply, jnp.asarray(f), diag=op64.diagonal(),
                     tol=1e-12, ndof=3 * m.nnode)
    res = cg_mod.pcg_refined(
        op32.apply, f, A_hi, diag=op32.diagonal(), tol=1e-11,
        ndof=3 * m.nnode,
    )
    u_ref = np.asarray(ref.u)
    scale = np.abs(u_ref).max()
    np.testing.assert_allclose(res.u, u_ref, atol=1e-9 * scale)
