"""Structured-grid fast path: equivalence with the general operator."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stan_tpu.core import meshgen
from stan_tpu.fem import structured
from stan_tpu.fem.operator import build_operator


def _pair(nx=4, ny=3, nz=2, **kw):
    m = meshgen.hex_beam(nx, ny, nz, **kw)
    op = build_operator(
        m.coords, m.conn, m.elem_d_matrices(), m.fix_mask(), m.formulation()
    )
    sop = structured.build_structured_operator(m)
    assert sop is not None
    return m, op, sop


def test_detect_structured():
    m = meshgen.hex_beam(3, 2, 2)
    info = structured.detect_structured(m)
    assert info is not None
    assert info["nelems"] == (3, 2, 2)
    assert info["spacing"] == (1.0, 1.0, 1.0)


def test_detect_rejects_perturbed_mesh():
    m = meshgen.hex_beam(3, 2, 2)
    m.coords = m.coords.copy()
    m.coords[5, 0] += 0.01  # break the lattice
    assert structured.detect_structured(m) is None


def test_detect_nonuniform_spacing_ok():
    m = meshgen.hex_beam(4, 2, 2, lx=8.0, ly=1.0, lz=3.0)
    info = structured.detect_structured(m)
    assert info is not None
    assert info["spacing"] == (2.0, 0.5, 1.5)


def test_apply_matches_general_operator():
    m, op, sop = _pair()
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=(m.nnode, 3)))
    want = np.asarray(op.apply(u))
    got = np.asarray(sop.to_flat(sop.apply(sop.to_grid(u))))
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


def test_apply_matches_with_nonuniform_spacing_and_g1():
    m = meshgen.hex_beam(3, 3, 2, lx=6.0, ly=1.5, lz=3.0, elem_type="HEX8_G1")
    op = build_operator(
        m.coords, m.conn, m.elem_d_matrices(), m.fix_mask(), m.formulation()
    )
    sop = structured.build_structured_operator(m)
    assert sop is not None
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.normal(size=(m.nnode, 3)))
    np.testing.assert_allclose(
        np.asarray(sop.to_flat(sop.apply(sop.to_grid(u)))),
        np.asarray(op.apply(u)),
        rtol=1e-10, atol=1e-10,
    )


def test_diagonal_matches():
    m, op, sop = _pair()
    want = np.asarray(op.diagonal())
    got = np.asarray(sop.to_flat(sop.diagonal()))
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


def test_solve_structured_equals_general():
    from stan_tpu.analysis.linear import solve_linear_statics

    m1 = meshgen.hex_beam(4, 3, 3)
    r1 = solve_linear_statics(m1, store=False, use_structured=True)
    m2 = meshgen.hex_beam(4, 3, 3)
    r2 = solve_linear_statics(m2, store=False, use_structured=False)
    assert r1.converged and r2.converged
    scale = np.abs(r2.u).max()
    np.testing.assert_allclose(r1.u, r2.u, atol=1e-8 * scale)


def test_multi_material_fields():
    m = meshgen.hex_beam(4, 2, 2)
    from stan_tpu.core.model import Material

    m.materials[2] = Material(id=2, name="soft", E=70000.0, poisson=0.33)
    m.elem_mat = m.elem_mat.copy()
    m.elem_mat[::2] = 2  # alternate materials
    op = build_operator(
        m.coords, m.conn, m.elem_d_matrices(), m.fix_mask(), m.formulation()
    )
    sop = structured.build_structured_operator(m)
    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.normal(size=(m.nnode, 3)))
    np.testing.assert_allclose(
        np.asarray(sop.to_flat(sop.apply(sop.to_grid(u)))),
        np.asarray(op.apply(u)),
        rtol=1e-10, atol=1e-10,
    )
