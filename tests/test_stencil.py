"""Assembled-stencil fast path: exact equivalence with the other operators.

The stencil operator (fem/stencil.py) must reproduce the structured
operator's action bit-for-bit to float64 roundoff on every node — interior,
faces, edges, and corners — because its tiered boundary tables claim to be
the *exact* assembled rows.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stan_tpu.core import meshgen
from stan_tpu.fem import stencil, structured
from stan_tpu.fem.operator import build_operator

pytestmark = pytest.mark.slow  # interpret-mode Pallas / large meshes: minutes on CPU



def _ops(nx=4, ny=3, nz=3, **kw):
    m = meshgen.hex_beam(nx, ny, nz, **kw)
    base = structured.build_structured_operator(m)
    sop = stencil.build_stencil_operator(m)
    assert sop is not None
    return m, base, sop


def _rand(shape, dtype, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), shape, dtype=dtype)


def test_interior_table_row_sums():
    """Rigid-body translation maps to zero force: every row of K sums to
    zero over each component, so sum_o A[o] must vanish (interior) and the
    same holds for every boundary signature table."""
    m, base, sop = _ops()
    for sig, table in sop.tables.items():
        total = sum(table.values())
        np.testing.assert_allclose(total, 0.0, atol=1e-8)


def test_apply_raw_matches_structured_everywhere():
    m, base, sop = _ops(4, 4, 3)
    u = _rand((3,) + base.node_shape, base.dtype)
    f_ref = base.apply_raw(u)
    f = sop.apply_raw(u)
    scale = float(jnp.max(jnp.abs(f_ref)))
    np.testing.assert_allclose(np.asarray(f), np.asarray(f_ref),
                               atol=1e-12 * scale)


def test_apply_raw_boundary_rows_exact():
    """Check the face/edge/corner rows specifically (the tiered tables)."""
    m, base, sop = _ops(3, 3, 4)
    u = _rand((3,) + base.node_shape, base.dtype, seed=3)
    f_ref = np.asarray(base.apply_raw(u))
    f = np.asarray(sop.apply_raw(u))
    scale = np.abs(f_ref).max()
    for axis in range(3):
        for plane in (0, -1):
            sl = [slice(None)] * 4
            sl[axis + 1] = plane
            np.testing.assert_allclose(
                f[tuple(sl)], f_ref[tuple(sl)], atol=1e-12 * scale)


def test_masked_apply_matches():
    m, base, sop = _ops()
    u = _rand((3,) + base.node_shape, base.dtype, seed=1)
    f_ref = base.apply(u)
    f = sop.apply(u)
    scale = float(jnp.max(jnp.abs(f_ref)))
    np.testing.assert_allclose(np.asarray(f), np.asarray(f_ref),
                               atol=1e-12 * scale)


def test_matches_general_operator():
    m, base, sop = _ops(3, 3, 3)
    op = build_operator(
        m.coords, m.conn, m.elem_d_matrices(), m.fix_mask(), m.formulation()
    )
    u_flat = _rand((m.nnode, 3), base.dtype, seed=2)
    f_gen = op.apply(u_flat)
    f_st = sop.to_flat(sop.apply(sop.to_grid(u_flat)))
    scale = float(jnp.max(jnp.abs(f_gen)))
    np.testing.assert_allclose(np.asarray(f_st), np.asarray(f_gen),
                               atol=1e-10 * scale)


def test_jit_through_pytree():
    m, base, sop = _ops()
    u = _rand((3,) + base.node_shape, base.dtype, seed=4)
    f0 = sop.apply(u)
    f1 = jax.jit(lambda op, u: op.apply(u))(sop, u)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f0), rtol=1e-12)


def test_rejects_heterogeneous_materials():
    m = meshgen.hex_beam(3, 2, 2)
    from stan_tpu.core.model import Material
    m.materials[2] = Material(id=2, name="soft", E=1000.0, poisson=0.4)
    m.elem_mat = m.elem_mat.copy()
    m.elem_mat[0] = 2
    assert stencil.build_stencil_operator(m) is None
    # ...but the structured path still accepts it.
    assert structured.build_structured_operator(m) is not None


def test_rejects_tiny_grid():
    m = meshgen.hex_beam(1, 1, 1)
    assert stencil.build_stencil_operator(m) is None


def test_g1_formulation_tables():
    """Reduced-integration (G1) element stiffness feeds the same machinery."""
    m = meshgen.hex_beam(3, 3, 3)
    m.set_formulation("HEX8_G1")
    base = structured.build_structured_operator(m)
    sop = stencil.build_stencil_operator(m)
    assert sop is not None
    u = _rand((3,) + base.node_shape, base.dtype, seed=5)
    f_ref = base.apply_raw(u)
    f = sop.apply_raw(u)
    scale = float(jnp.max(jnp.abs(f_ref)))
    np.testing.assert_allclose(np.asarray(f), np.asarray(f_ref),
                               atol=1e-12 * scale)


def test_linear_statics_uses_stencil_and_matches():
    """End-to-end: the linear-statics driver picks the stencil path and its
    solution matches the general-operator solve."""
    from stan_tpu.analysis.linear import solve_linear_statics

    m1 = meshgen.hex_beam(4, 2, 2)
    r1 = solve_linear_statics(m1, store=False)
    m2 = meshgen.hex_beam(4, 2, 2)
    r2 = solve_linear_statics(m2, store=False, use_structured=False)
    assert r1.converged and r2.converged
    np.testing.assert_allclose(r1.u, r2.u, rtol=1e-8, atol=1e-12)
