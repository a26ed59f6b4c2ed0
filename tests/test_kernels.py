"""Tests for the batched element kernels and the matrix-free operator."""

import jax.numpy as jnp
import numpy as np
import pytest

from stan_tpu.core import meshgen
from stan_tpu.fem import assembly, elements, kernels
from stan_tpu.fem.operator import build_operator


def _unit_cube_coords():
    signs = np.array(
        [
            [-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
            [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1],
        ],
        dtype=float,
    )
    return (signs + 1.0) / 2.0  # unit cube [0,1]^3


def _d_matrix(E=1000.0, nu=0.3):
    lam = E * nu / ((1 - 2 * nu) * (1 + nu))
    G = 0.5 * E / (1 + nu)
    D = np.zeros((6, 6))
    D[:3, :3] = lam
    np.fill_diagonal(D[:3, :3], lam + 2 * G)
    D[3, 3] = D[4, 4] = D[5, 5] = G
    return D


@pytest.mark.parametrize("ftype", ["HEX8_G1", "HEX8_G2"])
def test_ke_symmetric_and_rigid_body_null(ftype):
    form = elements.get(ftype)
    coords = jnp.asarray(_unit_cube_coords())[None]
    D = jnp.asarray(_d_matrix())[None]
    ke = np.asarray(kernels.element_stiffness(coords, D, form))[0]
    np.testing.assert_allclose(ke, ke.T, atol=1e-9)
    # Rigid translations: u = const per direction -> ke.u = 0
    for j in range(3):
        u = np.zeros((8, 3))
        u[:, j] = 1.0
        np.testing.assert_allclose(ke @ u.reshape(-1), 0.0, atol=1e-9)
    # Rigid rotation about z: u = omega x r
    r = _unit_cube_coords() - 0.5
    u = np.stack([-r[:, 1], r[:, 0], np.zeros(8)], axis=1)
    np.testing.assert_allclose(ke @ u.reshape(-1), 0.0, atol=1e-8)


def test_ke_vs_explicit_b_quadrature():
    """Cross-check batched einsum against a straightforward per-GP loop."""
    rng = np.random.default_rng(42)
    # Distorted hex (keep it valid/convex-ish)
    coords = _unit_cube_coords() + rng.normal(scale=0.05, size=(8, 3))
    form = elements.get("HEX8_G2")
    D = _d_matrix(E=200.0, nu=0.25)

    ke_ref = np.zeros((24, 24))
    for g in range(form.ngp):
        dN_local = form.gauss_dN[g]
        J = dN_local @ coords
        dN = np.linalg.inv(J) @ dN_local
        B = np.zeros((6, 24))
        for i in range(8):
            dx, dy, dz = dN[0, i], dN[1, i], dN[2, i]
            B[0, 3 * i] = dx
            B[1, 3 * i + 1] = dy
            B[2, 3 * i + 2] = dz
            B[3, 3 * i] = dy
            B[3, 3 * i + 1] = dx
            B[4, 3 * i + 1] = dz
            B[4, 3 * i + 2] = dy
            B[5, 3 * i] = dz
            B[5, 3 * i + 2] = dx
        ke_ref += B.T @ D @ B * np.linalg.det(J) * form.gauss_w[g]

    ke = np.asarray(
        kernels.element_stiffness(
            jnp.asarray(coords)[None], jnp.asarray(D)[None], form
        )
    )[0]
    np.testing.assert_allclose(ke, ke_ref, rtol=1e-10, atol=1e-10)


def test_matrix_free_apply_matches_dense():
    model = meshgen.hex_beam(3, 2, 2)
    form = model.formulation()
    fix = model.fix_mask()
    D_e = model.elem_d_matrices()
    op = build_operator(model.coords, model.conn, D_e, fix, form)
    K = np.asarray(
        assembly.assemble_dense(model.coords, model.conn, D_e, form, fix_mask=fix)
    )
    rng = np.random.default_rng(1)
    u = rng.normal(size=(model.nnode, 3))
    out_mf = np.asarray(op.apply(jnp.asarray(u)))
    out_dense = (K @ u.reshape(-1)).reshape(model.nnode, 3)
    np.testing.assert_allclose(out_mf, out_dense, rtol=1e-9, atol=1e-9)


def test_operator_diagonal_matches_dense():
    model = meshgen.hex_beam(2, 2, 2)
    form = model.formulation()
    fix = model.fix_mask()
    D_e = model.elem_d_matrices()
    op = build_operator(model.coords, model.conn, D_e, fix, form)
    K = np.asarray(
        assembly.assemble_dense(model.coords, model.conn, D_e, form, fix_mask=fix)
    )
    np.testing.assert_allclose(
        np.asarray(op.diagonal()).reshape(-1), np.diag(K), rtol=1e-9, atol=1e-9
    )


def test_bcoo_matches_dense():
    model = meshgen.hex_beam(2, 2, 1)
    form = model.formulation()
    fix = model.fix_mask()
    D_e = model.elem_d_matrices()
    K = np.asarray(
        assembly.assemble_dense(model.coords, model.conn, D_e, form, fix_mask=fix)
    )
    Kb = assembly.assemble_bcoo(
        model.coords, model.conn, D_e, form, fix_mask=fix
    )
    np.testing.assert_allclose(np.asarray(Kb.todense()), K, rtol=1e-9, atol=1e-9)


def test_recovery_uniform_strain_patch():
    """Patch test: impose a linear displacement field on a distorted mesh;
    recovered strain must equal the exact constant strain at every node."""
    model = meshgen.hex_beam(2, 2, 2)
    rng = np.random.default_rng(3)
    interior = np.all(
        (model.coords > 0.01) & (model.coords < np.max(model.coords, 0) - 0.01),
        axis=1,
    )
    model.coords[interior] += rng.normal(scale=0.08, size=(interior.sum(), 3))
    form = model.formulation()
    op = build_operator(
        model.coords, model.conn, model.elem_d_matrices(), model.fix_mask(), form
    )
    # u = A x with symmetric-part strain eps
    A = np.array([[1e-3, 2e-4, 0.0], [0.0, -5e-4, 1e-4], [3e-4, 0.0, 2e-3]])
    u = model.coords @ A.T
    eps_exact = np.array(
        [
            A[0, 0], A[1, 1], A[2, 2],
            A[0, 1] + A[1, 0], A[1, 2] + A[2, 1], A[0, 2] + A[2, 0],
        ]
    )
    u_e = op.gather(jnp.asarray(u))
    eps, sig = kernels.recover_stress_strain(op.dN, op.detJw, op.D, u_e, form)
    np.testing.assert_allclose(
        np.asarray(eps), np.broadcast_to(eps_exact, eps.shape), atol=1e-10
    )
    D = _d_matrix(E=210000.0, nu=0.3)
    sig_exact = D @ eps_exact
    np.testing.assert_allclose(
        np.asarray(sig), np.broadcast_to(sig_exact, sig.shape), atol=1e-6
    )
