"""End-to-end linear statics tests: CG vs direct vs scipy vs analytic."""

import jax.numpy as jnp
import numpy as np
import scipy.sparse
import scipy.sparse.linalg

from stan_tpu.core import meshgen
from stan_tpu.analysis.linear import solve_linear_statics
from stan_tpu.fem import assembly


def _scipy_reference_solution(model):
    """Independent solve: assemble dense K via our assembly (validated
    against hand quadrature in test_kernels), reduce rows/cols exactly like
    the reference (Solver.cs:120-132), solve with scipy."""
    form = model.formulation()
    fix = model.fix_mask()
    K = np.asarray(
        assembly.assemble_dense(
            model.coords, model.conn, model.elem_d_matrices(), form
        )
    )
    f = model.load_vector().reshape(-1)
    free = ~fix.reshape(-1)
    K_red = K[np.ix_(free, free)]
    u_red = scipy.sparse.linalg.spsolve(scipy.sparse.csr_matrix(K_red), f[free])
    u = np.zeros(model.ndof)
    u[free] = u_red
    return u.reshape(model.nnode, 3)


def test_cg_matches_reduced_system_reference():
    """Masked-BC CG solution == reference-style row/col-removed direct solve."""
    model = meshgen.hex_beam(4, 2, 2)
    model.analysis.lin_solver = "CG"
    model.analysis.lin_solver_tolerance = 1e-12
    res = solve_linear_statics(model)
    assert res.converged
    u_ref = _scipy_reference_solution(model)
    np.testing.assert_allclose(res.u, u_ref, rtol=1e-8, atol=1e-12)


def test_cholesky_matches_cg():
    """Both solver paths exist in the reference (Solver.cs:162-163); they
    must agree to solver tolerance."""
    model = meshgen.hex_beam(3, 2, 2)
    model.analysis.lin_solver = "CG"
    model.analysis.lin_solver_tolerance = 1e-12
    u_cg = solve_linear_statics(model, store=False).u
    model.analysis.lin_solver = "Cholesky"
    u_chol = solve_linear_statics(model, store=False).u
    np.testing.assert_allclose(u_cg, u_chol, rtol=1e-7, atol=1e-12)


def test_uniaxial_bar_analytic():
    """Unit-section bar, nu=0: u_x(x) = F x / (E A), sigma_xx = F/A."""
    E, F, n = 1000.0, 100.0, 4
    model = meshgen.uniaxial_bar(n=n, E=E, poisson=0.0, force=F)
    model.analysis.lin_solver_tolerance = 1e-12
    res = solve_linear_statics(model)
    assert res.converged
    x = model.coords[:, 0]
    np.testing.assert_allclose(res.u[:, 0], F * x / E, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(res.u[:, 1:], 0.0, atol=1e-8)
    # Node-extrapolated stress must be the exact constant F/A everywhere
    np.testing.assert_allclose(res.stress[:, :, 0], F, rtol=1e-8)
    np.testing.assert_allclose(res.stress[:, :, 1:], 0.0, atol=1e-6)
    # Strain: eps_xx = F / E
    np.testing.assert_allclose(res.strain[:, :, 0], F / E, rtol=1e-8)


def test_beam_vs_euler_bernoulli():
    """Slender-beam tip deflection in the right ballpark vs Euler-Bernoulli
    (clamped-end 3D model is stiffer; order-of-magnitude sanity anchor)."""
    model = meshgen.hex_beam(12, 2, 2, elem_type="HEX8_G2")
    model.analysis.lin_solver_tolerance = 1e-10
    res = solve_linear_statics(model, store=False)
    tip = model.coords[:, 0] == model.coords[:, 0].max()
    w = res.u[tip, 2].mean()
    E, I, L, F = 210000.0, 2.0 * 2.0**3 / 12.0, 12.0, -10.0
    w_eb = F * L**3 / (3 * E * I)
    assert 0.5 * abs(w_eb) < abs(w) < 1.5 * abs(w_eb)


def test_g1_vs_g2_uniaxial_patch():
    """Reduced (G1) vs full (G2) integration agree exactly on a state of
    uniform strain, where the single-point rule is exact and no hourglass
    mode is excited. (A bending-dominated G1 mesh without hourglass
    stabilization is singular -- the reference carries the same limitation,
    FE_Library.cs:25-26 warns of 'hourglassing for reduced integration'.)"""
    E, F, n = 1000.0, 100.0, 4
    us = {}
    for ftype in ("HEX8_G2", "HEX8_G1"):
        model = meshgen.uniaxial_bar(n=n, E=E, poisson=0.0, force=F,
                                     elem_type=ftype)
        model.analysis.lin_solver_tolerance = 1e-12
        us[ftype] = solve_linear_statics(model, store=False).u
    np.testing.assert_allclose(us["HEX8_G1"], us["HEX8_G2"], atol=1e-8)


def test_reactions_balance_loads():
    """Internal force at free DOFs equals applied load; total reaction at
    fixed DOFs balances the applied resultant (equilibrium)."""
    model = meshgen.hex_beam(3, 2, 2, load=(5.0, -2.0, -10.0))
    model.analysis.lin_solver_tolerance = 1e-12
    res = solve_linear_statics(model)
    f = model.load_vector()
    fix = model.fix_mask()
    np.testing.assert_allclose(
        res.reactions[~fix], f[~fix], atol=1e-6 * np.abs(f).max()
    )
    # Internal forces of the equilibrated body sum to zero, so the support
    # reactions (fixed DOFs) balance the applied resultant exactly.
    np.testing.assert_allclose(res.reactions.sum(axis=0), 0.0, atol=1e-9)
    reaction_at_supports = res.reactions.reshape(-1)[fix.reshape(-1)].reshape(-1, 3)
    np.testing.assert_allclose(
        reaction_at_supports.sum(axis=0), -f.sum(axis=0), atol=1e-7
    )


def test_determinism_same_bits():
    """Assembly-free scatter is deterministic: two runs give identical bits
    (the reference's lock-based scatter is order-dependent; SURVEY.md 5.2)."""
    model = meshgen.hex_beam(3, 3, 3)
    u1 = solve_linear_statics(model, store=False).u
    u2 = solve_linear_statics(model, store=False).u
    assert np.array_equal(u1, u2)
