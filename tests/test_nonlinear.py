"""Total-Lagrangian nonlinear statics tests."""

import numpy as np
import pytest

from stan_tpu.core import meshgen
from stan_tpu.fem import kernels, nonlinear_kernels as nlk
from stan_tpu.fem.operator import build_operator


def _operator(m):
    return build_operator(
        m.coords, m.conn, m.elem_d_matrices(), m.fix_mask(), m.formulation()
    )


def test_tangent_at_zero_equals_linear():
    """K_T(u=0) == K_linear: BL1 and geometric terms vanish at zero state
    (reference: K_Tangent reduces to K_Initial with zero displacement,
    Element.cs:160-209)."""
    import jax.numpy as jnp

    m = meshgen.hex_beam(2, 2, 2)
    op = _operator(m)
    rng = np.random.default_rng(0)
    du = jnp.asarray(rng.normal(size=(m.nnode, 3)))
    u0 = jnp.zeros_like(du)

    lin = kernels.internal_force(op.dN, op.detJw, op.D, op.gather(du))
    tan = nlk.tangent_apply(op.dN, op.detJw, op.D, op.gather(u0), op.gather(du))
    np.testing.assert_allclose(np.asarray(tan), np.asarray(lin), atol=1e-10)


def test_green_lagrange_small_strain_limit():
    import jax.numpy as jnp

    m = meshgen.hex_beam(2, 1, 1)
    op = _operator(m)
    rng = np.random.default_rng(1)
    u = jnp.asarray(1e-7 * rng.normal(size=(m.nnode, 3)))
    u_e = op.gather(u)
    eg = np.asarray(nlk.green_lagrange(nlk.displacement_gradient(op.dN, u_e)))
    lin = np.asarray(kernels.strain_at_gauss(op.dN, u_e))
    # The quadratic Green-Lagrange term is O(|u|^2 |dN|^2) ~ 1e-13 here.
    np.testing.assert_allclose(eg, lin, atol=1e-12)


def test_tangent_is_derivative_of_internal_force():
    """Finite-difference check: K_T(u) du ~ (R(u + h du) - R(u - h du)) / 2h."""
    import jax.numpy as jnp

    m = meshgen.hex_beam(2, 1, 1)
    op = _operator(m)
    rng = np.random.default_rng(2)
    u = jnp.asarray(0.05 * rng.normal(size=(m.nnode, 3)))
    du = jnp.asarray(rng.normal(size=(m.nnode, 3)))
    h = 1e-6

    def R(uu):
        return np.asarray(
            nlk.internal_force_tl(op.dN, op.detJw, op.D, op.gather(uu))
        )

    fd = (R(u + h * du) - R(u - h * du)) / (2 * h)
    tan = np.asarray(
        nlk.tangent_apply(op.dN, op.detJw, op.D, op.gather(u), op.gather(du))
    )
    np.testing.assert_allclose(tan, fd, rtol=1e-5, atol=1e-4)


def test_nonlinear_matches_linear_for_tiny_load():
    from stan_tpu.analysis.linear import solve_linear_statics
    from stan_tpu.analysis.nonlinear import solve_nonlinear_statics

    m1 = meshgen.hex_beam(3, 2, 2, load=(0.0, 0.0, -1e-3))
    lin = solve_linear_statics(m1, store=False)

    m2 = meshgen.hex_beam(3, 2, 2, load=(0.0, 0.0, -1e-3))
    m2.analysis.type = "Nonlinear_Statics"
    m2.analysis.inc_numb = 1
    nl = solve_nonlinear_statics(m2, store=False, newton_tol=1e-8)
    assert nl.converged
    scale = np.abs(lin.u).max()
    np.testing.assert_allclose(nl.u, lin.u, atol=1e-6 * scale)


def test_uniaxial_stvk_analytic():
    """ν=0 bar under uniaxial nominal load: λ solves E λ (λ²-1)/2 = P/A.

    End-to-end check of the TL formulation against the closed-form
    St. Venant-Kirchhoff solution."""
    from stan_tpu.analysis.nonlinear import solve_nonlinear_statics

    E_mod, force = 1000.0, 80.0  # finite strain: P/(EA) = 0.08
    m = meshgen.uniaxial_bar(2, E=E_mod, force=force)
    m.analysis.type = "Nonlinear_Statics"
    m.analysis.inc_numb = 4
    res = solve_nonlinear_statics(m, store=True, newton_tol=1e-10)
    assert res.converged

    # Solve E*lam*(lam^2-1)/2 = P  (A = 1) for the stretch lam
    lam = np.roots([E_mod / 2, 0.0, -E_mod / 2, -force])
    lam = float(np.real([r for r in lam if np.isreal(r) and r > 0][0]))
    L = 2.0  # bar length (2 unit elements)
    tip = res.u[:, 0].max()
    assert tip == pytest.approx((lam - 1.0) * L, rel=1e-4)

    # PK2 stress field: S11 = E*(lam^2-1)/2 everywhere
    S11 = E_mod * (lam**2 - 1) / 2
    np.testing.assert_allclose(res.stress[-1][:, :, 0], S11, rtol=1e-4)
    # Nonlinearity is material: tip disp != linear prediction
    lin_tip = force * L / E_mod
    assert abs(tip - lin_tip) > 0.01 * lin_tip


def test_incremental_history_stored():
    from stan_tpu.analysis.nonlinear import solve_nonlinear_statics

    m = meshgen.hex_beam(2, 2, 2, load=(0.0, 0.0, -50.0))
    m.analysis.type = "Nonlinear_Statics"
    m.analysis.inc_numb = 3
    res = solve_nonlinear_statics(m)
    assert res.disp.shape[0] == 4  # step 0 + 3 increments
    assert m.analysis.result_step_no == 3
    # Monotone load ramp -> monotone tip deflection magnitude
    tips = [np.abs(res.disp[i, :, 2]).max() for i in range(4)]
    assert tips[0] == 0.0
    assert tips[1] < tips[2] < tips[3]
