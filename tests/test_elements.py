"""Unit tests for the element formulation tables (fem/elements.py)."""

import numpy as np
import pytest

from stan_tpu.fem import elements


@pytest.mark.parametrize("name", ["HEX8_G1", "HEX8_G2", "TET4_G1", "TET4_G2"])
def test_registry(name):
    form = elements.get(name)
    assert form.gauss_dN.shape == (form.ngp, 3, form.nnode)
    assert form.gauss_w.shape == (form.ngp,)
    assert form.extrap.shape == (form.nnode, form.ngp)


@pytest.mark.parametrize("name", ["HEX8_G1", "HEX8_G2", "TET4_G1", "TET4_G2"])
def test_dshape_rows_sum_zero(name):
    # Partition of unity: sum_i N_i = 1 => sum_i dN_i/dxi_k = 0.
    form = elements.get(name)
    np.testing.assert_allclose(form.gauss_dN.sum(axis=-1), 0.0, atol=1e-14)


def test_hex8_g2_weights_and_points():
    form = elements.get("HEX8_G2")
    assert form.ngp == 8
    np.testing.assert_allclose(form.gauss_w, 1.0)
    # total quadrature weight = reference-volume 8
    assert form.gauss_w.sum() == 8.0


def test_hex8_g1_weight():
    form = elements.get("HEX8_G1")
    np.testing.assert_allclose(form.gauss_w, [8.0])


def test_hex8_gradient_vs_finite_difference():
    form = elements.get("HEX8_G2")
    g = np.sqrt(1.0 / 3.0)
    signs = np.array(
        [
            [-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
            [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1],
        ],
        dtype=float,
    )

    def N(p):
        return np.prod(1.0 + signs * p[None, :], axis=1) / 8.0

    eps = 1e-6
    for gp in range(8):
        p = signs[gp] * g
        for k in range(3):
            dp = np.zeros(3)
            dp[k] = eps
            fd = (N(p + dp) - N(p - dp)) / (2 * eps)
            np.testing.assert_allclose(form.gauss_dN[gp, k], fd, atol=1e-8)


def test_hex8_g2_extrapolation_consistency():
    # Extrapolation must be the inverse relationship of interpolation for
    # fields linear in (xi, eta, zeta): if f_g = a + b.xi_g then the
    # extrapolated nodal value equals a + b.xi_node.
    form = elements.get("HEX8_G2")
    g = np.sqrt(1.0 / 3.0)
    signs = np.array(
        [
            [-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
            [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1],
        ],
        dtype=float,
    )
    rng = np.random.default_rng(0)
    a = rng.normal()
    b = rng.normal(size=3)
    f_gauss = a + (signs * g) @ b
    f_node = form.extrap @ f_gauss
    np.testing.assert_allclose(f_node, a + signs @ b, atol=1e-12)


def test_extrap_rows_sum_to_one():
    # Constant Gauss fields extrapolate to the same constant.
    for name in ["HEX8_G1", "HEX8_G2", "TET4_G1", "TET4_G2"]:
        form = elements.get(name)
        np.testing.assert_allclose(form.extrap.sum(axis=1), 1.0, atol=1e-12)


def test_penta6_not_available():
    # Reference declares PENTA6 "not implemented" (FE_Library.cs:48-49).
    with pytest.raises(KeyError):
        elements.get("PENTA6_G2")
