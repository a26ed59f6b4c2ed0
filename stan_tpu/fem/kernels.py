"""Batched element kernels: geometry, stiffness, matrix-free action, recovery.

TPU-native re-design of the per-element math in the reference
(src/STAN_Database/Element.cs:118-255). The reference loops over elements on
threads and over Gauss points in scalar C#; here every quantity is one batched
tensor contraction over all elements at once, which XLA maps onto the MXU/VPU.

Key design choice: the 6x(3*nn) B-matrix is never materialized on the hot
path. All products with B are expressed directly in terms of the shape
function gradients dN[g, 3, nn] and the 3x3 displacement-gradient / stress
tensors, which turns the SpMV into small batched GEMMs:

    H      = u_e . dN^T                (displacement gradient, 3x3)
    eps    = sym(H)                    (small strain, engineering shear)
    sigma  = D : eps                   (constitutive)
    f_e    = dN^T . T(sigma) * detJ*w  (B^T sigma without B)

where T(sigma) is the full symmetric 3x3 stress tensor. This is numerically
identical to the reference's explicit B assembly (verified in tests against a
direct B-matrix construction).

Voigt/strain ordering everywhere: (xx, yy, zz, xy, yz, xz), engineering shear
(gamma), matching Element.cs:299-309 (BL0) and Material.cs:42-53 (D).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from functools import partial

from stan_tpu.fem.elements import ElementFormulation

# All FEM contractions pin HIGHEST matmul precision: TPUs otherwise run f32
# einsums with bf16 multiplications, which stalls Newton/CG convergence
# (residuals plateau near 1e-2 relative). The contraction dims here are tiny
# (3/6/8), so the 3-pass cost is negligible against gather/scatter traffic.
_einsum = partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)

# Index pairs mapping Voigt component -> tensor entry, order (xx,yy,zz,xy,yz,xz)
_VOIGT_I = (0, 1, 2, 0, 1, 0)
_VOIGT_J = (0, 1, 2, 1, 2, 2)


def det3(J: jax.Array) -> jax.Array:
    """Closed-form determinant of batched 3x3 matrices [..., 3, 3].

    Hand-unrolled like the reference's MatrixST.Det3 (MatrixST.cs:270-283);
    also required on TPU where the generic LU-based jnp.linalg.det has no
    f64 lowering.
    """
    a, b, c = J[..., 0, 0], J[..., 0, 1], J[..., 0, 2]
    d, e, f = J[..., 1, 0], J[..., 1, 1], J[..., 1, 2]
    g, h, i = J[..., 2, 0], J[..., 2, 1], J[..., 2, 2]
    return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)


def inv3(J: jax.Array) -> jax.Array:
    """Closed-form inverse of batched 3x3 matrices (adjugate / det),
    mirroring MatrixST.Inverse (MatrixST.cs:285-319)."""
    a, b, c = J[..., 0, 0], J[..., 0, 1], J[..., 0, 2]
    d, e, f = J[..., 1, 0], J[..., 1, 1], J[..., 1, 2]
    g, h, i = J[..., 2, 0], J[..., 2, 1], J[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    inv_det = 1.0 / det
    row0 = jnp.stack([A, -(b * i - c * h), b * f - c * e], axis=-1)
    row1 = jnp.stack([B, a * i - c * g, -(a * f - c * d)], axis=-1)
    row2 = jnp.stack([C, -(a * h - b * g), a * e - b * d], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2) * inv_det[..., None, None]


def element_geometry(coords_e: jax.Array, form: ElementFormulation):
    """Per-element, per-Gauss-point geometry factors.

    Args:
      coords_e: [E, nn, 3] nodal coordinates gathered per element.
      form: element formulation (constant tables).

    Returns:
      dN:    [E, G, 3, nn] shape-function gradients in global coords
             (J^-1 . dN_dlocal, Element.cs:127-130).
      detJw: [E, G] det(J) * gauss weight (Element.cs:151).
    """
    dtype = coords_e.dtype
    dN_local = jnp.asarray(form.gauss_dN, dtype=dtype)  # [G, 3, nn]
    w = jnp.asarray(form.gauss_w, dtype=dtype)  # [G]
    # J[e,g] = dN_local[g] @ coords_e[e]  -> [E, G, 3, 3] (Element.cs:274-292)
    J = _einsum("gkn,enj->egkj", dN_local, coords_e)
    detJ = det3(J)
    Jinv = inv3(J)
    dN = _einsum("egkl,gln->egkn", Jinv, dN_local)
    return dN, detJ * w[None, :]


def b_matrix(dN: jax.Array) -> jax.Array:
    """Explicit B-matrix [..., 6, 3*nn] from gradients dN[..., 3, nn].

    Used for element stiffness and in tests; the SpMV hot path avoids it.
    Layout matches BL0_Matrix (Element.cs:297-328).
    """
    nn = dN.shape[-1]
    batch = dN.shape[:-2]
    B = jnp.zeros((*batch, 6, 3, nn), dtype=dN.dtype)
    dx, dy, dz = dN[..., 0, :], dN[..., 1, :], dN[..., 2, :]
    B = B.at[..., 0, 0, :].set(dx)
    B = B.at[..., 1, 1, :].set(dy)
    B = B.at[..., 2, 2, :].set(dz)
    B = B.at[..., 3, 0, :].set(dy)
    B = B.at[..., 3, 1, :].set(dx)
    B = B.at[..., 4, 1, :].set(dz)
    B = B.at[..., 4, 2, :].set(dy)
    B = B.at[..., 5, 0, :].set(dz)
    B = B.at[..., 5, 2, :].set(dx)
    # [..., 6, 3, nn] -> [..., 6, nn, 3] -> [..., 6, 3*nn] so that column
    # 3*i + j corresponds to node i, direction j as in the reference.
    return B.swapaxes(-1, -2).reshape(*batch, 6, 3 * nn)


def element_stiffness(coords_e: jax.Array, D_e: jax.Array, form: ElementFormulation):
    """Batched element stiffness ke[E, 3nn, 3nn] = sum_g B^T D B detJ w.

    The linear ("Initial", zero initial displacement) stiffness of
    Element.K_Initial (Element.cs:118-155). With nonzero displacement the
    BL1 term is added by `element_stiffness_tl` in analysis/nonlinear.py.
    """
    dN, detJw = element_geometry(coords_e, form)
    B = b_matrix(dN)  # [E, G, 6, 3nn]
    return _einsum("egia,eij,egjb,eg->eab", B, D_e, B, detJw)


def element_stiffness_diag(coords_e, D_e, form: ElementFormulation):
    """diag(ke)[E, 3nn] without materializing ke (for Jacobi preconditioning)."""
    dN, detJw = element_geometry(coords_e, form)
    B = b_matrix(dN)
    return _einsum("egia,eij,egja,eg->ea", B, D_e, B, detJw)


def strain_at_gauss(dN: jax.Array, u_e: jax.Array) -> jax.Array:
    """Small-strain Voigt vector at Gauss points: eps[E, G, 6] = B . u_e.

    Computed from the displacement gradient H = dN . u_e (no B), with
    engineering shear (gamma_ij = H_ij + H_ji).
    """
    # H[e,g,k,j] = sum_n dN[e,g,k,n] u_e[e,n,j]  (k = d/dx_k, j = component)
    H = _einsum("egkn,enj->egkj", dN, u_e)
    return jnp.stack(
        [
            H[..., 0, 0],
            H[..., 1, 1],
            H[..., 2, 2],
            H[..., 0, 1] + H[..., 1, 0],
            H[..., 1, 2] + H[..., 2, 1],
            H[..., 0, 2] + H[..., 2, 0],
        ],
        axis=-1,
    )


def voigt_to_tensor(s: jax.Array) -> jax.Array:
    """[..., 6] Voigt (xx,yy,zz,xy,yz,xz) -> [..., 3, 3] symmetric tensor."""
    rows = [
        jnp.stack([s[..., 0], s[..., 3], s[..., 5]], axis=-1),
        jnp.stack([s[..., 3], s[..., 1], s[..., 4]], axis=-1),
        jnp.stack([s[..., 5], s[..., 4], s[..., 2]], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def internal_force(dN, detJw, D_e, u_e) -> jax.Array:
    """Element internal force f_e[E, nn, 3] = B^T (D B u_e) detJ w.

    This is the fused ke.u_e product used by the matrix-free operator, and
    equals Compute_NodalForces for the linear path (Element.cs:248-255) --
    with the stresses taken at the Gauss points. (The reference contracts
    B^T with *node-extrapolated* stresses dS[g], Element.cs:253, which only
    type-checks because nnode == ngp for HEX8_G2; the mathematically
    consistent Gauss-point form is used here.)
    """
    eps = strain_at_gauss(dN, u_e)  # [E, G, 6]
    sig = _einsum("eij,egj->egi", D_e, eps)  # [E, G, 6]
    T = voigt_to_tensor(sig)  # [E, G, 3, 3]
    # f[e,n,j] = sum_g detJw * sum_k dN[e,g,k,n] * T[e,g,j,k]
    return _einsum("egkn,egjk,eg->enj", dN, T, detJw)


def recover_stress_strain(dN, detJw, D_e, u_e, form: ElementFormulation):
    """Strain/stress recovery with Gauss->node extrapolation.

    Mirrors Element.Recovery_Stress (Element.cs:211-246): strain at Gauss
    points from B.u_e, stress via D, then extrapolation to nodes with the
    formulation's `extrap` weights (N[i][g] in the reference).

    Returns (strain_n, stress_n): each [E, nn, 6].
    """
    eps_g = strain_at_gauss(dN, u_e)  # [E, G, 6]
    sig_g = _einsum("eij,egj->egi", D_e, eps_g)
    W = jnp.asarray(form.extrap, dtype=u_e.dtype)  # [nn, G]
    eps_n = _einsum("ng,egi->eni", W, eps_g)
    sig_n = _einsum("ng,egi->eni", W, sig_g)
    return eps_n, sig_n
