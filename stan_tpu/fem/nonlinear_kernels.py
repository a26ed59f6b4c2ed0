"""Total-Lagrangian nonlinear element kernels (matrix-free, batched).

TPU-native counterpart of the reference's nonlinear element machinery
(src/STAN_Database/Element.cs:118-209: K_Initial with BL = BL0 + BL1
initial-displacement term, K_Tangent adding the geometric BNL^T S BNL term;
shape gradients in the *material* frame, i.e. Total-Lagrangian).

As with the linear kernels, B matrices are never materialized. With
F = I + H (H = dN . u_e the displacement gradient in material coords):

  strain variation     (BL du)      = voigt(sym(F^T dH)),   dH = dN . du_e
  internal force       (BL^T s)     -> f[n,j] = dN[k,n] (F S)[j,k] detJ w
  material tangent     BL^T D BL du -> with dS = D : voigt(sym(F^T dH))
  geometric tangent    BNL^T S BNL du -> f[n,j] = dN[k,n] S[k,l] dH[j,l] detJ w

Constitutive model: St. Venant-Kirchhoff — 2nd Piola-Kirchhoff stress
S = D : E_green with the same 6x6 D as the linear path (Material.cs:31-56).
Divergence from the reference (documented): the reference accumulates
*linearized* stress increments dS = D BL dU across Newton iterations
(Element.cs:211-246) which drifts from the St-V-K curve and its debug-state
residual bookkeeping only loads increment 1 (Solver.cs:318-329); here the
residual is computed from the consistent total Green-Lagrange strain, which
is what the reference's incremental scheme approximates.

Voigt order (xx, yy, zz, xy, yz, xz), engineering shear — matching
Element.cs:299-309.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from stan_tpu.fem.kernels import _einsum, voigt_to_tensor


def displacement_gradient(dN: jax.Array, u_e: jax.Array) -> jax.Array:
    """H[E, G, j, k] = du_j/dX_k at Gauss points.

    Note index order: H[j, k] = sum_n dN[k, n] u_e[n, j].
    """
    return _einsum("egkn,enj->egjk", dN, u_e)


def green_lagrange(H: jax.Array) -> jax.Array:
    """Green-Lagrange strain in Voigt form [E, G, 6] from H [E, G, 3, 3].

    E = 1/2 (H + H^T + H^T H); engineering shear (2 * E_ij off-diagonal),
    the quantity (BL0 + 1/2 BL1) u produces in the reference formulation.
    """
    C = H + jnp.swapaxes(H, -1, -2) + _einsum("...kj,...kl->...jl", H, H)
    return 0.5 * jnp.stack(
        [
            C[..., 0, 0],
            C[..., 1, 1],
            C[..., 2, 2],
            C[..., 0, 1] * 2.0,
            C[..., 1, 2] * 2.0,
            C[..., 0, 2] * 2.0,
        ],
        axis=-1,
    )


def strain_variation(dN, u_e, du_e) -> jax.Array:
    """(BL(u) du) in Voigt [E, G, 6]: linearized Green-Lagrange variation.

    delta E = sym(F^T dH) with F = I + H; engineering shear. Equals
    (BL0 + BL1(u)) du of the reference (Element.cs:297-366).
    """
    H = displacement_gradient(dN, u_e)
    dH = displacement_gradient(dN, du_e)
    # M = F^T dH = (I + H)^T dH
    M = dH + _einsum("...kj,...kl->...jl", H, dH)
    return jnp.stack(
        [
            M[..., 0, 0],
            M[..., 1, 1],
            M[..., 2, 2],
            M[..., 0, 1] + M[..., 1, 0],
            M[..., 1, 2] + M[..., 2, 1],
            M[..., 0, 2] + M[..., 2, 0],
        ],
        axis=-1,
    )


def pk2_stress(dN, detJw, D_e, u_e):
    """2nd Piola-Kirchhoff stress at Gauss points [E, G, 6] (St-V-K)."""
    H = displacement_gradient(dN, u_e)
    Eg = green_lagrange(H)
    return _einsum("eij,egj->egi", D_e, Eg)


def internal_force_tl(dN, detJw, D_e, u_e) -> jax.Array:
    """Element internal force f_e[E, nn, 3] at the current total state.

    f[n, j] = sum_g dN[k, n] (F S)[j, k] detJ w  — the TL form of
    Compute_NodalForces (Element.cs:248-255) evaluated with the consistent
    total PK2 stress.
    """
    H = displacement_gradient(dN, u_e)
    S = voigt_to_tensor(pk2_stress(dN, detJw, D_e, u_e))  # [E,G,3,3]
    F = H + jnp.eye(3, dtype=H.dtype)
    FS = _einsum("...jk,...kl->...jl", F, S)
    return _einsum("egkn,egjk,eg->enj", dN, FS, detJw)


def tangent_apply(dN, detJw, D_e, u_e, du_e) -> jax.Array:
    """Matrix-free tangent action f_e = ke_T . du_e at state u_e.

    Material part (BL^T D BL, Element.cs:118-155 with BL = BL0 + BL1) plus
    geometric part (BNL^T S BNL, Element.cs:160-209 with the block-diagonal
    Stress_Matrix of Element.cs:406-430).
    """
    H = displacement_gradient(dN, u_e)
    F = H + jnp.eye(3, dtype=H.dtype)
    dH = displacement_gradient(dN, du_e)

    # Material: dE_voigt = sym(F^T dH); dS = D dE; f += dN^T (F dS_tensor)
    M = dH + _einsum("...kj,...kl->...jl", H, dH)
    dE = jnp.stack(
        [
            M[..., 0, 0], M[..., 1, 1], M[..., 2, 2],
            M[..., 0, 1] + M[..., 1, 0],
            M[..., 1, 2] + M[..., 2, 1],
            M[..., 0, 2] + M[..., 2, 0],
        ],
        axis=-1,
    )
    dS = voigt_to_tensor(_einsum("eij,egj->egi", D_e, dE))
    FdS = _einsum("...jk,...kl->...jl", F, dS)
    f_mat = _einsum("egkn,egjk,eg->enj", dN, FdS, detJw)

    # Geometric: f[n,j] += dN[k,n] S[k,l] dH[j,l] detJ w
    S = voigt_to_tensor(pk2_stress(dN, detJw, D_e, u_e))
    SdH = _einsum("...kl,...jl->...jk", S, dH)
    f_geo = _einsum("egkn,egjk,eg->enj", dN, SdH, detJw)
    return f_mat + f_geo


def recover_tl(dN, detJw, D_e, u_e, form):
    """Green-Lagrange strain + PK2 stress extrapolated to nodes [E, nn, 6].

    Same Gauss->node extrapolation weights as the linear path
    (FE_Library.cs:285-321 via form.extrap)."""
    H = displacement_gradient(dN, u_e)
    Eg = green_lagrange(H)
    Sg = _einsum("eij,egj->egi", D_e, Eg)
    W = jnp.asarray(form.extrap, dtype=u_e.dtype)
    return (
        _einsum("ng,egi->eni", W, Eg),
        _einsum("ng,egi->eni", W, Sg),
    )
