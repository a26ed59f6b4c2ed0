"""Host-side float64 reference operators (numpy).

On TPU the solve runs in float32 (x64 is emulated and slow); certifying the
reference's default tolerance (Analysis.cs:17, tol applied to a *double*
solve in ALGLIB, src/STAN_Solver/SolverFunctions.cs:281-296) requires an
independent float64 action of the same assembled K. This module provides
that action for each operator family, entirely in numpy on host:

  * element_stiffness_np: float64 batched ke, the host twin of
    fem/kernels.element_stiffness (same B-matrix layout, Element.cs:118-155)
    — also the stiffness source for the banded skyline-equivalent direct
    solver (solvers/banded.py),
  * general_apply_np: matvec through per-element ke + np.add.at scatter,
  * structured_apply_np: the StructuredOperator slice-gather/scatter path.

These are correctness/certification paths, not hot paths: one call costs a
few host-seconds at 1M DOF and runs O(1) times per solve (iterative
refinement outer loop, solvers/cg.pcg_refined).
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from stan_tpu.fem.elements import ElementFormulation


def _b_matrix_np(dN: np.ndarray) -> np.ndarray:
    """[..., 3, nn] gradients -> [..., 6, 3*nn] B, column 3*i+j = (node i,
    dir j) exactly as fem/kernels.b_matrix / BL0_Matrix (Element.cs:297-328)."""
    nn = dN.shape[-1]
    batch = dN.shape[:-2]
    B = np.zeros((*batch, 6, 3, nn), dtype=np.float64)
    dx, dy, dz = dN[..., 0, :], dN[..., 1, :], dN[..., 2, :]
    B[..., 0, 0, :] = dx
    B[..., 1, 1, :] = dy
    B[..., 2, 2, :] = dz
    B[..., 3, 0, :] = dy
    B[..., 3, 1, :] = dx
    B[..., 4, 1, :] = dz
    B[..., 4, 2, :] = dy
    B[..., 5, 0, :] = dz
    B[..., 5, 2, :] = dx
    return B.swapaxes(-1, -2).reshape(*batch, 6, 3 * nn)


def element_stiffness_np(
    coords_e: np.ndarray, D_e: np.ndarray, form: ElementFormulation
) -> np.ndarray:
    """float64 ke[E, 3nn, 3nn] = sum_g B^T D B detJ w on host.

    Twin of fem/kernels.element_stiffness (which runs at the device dtype);
    used where a float64 K is required on a TPU session with x64 disabled.
    """
    coords_e = np.asarray(coords_e, np.float64)
    D_e = np.asarray(D_e, np.float64)
    dN_local = np.asarray(form.gauss_dN, np.float64)  # [G, 3, nn]
    w = np.asarray(form.gauss_w, np.float64)  # [G]
    J = np.einsum("gkn,enj->egkj", dN_local, coords_e)
    detJ = np.linalg.det(J)
    Jinv = np.linalg.inv(J)
    dN = np.einsum("egkl,gln->egkn", Jinv, dN_local)
    B = _b_matrix_np(dN)  # [E, G, 6, 3nn]
    detJw = detJ * w[None, :]
    return np.einsum("egia,eij,egjb,eg->eab", B, D_e, B, detJw)


def d_np(lam: float, mu: float) -> np.ndarray:
    """float64 6x6 isotropic D from Lame constants (Material.cs:31-56),
    numpy twin of infer/forward.d_matrix_from_lame (which follows the jnp
    default dtype and is float32 on a TPU session)."""
    D = np.full((3, 3), lam, dtype=np.float64)
    D += 2.0 * mu * np.eye(3)
    out = np.zeros((6, 6), dtype=np.float64)
    out[:3, :3] = D
    out[3:, 3:] = mu * np.eye(3)
    return out


def general_apply_np(
    coords: np.ndarray,
    conn: np.ndarray,
    D_e: np.ndarray,
    form: ElementFormulation,
    fix_mask: np.ndarray,
) -> Callable[[np.ndarray], np.ndarray]:
    """Masked float64 K·u for an arbitrary mesh: u[nnode,3] -> f[nnode,3].

    Same masked-SPD convention as the device operators:
    f = M K (M u) + (I - M) u. Materializes ke[E, 3nn, 3nn] float64 once
    (~4.6 KB/element for HEX8) -- callers should bound nelem.
    """
    conn = np.asarray(conn)
    coords = np.asarray(coords, np.float64)
    ke = element_stiffness_np(coords[conn], D_e, form)  # [E, 3nn, 3nn]
    free = 1.0 - np.asarray(fix_mask, np.float64)
    E, nn = conn.shape

    def apply(u: np.ndarray) -> np.ndarray:
        u = np.asarray(u, np.float64)
        um = free * u
        u_e = um[conn].reshape(E, 3 * nn)
        f_e = np.einsum("eab,eb->ea", ke, u_e).reshape(E, nn, 3)
        f = np.zeros_like(um)
        np.add.at(f, conn, f_e)
        return free * f + (1.0 - free) * u

    return apply


def stencil_apply_np(model, sop) -> Callable[[np.ndarray], np.ndarray]:
    """Masked float64 K·u for a StencilOperator (grid layout [3,nnx,nny,nnz])
    via the exact float64 signature tables (fem/stencil.exact_tables +
    apply_numpy)."""
    from stan_tpu.fem import stencil as stencil_mod

    td = stencil_mod.exact_tables(model)
    if td is None:
        raise ValueError("model does not qualify for the stencil operator")
    tables, deltas = td
    free = np.asarray(sop.free_mask, np.float64)

    def apply(u: np.ndarray) -> np.ndarray:
        u = np.asarray(u, np.float64)
        um = free * u
        return (free * stencil_mod.apply_numpy(tables, deltas, um)
                + (1.0 - free) * u)

    return apply


def masked_f64_apply(model, op) -> Callable[[np.ndarray], np.ndarray]:
    """Float64 host twin of a device operator's masked apply, dispatched on
    the operator family. Input/output layout follows the operator: grid
    [3,nnx,nny,nnz] for stencil/structured, flat [nnode,3] for the general
    operator."""
    from stan_tpu.fem.operator import StiffnessOperator
    from stan_tpu.fem.stencil import StencilOperator
    from stan_tpu.fem.structured import StructuredOperator

    if isinstance(op, StencilOperator):
        return stencil_apply_np(model, op)
    if isinstance(op, StructuredOperator):
        return structured_apply_np(model, op)
    if isinstance(op, StiffnessOperator):
        return general_apply_np(
            model.coords, model.conn,
            np.asarray(model.elem_d_matrices(), np.float64),
            model.formulation(), model.fix_mask())
    raise TypeError(f"unknown operator family {type(op).__name__}")


def structured_apply_np(model, sop) -> Callable[[np.ndarray], np.ndarray]:
    """Masked float64 K·u for a StructuredOperator, grid layout
    [3, nnx, nny, nnz]: the slice gather/scatter of
    fem/structured.StructuredOperator.apply, executed in numpy float64 with
    the unit-coefficient stiffness tables recomputed in float64 from the
    model's grid spacing (sop.ke_lam may be float32 on TPU)."""
    from stan_tpu.fem import structured as structured_mod

    nx, ny, nz = sop.nelems
    corners = structured_mod._CORNERS
    lam_e = np.asarray(sop.lam_e, np.float64)
    mu_e = np.asarray(sop.mu_e, np.float64)
    free = np.asarray(sop.free_mask, np.float64)
    info = structured_mod.detect_structured(model)
    if info is None:
        raise ValueError("model is not a structured grid")
    hx, hy, hz = info["spacing"]
    corner_xyz = np.asarray(
        [[dx * hx, dy * hy, dz * hz] for dx, dy, dz in corners], np.float64
    )[None]
    ke_lam = element_stiffness_np(corner_xyz, d_np(1.0, 0.0)[None], sop.form)[0]
    ke_mu = element_stiffness_np(corner_xyz, d_np(0.0, 1.0)[None], sop.form)[0]

    def apply(u: np.ndarray) -> np.ndarray:
        u = np.asarray(u, np.float64)
        um = free * u
        parts = [
            um[:, ox: ox + nx, oy: oy + ny, oz: oz + nz]
            for ox, oy, oz in corners
        ]
        u_e = np.concatenate(parts, axis=0).reshape(24, -1)
        f2 = (ke_lam @ u_e).reshape(24, nx, ny, nz) * lam_e[None]
        f2 = f2 + (ke_mu @ u_e).reshape(24, nx, ny, nz) * mu_e[None]
        total = np.zeros_like(um)
        for a, (ox, oy, oz) in enumerate(corners):
            slab = f2[3 * a: 3 * a + 3]
            pad = [(0, 0)] + [(o, 1 - o) for o in (ox, oy, oz)]
            total += np.pad(slab, pad)
        return free * total + (1.0 - free) * u

    return apply
