"""Differentiable FEM forward model for probabilistic inference.

The inference layer (BASELINE.json north star) treats the linear-statics
solve as the forward model: parameters theta = (material constants, load
scale) -> displacement field u(theta). Gradients flow through the linear
solve *implicitly* via jax.lax.custom_linear_solve — an adjoint solve with
the same SPD operator — rather than unrolled CG (SURVEY.md §7.3
"Differentiating through the solve").

Design: the stiffness action is a function of per-element (lam, mu) Lame
fields, so material parameters enter through a [E]-shaped map; load
parameters scale the RHS. Everything stays matrix-free and jit/vmap/grad
composable — vmap over theta batches gives the chain/particle axis.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from stan_tpu.core.model import FEModel
from stan_tpu.fem import kernels
from stan_tpu.fem.kernels import _einsum
from stan_tpu.fem.operator import StiffnessOperator, build_operator, default_dtype
from stan_tpu.solvers import cg as cg_mod


def lame_from_E_nu(E, nu):
    """Lame (lam, mu) from Young's modulus / Poisson ratio
    (Material.SetElastic, Material.cs:31-56)."""
    lam = E * nu / ((1.0 - 2.0 * nu) * (1.0 + nu))
    mu = 0.5 * E / (1.0 + nu)
    return lam, mu


def d_matrix_from_lame(lam, mu):
    """Batched 6x6 isotropic D from scalar/[...]-shaped (lam, mu)."""
    lam, mu = jnp.broadcast_arrays(jnp.asarray(lam), jnp.asarray(mu))
    D = jnp.zeros(lam.shape + (6, 6), dtype=lam.dtype)
    D = D.at[..., :3, :3].add(lam[..., None, None])
    i3 = jnp.arange(3)
    D = D.at[..., i3, i3].add(2.0 * mu[..., None])
    i6 = jnp.arange(3, 6)
    D = D.at[..., i6, i6].add(mu[..., None])
    return D


@dataclasses.dataclass(frozen=True)
class ForwardProblem:
    """Precomputed mesh data for theta -> u solves.

    geometry (conn/dN/detJw/masks) is fixed; D_e varies with theta.
    """

    op0: StiffnessOperator  # operator with placeholder D (geometry carrier)
    f0: jax.Array  # [nnode, 3] unit load vector (masked)
    cg_tol: float
    cg_maxiter: int

    @property
    def dtype(self):
        return self.op0.dtype

    def operator_with(self, D_e: jax.Array) -> StiffnessOperator:
        return dataclasses.replace(self.op0, D=D_e)

    def solve(self, D_e: jax.Array, f: Optional[jax.Array] = None) -> jax.Array:
        """Solve K(D_e) u = f with implicit-differentiation semantics.

        custom_linear_solve makes d(solve)/d(D_e, f) an adjoint solve with
        the same operator (symmetric SPD -> transpose solve == solve).
        """
        op = self.operator_with(D_e)
        rhs = op.free_mask * (self.f0 if f is None else f)
        diag = op.diagonal()

        def matvec(u):
            return op.apply(u)

        def solver(mv, b):
            return cg_mod.pcg(
                mv, b, diag=diag, tol=self.cg_tol,
                maxiter=self.cg_maxiter, ndof=3 * op.nnode,
            ).u

        return jax.lax.custom_linear_solve(
            matvec, rhs, solve=solver, symmetric=True
        )


@dataclasses.dataclass(frozen=True)
class StencilForwardProblem:
    """theta -> u forward model on the Pallas stencil fast path.

    For a structured single-formulation HEX8 grid with a *homogeneous*
    material — exactly the calibration setting, where theta = (E, nu) is one
    global material — the assembled stencil tables are linear in the Lame
    constants: ke = lam*ke_lam + mu*ke_mu (Material.SetElastic,
    src/STAN_Database/Material.cs:31-56), hence

        K(theta)·u = lam * K_lam·u  +  mu * K_mu·u

    with K_lam / K_mu two *fixed-table* stencil sweeps (fem/stencil.py).
    Both tables are baked at build time, so jit traces once for all theta;
    each sweep is a self-adjoint linear primitive (stencil._sweep_p), so HMC
    gradients flow through custom_linear_solve's implicit adjoint with no
    unrolling and chains vmap over it. This replaces
    the general gather/scatter operator (~100x slower at 1M DOF, VERDICT r3
    missing item 3) as the inference forward model on qualifying meshes.
    """

    ft_lam: tuple  # frozen unit-lambda stencil tables (static)
    ft_mu: tuple   # frozen unit-mu stencil tables (static)
    free_mask: jax.Array  # [3, nnx, nny, nnz]
    d_lam: jax.Array  # raw unit-lambda diagonal grid [3, nnx, nny, nnz]
    d_mu: jax.Array   # raw unit-mu diagonal grid
    f0: jax.Array     # [3, nnx, nny, nnz] unit load grid
    node_shape: tuple
    cg_tol: float
    cg_maxiter: int

    @property
    def dtype(self):
        return self.f0.dtype

    def to_flat(self, u_grid: jax.Array) -> jax.Array:
        n = self.node_shape
        return u_grid.transpose(1, 2, 3, 0).reshape(n[0] * n[1] * n[2], 3)

    def matvec_fn(self, lam, mu) -> Callable[[jax.Array], jax.Array]:
        """Masked SPD action u -> M K(theta) (M u) + (I - M) u on the grid.

        K(theta)·u runs as ONE coefficient-parameterized Pallas pass
        (stencil.theta_sweep: a·K_l u + b·K_m u with static tables and SMEM
        coefficients) — the same FMA count as a single fixed-table sweep,
        i.e. half the cost of summing two separate unit sweeps.
        """
        from stan_tpu.fem import stencil

        m = self.free_mask

        def matvec(u):
            mu_u = m * u
            ku = stencil.theta_sweep(lam, mu, mu_u, self.ft_lam, self.ft_mu)
            return m * ku + (1.0 - m) * u

        return matvec

    def diagonal(self, lam, mu) -> jax.Array:
        m = self.free_mask
        return m * (lam * self.d_lam + mu * self.d_mu) + (1.0 - m)

    def solve(self, lam, mu, f: Optional[jax.Array] = None) -> jax.Array:
        """Solve K(lam, mu) u = f on the grid with implicit-diff semantics.

        Same custom_linear_solve structure as ForwardProblem.solve: the
        adjoint solve reuses the (symmetric) operator, and d(matvec)/d(lam,
        mu) is two extra fixed-table sweeps via linear_call jvp/transpose.
        """
        matvec = self.matvec_fn(lam, mu)
        rhs = self.free_mask * (self.f0 if f is None else f)
        diag = self.diagonal(lam, mu)

        def solver(mv, b):
            return cg_mod.pcg(
                mv, b, diag=diag, tol=self.cg_tol,
                maxiter=self.cg_maxiter,
                ndof=int(3 * np.prod(self.node_shape)),
            ).u

        return jax.lax.custom_linear_solve(
            matvec, rhs, solve=solver, symmetric=True
        )


def build_stencil_forward(
    model: FEModel,
    *,
    dtype=None,
    cg_tol: float = 1.0e-8,
    cg_maxiter: int = 0,
) -> Optional[StencilForwardProblem]:
    """Build the stencil fast-path forward model, or None if the mesh does
    not qualify (structured meshgen-ordered HEX8 grid required; the material
    table is *ignored* — theta supplies the material)."""
    from stan_tpu.fem import stencil, structured

    base = structured.build_structured_operator(model, dtype=dtype)
    if base is None or min(base.node_shape) < 3:
        return None
    tables_lam = stencil.signature_tables(np.asarray(base.ke_lam, np.float64))
    tables_mu = stencil.signature_tables(np.asarray(base.ke_mu, np.float64))
    # Raw (unmasked, unit-coefficient) Jacobi diagonals, geometry-only.
    shape = (24, *base.nelems)
    dl = jnp.broadcast_to(
        jnp.diagonal(base.ke_lam)[:, None, None, None], shape)
    dm = jnp.broadcast_to(jnp.diagonal(base.ke_mu)[:, None, None, None], shape)
    d_lam = base.scatter_elements(dl)
    d_mu = base.scatter_elements(dm)
    f0 = base.to_grid(jnp.asarray(model.load_vector(), dtype=base.dtype))
    if cg_maxiter == 0:
        cg_maxiter = 3 * model.nnode
    return StencilForwardProblem(
        ft_lam=stencil._freeze_tables(tables_lam),
        ft_mu=stencil._freeze_tables(tables_mu),
        free_mask=base.free_mask,
        d_lam=d_lam,
        d_mu=d_mu,
        f0=f0,
        node_shape=base.node_shape,
        cg_tol=cg_tol,
        cg_maxiter=cg_maxiter,
    )


def build_forward(
    model: FEModel,
    *,
    dtype=None,
    cg_tol: float = 1.0e-8,
    cg_maxiter: int = 0,
    prefer_stencil: bool = True,
):
    """Build the theta -> u forward model, auto-selecting the fastest
    qualifying operator: the Pallas stencil path (StencilForwardProblem) on
    structured HEX8 grids, else the general gather/scatter path
    (ForwardProblem)."""
    if dtype is None:
        dtype = default_dtype()
    if prefer_stencil:
        sfwd = build_stencil_forward(
            model, dtype=dtype, cg_tol=cg_tol, cg_maxiter=cg_maxiter)
        if sfwd is not None:
            return sfwd
    op = build_operator(
        model.coords, model.conn, model.elem_d_matrices(),
        model.fix_mask(), model.formulation(), dtype=dtype,
    )
    f0 = jnp.asarray(model.load_vector(), dtype=dtype)
    if cg_maxiter == 0:
        cg_maxiter = 3 * model.nnode
    return ForwardProblem(op0=op, f0=f0, cg_tol=cg_tol, cg_maxiter=cg_maxiter)


def displacement_fn(
    fwd, nelem: int
) -> Callable[[jax.Array], jax.Array]:
    """theta = (log_E, nu, log_load_scale) -> u [nnode, 3].

    The calibration parameterization of BASELINE.json ("NUTS/HMC calibration
    of E and nu", "SMC load-uncertainty"): homogeneous material with
    unconstrained log_E, nu, and a log load scale. Dispatches on the
    forward-problem type (stencil fast path vs general operator).
    """
    if isinstance(fwd, StencilForwardProblem):
        def u_of_stencil(theta):
            log_E, nu, log_s = theta[0], theta[1], theta[2]
            lam, mu = lame_from_E_nu(jnp.exp(log_E), nu)
            u_grid = fwd.solve(lam, mu, fwd.f0 * jnp.exp(log_s))
            return fwd.to_flat(u_grid)

        return u_of_stencil
    dtype = fwd.op0.dtype

    def u_of(theta):
        log_E, nu, log_s = theta[0], theta[1], theta[2]
        E = jnp.exp(log_E)
        lam, mu = lame_from_E_nu(E, nu)
        D = d_matrix_from_lame(lam, mu).astype(dtype)
        D_e = jnp.broadcast_to(D, (nelem, 6, 6))
        return fwd.solve(D_e, fwd.f0 * jnp.exp(log_s))

    return u_of


jax.tree_util.register_pytree_node(
    ForwardProblem,
    lambda p: ((p.op0, p.f0), (p.cg_tol, p.cg_maxiter)),
    lambda aux, leaves: ForwardProblem(
        op0=leaves[0], f0=leaves[1], cg_tol=aux[0], cg_maxiter=aux[1]
    ),
)

jax.tree_util.register_pytree_node(
    StencilForwardProblem,
    lambda p: ((p.free_mask, p.d_lam, p.d_mu, p.f0),
               (p.ft_lam, p.ft_mu, p.node_shape, p.cg_tol, p.cg_maxiter)),
    lambda aux, leaves: StencilForwardProblem(
        ft_lam=aux[0], ft_mu=aux[1],
        free_mask=leaves[0], d_lam=leaves[1], d_mu=leaves[2], f0=leaves[3],
        node_shape=aux[2], cg_tol=aux[3], cg_maxiter=aux[4],
    ),
)
