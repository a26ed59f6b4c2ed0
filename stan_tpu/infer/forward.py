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


def build_forward(
    model: FEModel,
    *,
    dtype=None,
    cg_tol: float = 1.0e-8,
    cg_maxiter: int = 0,
) -> ForwardProblem:
    if dtype is None:
        dtype = default_dtype()
    op = build_operator(
        model.coords, model.conn, model.elem_d_matrices(),
        model.fix_mask(), model.formulation(), dtype=dtype,
    )
    f0 = jnp.asarray(model.load_vector(), dtype=dtype)
    if cg_maxiter == 0:
        cg_maxiter = 3 * model.nnode
    return ForwardProblem(op0=op, f0=f0, cg_tol=cg_tol, cg_maxiter=cg_maxiter)


def displacement_fn(
    fwd: ForwardProblem, nelem: int
) -> Callable[[jax.Array], jax.Array]:
    """theta = (log_E, nu, log_load_scale) -> u [nnode, 3].

    The calibration parameterization of BASELINE.json ("NUTS/HMC calibration
    of E and nu", "SMC load-uncertainty"): homogeneous material with
    unconstrained log_E, nu, and a log load scale.
    """
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
