"""Linear static analysis driver.

TPU-native counterpart of SolverLinearStatics (src/STAN_Solver/Solver.cs:71-217):

  reference                                   here
  ---------                                   ----
  Fix_DOF list + nDOF_reduction index shift   fix_mask [nnode,3] + masked operator
  ParallelAssembly_K (locked hash scatter)    matrix-free operator / segment-sum
  LinearSolver_CG / _Cholesky / _LU           solvers.cg.pcg / solvers.direct
  Include_BC_DOF zero re-insertion            masking already yields full-size u
  Recovery_Stress + extrapolation             kernels.recover_stress_strain
  Compute_NodalForces + R scatter             kernels.internal_force + segment_sum

The whole step (solve + recovery) is one jitted function of the operator
arrays, so repeated solves (Newton iterations, HMC leapfrog steps) reuse the
compiled executable.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from stan_tpu.core.model import FEModel
from stan_tpu.fem import assembly, kernels
from stan_tpu.fem.operator import StiffnessOperator, build_operator, default_dtype
from stan_tpu.solvers import cg as cg_mod
from stan_tpu.solvers import direct
from stan_tpu.utils.timing import PhaseTimer


@dataclasses.dataclass
class LinearResult:
    u: np.ndarray  # [nnode, 3] displacements
    strain: np.ndarray  # [E, nn, 6] node-extrapolated strain
    stress: np.ndarray  # [E, nn, 6]
    reactions: np.ndarray  # [nnode, 3] internal force (R vector, Solver.cs:181)
    iters: int
    residual: float
    converged: bool


@partial(jax.jit, static_argnames=("tol", "maxiter"))
def _solve_cg(op: StiffnessOperator, f: jax.Array, tol: float, maxiter: int):
    rhs = op.free_mask * f
    res = cg_mod.pcg(
        op.apply, rhs, diag=op.diagonal(), tol=tol, maxiter=maxiter,
        ndof=3 * op.nnode,
    )
    return res


@partial(jax.jit, static_argnames=("tol", "maxiter"))
def _solve_cg_structured(sop, f: jax.Array, tol: float, maxiter: int):
    """CG on the structured fast-path operator (grid layout throughout)."""
    u_grid = sop.to_grid(f)
    rhs = sop.free_mask * u_grid
    ndof = int(np.prod(rhs.shape))
    res = cg_mod.pcg(
        sop.apply, rhs, diag=sop.diagonal(), tol=tol, maxiter=maxiter,
        ndof=ndof,
    )
    return res._replace(u=sop.to_flat(res.u))


@jax.jit
def _recover(op: StiffnessOperator, u: jax.Array):
    u_e = op.gather(u)
    eps, sig = kernels.recover_stress_strain(op.dN, op.detJw, op.D, u_e, op.form)
    f_e = kernels.internal_force(op.dN, op.detJw, op.D, u_e)
    R = op.scatter_add(f_e)
    return eps, sig, R


def solve_linear_statics(
    model: FEModel,
    *,
    dtype=None,
    timer: Optional[PhaseTimer] = None,
    store: bool = True,
    use_structured: bool = True,
) -> LinearResult:
    """Run one linear static solve and (optionally) store results in `model`.

    Mirrors the reference flow: single increment, loads applied in full
    (Solver.cs:77,136-152), initial displacement zero so K_Initial's BL1 term
    vanishes.
    """
    if dtype is None:
        dtype = default_dtype()
    timer = timer or PhaseTimer(verbose=False)
    settings = model.analysis
    form = model.formulation()

    with timer.phase("Operator setup"):
        fix = model.fix_mask()
        loads = model.load_vector()
        op = build_operator(
            model.coords, model.conn, model.elem_d_matrices(), fix, form,
            dtype=dtype,
        )
        f = jnp.asarray(loads, dtype=dtype)

    solver = settings.lin_solver
    if solver == "CG":
        # Structured-grid fast paths, fastest first: assembled Pallas
        # stencil (fem/stencil.py, uniform material) -> slice gather + MXU
        # block matmul (fem/structured.py) -> general operator. All act on
        # the same masked system, so results are identical.
        from stan_tpu.fem import stencil as stencil_mod
        from stan_tpu.fem import structured as structured_mod

        sop = None
        if use_structured:
            sop = stencil_mod.build_stencil_operator(model, dtype=dtype)
            if sop is None:
                sop = structured_mod.build_structured_operator(
                    model, dtype=dtype)
        label = "Linear solve (CG, structured)" if sop is not None else \
            "Linear solve (CG)"
        with timer.phase(label):
            if sop is not None:
                res = _solve_cg_structured(
                    sop, f,
                    tol=float(settings.lin_solver_tolerance),
                    maxiter=int(settings.lin_solver_maxiter),
                )
            else:
                res = _solve_cg(
                    op, f,
                    tol=float(settings.lin_solver_tolerance),
                    maxiter=int(settings.lin_solver_maxiter),
                )
            u = res.u
            iters = int(res.iters)
            residual = float(res.residual)
            converged = bool(res.converged)
        # Annotate after the phase context exits (the record is appended
        # on exit; inside the block records[-1] is the previous phase).
        timer.records[-1]["iters"] = iters
    elif solver in ("Cholesky", "LU"):
        with timer.phase(f"Assembly (dense)"):
            K = assembly.assemble_dense(
                model.coords, model.conn, model.elem_d_matrices(), form,
                fix_mask=fix, dtype=dtype,
            )
        with timer.phase(f"Linear solve ({solver})"):
            rhs = (op.free_mask * f).reshape(-1)
            solve = direct.solve_cholesky if solver == "Cholesky" else direct.solve_lu
            u = solve(K, rhs).reshape(model.nnode, 3)
            iters, residual, converged = 1, 0.0, True
    else:
        raise ValueError(f"Unknown linear solver {solver!r}")

    with timer.phase("Stress recovery"):
        eps, sig, R = _recover(op, u)
        u_np = np.asarray(u)
        eps_np, sig_np, R_np = np.asarray(eps), np.asarray(sig), np.asarray(R)

    if store:
        # Increment 0 = zeros (reference Initialize_StepZero), increment 1 =
        # the solution; result step bookkeeping as Solver.cs:56.
        model.disp = np.stack([np.zeros_like(u_np), u_np], axis=0)
        model.strain = np.stack([np.zeros_like(eps_np), eps_np], axis=0)
        model.stress = np.stack([np.zeros_like(sig_np), sig_np], axis=0)
        model.analysis.result_step_no = 1

    return LinearResult(
        u=u_np, strain=eps_np, stress=sig_np, reactions=R_np,
        iters=iters, residual=residual, converged=converged,
    )
