"""Nonlinear (Total-Lagrangian) static analysis: incremental Newton-Raphson.

Counterpart of SolverNonlinearStatics (src/STAN_Solver/Solver.cs:219-452):
load applied in IncNumb equal increments, Newton iterations per increment
until ||F_ext - R|| / ||F_ext|| < 1e-3 (Solver.cs:226,429-433), tangent
stiffness after the first iteration (Solver.cs:339-351). The whole Newton
step — tangent PCG solve + residual evaluation — is one jitted function of
the state, compiled once and reused across increments and iterations
(lax.while_loop drives the Newton iteration on device).

Divergences from the reference (it is debug-quality there, SURVEY.md §0):
  * residual from the consistent total Green-Lagrange/PK2 state
    (fem/nonlinear_kernels.py) instead of accumulated linearized increments;
  * the external load ramps as inc/IncNumb every increment — the reference
    only loads increment 1 (Solver.cs:318-329 `if (inc == 1)`);
  * the tangent solve is matrix-free PCG (assembled-K Cholesky remains
    available for small problems through solvers.direct on request).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from stan_tpu.core.model import FEModel
from stan_tpu.fem import nonlinear_kernels as nlk
from stan_tpu.fem.operator import StiffnessOperator, build_operator, default_dtype
from stan_tpu.solvers import cg as cg_mod
from stan_tpu.utils.timing import PhaseTimer


@dataclasses.dataclass
class NonlinearResult:
    u: np.ndarray  # [nnode, 3] final displacements
    strain: np.ndarray  # [ninc+1, E, nn, 6] Green-Lagrange per increment
    stress: np.ndarray  # [ninc+1, E, nn, 6] PK2 per increment
    disp: np.ndarray  # [ninc+1, nnode, 3]
    newton_iters: np.ndarray  # [ninc]
    residuals: np.ndarray  # [ninc] final relative residual norms
    converged: bool


def _internal_force_global(op: StiffnessOperator, u: jax.Array) -> jax.Array:
    u_e = op.gather(u)
    f_e = nlk.internal_force_tl(op.dN, op.detJw, op.D, u_e)
    return op.scatter_add(f_e)


def _tangent_operator(op: StiffnessOperator, u: jax.Array):
    """Masked matrix-free tangent action at state u."""
    u_e = op.gather(u)

    def apply(du):
        m = op.free_mask
        du_m = m * du
        f_e = nlk.tangent_apply(op.dN, op.detJw, op.D, u_e, op.gather(du_m))
        return m * op.scatter_add(f_e) + (1.0 - m) * du

    return apply


@partial(jax.jit, static_argnames=("newton_maxiter", "cg_maxiter"))
def _newton_increment(
    op: StiffnessOperator,
    u0: jax.Array,
    f_ext: jax.Array,
    tol: jax.Array,
    cg_tol: jax.Array,
    newton_maxiter: int = 20,
    cg_maxiter: int = 0,
):
    """Run Newton iterations for one load increment, entirely on device.

    Returns (u, iters, rel_residual). The tangent is re-linearized every
    iteration (the reference holds K_Initial for iteration 0 and re-
    assembles K_Tangent after, Solver.cs:339-351 — same convergence basin,
    one code path here).
    """
    m = op.free_mask
    ndof = 3 * op.nnode
    cg_iters = cg_maxiter if cg_maxiter else ndof
    norm_f = jnp.sqrt(jnp.sum((m * f_ext) ** 2))
    norm_f = jnp.maximum(norm_f, jnp.finfo(u0.dtype).tiny)

    # Jacobi diagonal of the *linear* operator as preconditioner: the
    # geometric correction is small relative to diag(K) in the convergent
    # regime, and the linear diag is state-independent (hoisted out of the
    # Newton loop).
    diag = op.diagonal()

    def residual_of(u):
        R = _internal_force_global(op, u)
        return m * (f_ext - R)

    def cond(state):
        u, res, it = state
        rel = jnp.sqrt(jnp.sum(res**2)) / norm_f
        return jnp.logical_and(rel > tol, it < newton_maxiter)

    def body(state):
        u, res, it = state
        tangent = _tangent_operator(op, u)
        sol = cg_mod.pcg(
            tangent, res, diag=diag, tol=cg_tol,
            maxiter=cg_iters, ndof=ndof,
        )
        u = u + m * sol.u
        return (u, residual_of(u), it + 1)

    res0 = residual_of(u0)
    u, res, iters = jax.lax.while_loop(cond, body, (u0, res0, jnp.int32(0)))
    rel = jnp.sqrt(jnp.sum(res**2)) / norm_f
    return u, iters, rel


@jax.jit
def _recover_jit(op: StiffnessOperator, u: jax.Array):
    return nlk.recover_tl(op.dN, op.detJw, op.D, op.gather(u), op.form)


def solve_nonlinear_statics(
    model: FEModel,
    *,
    dtype=None,
    timer: Optional[PhaseTimer] = None,
    newton_tol: float = 1.0e-3,
    newton_maxiter: int = 20,
    store: bool = True,
    checkpoint_path: Optional[str] = None,
) -> NonlinearResult:
    """Incremental TL Newton solve; stores per-increment results like the
    reference (displacement histories + per-increment strain/stress).

    With ``checkpoint_path``, the full per-increment history is snapshotted
    after each converged increment and a restarted call resumes at the
    first incomplete increment (no mid-solve resume exists in the
    reference — SURVEY.md §5.4).
    """
    from stan_tpu.utils import checkpoint as ckpt

    if dtype is None:
        dtype = default_dtype()
    timer = timer or PhaseTimer(verbose=False)
    ninc = max(1, model.analysis.inc_numb)

    with timer.phase("Operator setup"):
        op = build_operator(
            model.coords, model.conn, model.elem_d_matrices(),
            model.fix_mask(), model.formulation(), dtype=dtype,
        )
        f_full = jnp.asarray(model.load_vector(), dtype=dtype)

    nnode = model.nnode
    u = jnp.zeros((nnode, 3), dtype=dtype)
    disp = [np.zeros((nnode, 3))]
    strains = []
    stresses = []
    iters_list = []
    res_list = []
    cg_tol = jnp.asarray(model.analysis.lin_solver_tolerance, dtype=dtype)
    tol = jnp.asarray(newton_tol, dtype=dtype)

    E, nn = model.nelem, model.conn.shape[1]
    zero66 = np.zeros((E, nn, 6))
    strains.append(zero66)
    stresses.append(zero66)

    ok = True
    start_inc = 1
    state_ck = ckpt.load_or_none(checkpoint_path)
    if state_ck is not None and int(state_ck.get("ninc", -1)) == ninc:
        start_inc = int(state_ck["next_inc"])
        u = jnp.asarray(state_ck["u"], dtype=dtype)
        disp = [np.asarray(a) for a in state_ck["disp"]]
        strains = [np.asarray(a) for a in state_ck["strains"]]
        stresses = [np.asarray(a) for a in state_ck["stresses"]]
        iters_list = [int(v) for v in state_ck["iters"]]
        res_list = [float(v) for v in state_ck["res"]]
        ok = all(r <= newton_tol for r in res_list)

    for inc in range(start_inc, ninc + 1):
        # Load ramp inc/ninc (reference intent, Solver.cs:324-327).
        f_ext = f_full * (inc / ninc)
        with timer.phase(f"Increment {inc}"):
            u, iters, rel = _newton_increment(
                op, u, f_ext, tol, cg_tol,
                newton_maxiter=newton_maxiter,
                cg_maxiter=int(model.analysis.lin_solver_maxiter),
            )
            iters_i, rel_i = int(iters), float(rel)
        timer.records[-1]["newton_iters"] = iters_i
        timer.records[-1]["residual"] = f"{rel_i:.2e}"
        iters_list.append(iters_i)
        res_list.append(rel_i)
        ok = ok and (rel_i <= newton_tol)

        eps, sig = _recover_jit(op, u)
        disp.append(np.asarray(u))
        strains.append(np.asarray(eps))
        stresses.append(np.asarray(sig))
        if checkpoint_path:
            ckpt.save(checkpoint_path, {
                "ninc": ninc, "next_inc": inc + 1, "u": np.asarray(u),
                "disp": disp, "strains": strains, "stresses": stresses,
                "iters": iters_list, "res": res_list,
            })

    disp_arr = np.stack(disp, axis=0)
    strain_arr = np.stack(strains, axis=0)
    stress_arr = np.stack(stresses, axis=0)
    if store:
        model.disp = disp_arr
        model.strain = strain_arr
        model.stress = stress_arr
        model.analysis.result_step_no = ninc

    return NonlinearResult(
        u=np.asarray(u),
        strain=strain_arr,
        stress=stress_arr,
        disp=disp_arr,
        newton_iters=np.asarray(iters_list),
        residuals=np.asarray(res_list),
        converged=ok,
    )
