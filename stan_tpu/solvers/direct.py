"""Direct linear solvers: blocked dense Cholesky (LLT) and LU.

Replaces the reference's ALGLIB skyline Cholesky
(src/STAN_Solver/SolverFunctions.cs:332-444) and sparse LU
(SolverFunctions.cs:446-516). On TPU, XLA's dense blocked factorizations run
on the MXU and beat a skyline scheme for the small/medium problems where a
direct path makes sense; at large scale the CG path is the intended solver
(as in the reference, where CG is the default -- Analysis.cs:18).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def solve_cholesky(K: jax.Array, f: jax.Array) -> jax.Array:
    """LLT solve of the (masked, SPD) dense system."""
    c, lower = jax.scipy.linalg.cho_factor(K, lower=True)
    return jax.scipy.linalg.cho_solve((c, lower), f)


def solve_lu(K: jax.Array, f: jax.Array) -> jax.Array:
    """LU solve (reachable in the reference only by setting LinSolver="LU"
    programmatically, Solver.cs:164)."""
    lu, piv = jax.scipy.linalg.lu_factor(K)
    return jax.scipy.linalg.lu_solve((lu, piv), f)
