"""Re-measure the CPU baseline used in bench.py (CPU_BASELINE_ITERS_PER_S).

Reference-equivalent pipeline: assemble the global CSR stiffness matrix and
run scipy's Jacobi-preconditioned CG — the same algorithmic role ALGLIB
lincg plays in the reference solver (src/STAN_Solver/SolverFunctions.cs:
270-330: CRS SpMV, diagonal preconditioning), on the same 70^3 hex8 mesh as
the TPU bench (bench.py). float64 like the reference (MatrixST.cs:17).

Run:  python tools/cpu_baseline.py
"""

import time

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import scipy.sparse as sp  # noqa: E402
import scipy.sparse.linalg as spla  # noqa: E402

from stan_tpu.core import meshgen  # noqa: E402
from stan_tpu.fem import assembly, kernels  # noqa: E402


def main() -> None:
    m = meshgen.hex_beam(70, 70, 70)
    form = m.formulation()
    conn = np.asarray(m.conn)
    t0 = time.time()
    coords = jnp.asarray(m.coords)
    ke = np.asarray(
        kernels.element_stiffness(
            coords[jnp.asarray(conn)], jnp.asarray(m.elem_d_matrices()), form
        )
    )
    print(f"element stiffness: {time.time() - t0:.1f}s")
    rows, cols = assembly.coo_indices(conn)
    ndof = m.ndof
    K = sp.coo_matrix(
        (ke.ravel(), (rows.ravel(), cols.ravel())), shape=(ndof, ndof)
    ).tocsr()
    print(f"assembly: {time.time() - t0:.1f}s, nnz={K.nnz}")

    fix = np.asarray(m.fix_mask()).reshape(-1)
    mfree = (~fix).astype(np.float64)
    D = sp.diags(mfree)
    K = D @ K @ D + sp.diags(1.0 - mfree)
    f = np.asarray(m.load_vector()).reshape(-1) * mfree
    Minv = sp.diags(1.0 / K.diagonal())

    niter = [0]
    t0 = time.time()
    _, _ = spla.cg(
        K, f, rtol=1e-30, atol=0.0, maxiter=50, M=Minv,
        callback=lambda x: niter.__setitem__(0, niter[0] + 1),
    )
    dt = time.time() - t0
    print(f"CPU scipy Jacobi-CG: {niter[0]} iters in {dt:.2f}s "
          f"-> {niter[0] / dt:.2f} iters/s")


if __name__ == "__main__":
    main()
