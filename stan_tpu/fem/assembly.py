"""Explicit global-matrix assembly (COO/BCOO and dense) via segment-sum.

The reference assembles an ALGLIB hash-table sparse matrix element by element
under a global lock (src/STAN_Solver/SolverFunctions.cs:117-180). The TPU
analogue: compute all element stiffness matrices in one batched kernel, then
scatter with a deterministic `segment_sum` over precomputed (row, col)
index arrays -- lock-free, race-free, reproducible.

Used by the direct Cholesky/LU paths and small-problem cross-checks; the CG
hot path is matrix-free (fem/operator.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import sparse as jsparse

from stan_tpu.fem import kernels
from stan_tpu.fem.elements import ElementFormulation
from stan_tpu.fem.operator import default_dtype


def coo_indices(conn: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Precompute global (row, col) DOF indices for every ke entry.

    conn: i64[E, nn]. Returns (rows, cols) each i64[E, 3nn, 3nn] where
    DOF id = 3 * node_index + direction (reference: Node.cs:218-223 maps
    node order index -> 3 consecutive DOF ids the same way).
    """
    E, nn = conn.shape
    dof = (3 * conn[:, :, None] + np.arange(3)[None, None, :]).reshape(E, 3 * nn)
    rows = np.broadcast_to(dof[:, :, None], (E, 3 * nn, 3 * nn))
    cols = np.broadcast_to(dof[:, None, :], (E, 3 * nn, 3 * nn))
    return rows, cols


def assemble_dense(
    coords,
    conn,
    D_e,
    form: ElementFormulation,
    fix_mask=None,
    dtype=None,
) -> jax.Array:
    """Assemble the full dense [ndof, ndof] stiffness matrix.

    Only for small/medium problems (direct path, parity tests). With
    fix_mask given, applies the masked-BC transform M K M + (I - M) so the
    result is SPD and solves the same system as the reference's reduced
    matrix (see fem/operator.py docstring).
    """
    if dtype is None:
        dtype = default_dtype()
    coords = jnp.asarray(coords, dtype=dtype)
    conn_np = np.asarray(conn)
    nnode = coords.shape[0]
    ndof = 3 * nnode
    ke = kernels.element_stiffness(
        coords[jnp.asarray(conn_np)], jnp.asarray(D_e, dtype=dtype), form
    )  # [E, 3nn, 3nn]
    rows, cols = coo_indices(conn_np)
    flat_idx = jnp.asarray(rows * ndof + cols).reshape(-1)
    K = jax.ops.segment_sum(ke.reshape(-1), flat_idx, num_segments=ndof * ndof)
    K = K.reshape(ndof, ndof)
    if fix_mask is not None:
        m = 1.0 - jnp.asarray(fix_mask, dtype=dtype).reshape(-1)
        K = K * m[:, None] * m[None, :] + jnp.diag(1.0 - m)
    return K


def assemble_bcoo(
    coords,
    conn,
    D_e,
    form: ElementFormulation,
    fix_mask=None,
    dtype=None,
) -> jsparse.BCOO:
    """Assemble a deduplicated BCOO sparse stiffness matrix.

    Duplicate (row, col) pairs from shared nodes are summed on host
    (np.unique) so the device matrix has canonical sorted unique indices.
    """
    if dtype is None:
        dtype = default_dtype()
    coords = jnp.asarray(coords, dtype=dtype)
    conn_np = np.asarray(conn)
    nnode = coords.shape[0]
    ndof = 3 * nnode
    ke = kernels.element_stiffness(
        coords[jnp.asarray(conn_np)], jnp.asarray(D_e, dtype=dtype), form
    )
    rows, cols = coo_indices(conn_np)
    flat = (rows.astype(np.int64) * ndof + cols.astype(np.int64)).reshape(-1)
    uniq, inv = np.unique(flat, return_inverse=True)
    vals = jax.ops.segment_sum(
        ke.reshape(-1), jnp.asarray(inv), num_segments=uniq.shape[0]
    )
    idx = np.stack([uniq // ndof, uniq % ndof], axis=1).astype(np.int32)
    if fix_mask is not None:
        m = 1.0 - np.asarray(fix_mask, dtype=np.float64).reshape(-1)
        scale = jnp.asarray(m[idx[:, 0]] * m[idx[:, 1]], dtype=dtype)
        vals = vals * scale
        # add unit diagonal on fixed DOFs
        fixed = np.nonzero(m == 0.0)[0].astype(np.int32)
        diag_idx = np.stack([fixed, fixed], axis=1)
        idx = np.concatenate([idx, diag_idx], axis=0)
        vals = jnp.concatenate(
            [vals, jnp.ones(fixed.shape[0], dtype=dtype)], axis=0
        )
    return jsparse.BCOO(
        (vals, jnp.asarray(idx)), shape=(ndof, ndof), indices_sorted=False
    )
