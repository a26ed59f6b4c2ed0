"""Global stiffness operator: matrix-free action + Jacobi diagonal + BC masks.

TPU-native replacement for the reference assembly/solve pipeline
(src/STAN_Solver/SolverFunctions.cs:117-180 ParallelAssembly_K +
ALGLIB sparse K). Two designs, selectable per problem size:

  * matrix-free (default): K.u is computed per CG iteration as
        gather u -> batched element contraction (fem/kernels.py) -> scatter
    The scatter is a deterministic `segment_sum` over precomputed DOF index
    arrays -- no locks, no races, bitwise-reproducible across runs (the
    reference needs `lock(K)` per scatter, SolverFunctions.cs:162-167, and
    has an unguarded race on R, Solver.cs:184-197; both are designed out).
  * assembled BCOO/dense (fem/assembly.py): for the direct Cholesky path and
    for small-problem cross-checks.

Dirichlet handling: instead of physically deleting fixed rows/columns via an
index-shift array (Solver.cs:120-132) -- which would make shapes
data-dependent -- fixed DOFs are masked: the operator acts as
    A = M K M + (I - M),   rhs = M f
with M = diag(free mask). The masked system keeps static shapes, is SPD, and
its solution equals the reference's reduced solve with zeros re-inserted at
fixed DOFs (Include_BC_DOF, SolverFunctions.cs:520-538): proven by the block
elimination [K_ff 0; 0 I][u_f; u_c] = [f_f; 0]. Tests verify equivalence.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from stan_tpu.fem import kernels
from stan_tpu.fem.elements import ElementFormulation
from stan_tpu.fem.kernels import _einsum


def default_dtype():
    """float64 under x64 mode (parity runs), float32 otherwise (TPU speed)."""
    return jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32


@dataclasses.dataclass(frozen=True)
class StiffnessOperator:
    """Matrix-free masked stiffness operator for one uniform element block.

    Fields are device arrays captured in jitted closures:
      conn:      i32[E, nn] dense node indices
      dN:        [E, G, 3, nn] precomputed shape-function gradients
      detJw:     [E, G]
      D:         [E, 6, 6]
      free_mask: [nnode, 3] 1.0 where DOF is free, 0.0 where fixed
      nnode:     static int
    """

    conn: jax.Array
    dN: jax.Array
    detJw: jax.Array
    D: jax.Array
    free_mask: jax.Array
    nnode: int
    form: ElementFormulation
    # Transposed incidence i32[nnode, maxdeg] into the flattened [E*nn (+1
    # zero pad row)] element-node axis; None falls back to segment_sum.
    inc_idx: Optional[jax.Array] = None

    @property
    def dtype(self):
        return self.dN.dtype

    def gather(self, u: jax.Array) -> jax.Array:
        """u[nnode, 3] -> u_e[E, nn, 3]."""
        return u[self.conn]

    def scatter_add(self, f_e: jax.Array) -> jax.Array:
        """f_e[E, nn, 3] -> f[nnode, 3], deterministic.

        Preferred path: the precomputed incidence transpose turns the
        scatter into a padded gather + small-axis sum — XLA lowers gathers
        to fast dynamic-slices on TPU whereas true scatter-adds serialize
        (pallas_guide.md: prefer gather formulations). Fallback:
        segment_sum (still deterministic, unlike the reference's
        lock-protected hash scatter, SolverFunctions.cs:162-167).
        """
        flat = f_e.reshape(-1, 3)
        if self.inc_idx is None:
            return jax.ops.segment_sum(flat, self.conn.reshape(-1),
                                       num_segments=self.nnode)
        padded = jnp.concatenate(
            [flat, jnp.zeros((1, 3), dtype=flat.dtype)], axis=0
        )
        return padded[self.inc_idx].sum(axis=1)

    def apply_raw(self, u: jax.Array) -> jax.Array:
        """K.u without BC masking; u, result: [nnode, 3]."""
        u_e = self.gather(u)
        f_e = kernels.internal_force(self.dN, self.detJw, self.D, u_e)
        return self.scatter_add(f_e)

    def apply(self, u: jax.Array) -> jax.Array:
        """Masked SPD action A.u = M K (M u) + (1-M) u."""
        m = self.free_mask
        return m * self.apply_raw(m * u) + (1.0 - m) * u

    def diagonal(self) -> jax.Array:
        """diag(A)[nnode, 3]: masked Jacobi diagonal (free DOFs get diag(K),
        fixed DOFs get 1), the preconditioner ALGLIB lincg applies by default
        (SolverFunctions.cs:276-304 notes)."""
        coords_diag = kernels.element_stiffness_diag  # noqa: used below
        d_e = _element_diag(self.dN, self.detJw, self.D)  # [E, nn, 3]
        d = self.scatter_add(d_e)
        return self.free_mask * d + (1.0 - self.free_mask)


def _element_diag(dN, detJw, D):
    """diag(ke) reshaped [E, nn, 3], computed directly from gradients.

    diag entry for node n, dir j:
      sum_g detJw * B[:,3n+j]^T D B[:,3n+j]
    where column (n,j) of B has nonzeros: row j -> dN[j,n] (normal terms) and
    shear rows per Voigt layout. Expanded explicitly to avoid materializing B.
    """
    dx, dy, dz = dN[..., 0, :], dN[..., 1, :], dN[..., 2, :]  # [E, G, nn]
    zero = jnp.zeros_like(dx)
    # Column vectors of B for direction j as [6, ...]: c_j[i] over Voigt i
    cols = [
        jnp.stack([dx, zero, zero, dy, zero, dz], axis=-1),  # j=0: rows 0,3,5
        jnp.stack([zero, dy, zero, dx, dz, zero], axis=-1),  # j=1: rows 1,3,4
        jnp.stack([zero, zero, dz, zero, dy, dx], axis=-1),  # j=2: rows 2,4,5
    ]
    out = []
    for c in cols:  # c: [E, G, nn, 6]
        dc = _einsum("eij,egnj->egni", D, c)
        out.append(_einsum("egni,egni,eg->en", c, dc, detJw))
    return jnp.stack(out, axis=-1)  # [E, nn, 3]


def node_incidence(conn: np.ndarray, nnode: int) -> np.ndarray:
    """Transposed incidence map for the gather-based scatter.

    Returns i32[nnode, maxdeg]: for each node, the positions in the
    flattened [E*nn] element-node axis that touch it; padding entries point
    one past the end (a zero row is appended on the device side). Host-side
    O(E nn log(E nn)) preprocessing, done once per mesh.
    """
    flat = np.asarray(conn).reshape(-1)
    order = np.argsort(flat, kind="stable")
    counts = np.bincount(flat, minlength=nnode)
    maxdeg = int(counts.max()) if flat.size else 0
    starts = np.cumsum(counts) - counts
    pos = np.arange(flat.size) - starts[flat[order]]
    idx = np.full((nnode, maxdeg), flat.size, dtype=np.int64)
    idx[flat[order], pos] = order
    return idx


def build_operator(
    coords: np.ndarray | jax.Array,
    conn: np.ndarray | jax.Array,
    D_e: np.ndarray | jax.Array,
    fix_mask: np.ndarray | jax.Array,
    form: ElementFormulation,
    dtype=None,
    use_incidence: bool = True,
) -> StiffnessOperator:
    """Precompute geometry and build the masked matrix-free operator.

    dtype=None selects float64 when x64 mode is enabled, else float32.
    """
    if dtype is None:
        dtype = default_dtype()
    conn_np = np.asarray(conn)
    coords = jnp.asarray(coords, dtype=dtype)
    conn = jnp.asarray(conn_np, dtype=jnp.int32)
    D_e = jnp.asarray(D_e, dtype=dtype)
    free = 1.0 - jnp.asarray(fix_mask, dtype=dtype)
    dN, detJw = kernels.element_geometry(coords[conn], form)
    inc = None
    if use_incidence:
        inc = jnp.asarray(
            node_incidence(conn_np, int(coords.shape[0])), dtype=jnp.int32
        )
    return StiffnessOperator(
        conn=conn,
        dN=dN,
        detJw=detJw,
        D=D_e,
        free_mask=free,
        nnode=int(coords.shape[0]),
        form=form,
        inc_idx=inc,
    )


jax.tree_util.register_pytree_node(
    StiffnessOperator,
    lambda op: (
        (op.conn, op.dN, op.detJw, op.D, op.free_mask, op.inc_idx),
        (op.nnode, op.form),
    ),
    lambda aux, leaves: StiffnessOperator(
        *leaves[:5], nnode=aux[0], form=aux[1], inc_idx=leaves[5]
    ),
)
