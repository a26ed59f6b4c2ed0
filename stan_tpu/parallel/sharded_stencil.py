"""Sharded stencil operator: multi-chip CG at assembled-stencil speed.

The fast single-chip operator (fem/stencil.py) decomposed over the device
mesh's "domain" axis. The node grid's flat numbering is x-major
(meshgen: id = i*nny*nnz + j*nnz + k), so sharding the channel-first grid
[3, NNX, NNY, NNZ] on axis 1 gives each device a contiguous x-slab -- the
halo a 27-point stencil needs is exactly one boundary plane per neighbor:

  * u out: each device ppermutes its first/last plane to its x neighbors
    (non-wrapping perms -- the absent source on the global edge devices
    yields zeros, which IS the stencil's ghost-layer convention);
  * the fused Pallas sweep (fem/stencil.fused_sweep) runs unchanged on the
    local slab with the neighbor planes as its x ghost layer; the y/z
    boundary tiers are local to every slab and run in-kernel, and the
    global x L/H face tiers are predicated on (axis_index == 0 / ndev-1)
    indicator flags so one SPMD program serves every device.

This is the halo-exchange PCG of SURVEY.md section 5.7/5.8 on the fast
operator (the reference's solve being parallelized is ALGLIB lincg,
src/STAN_Solver/SolverFunctions.cs:270-330; the reference itself has no
distributed backend). CG dot products reduce with psum over the domain axis
(solvers/cg.py axis_name).

Layout contract: NNX must divide evenly by the domain-axis size (shard_map
needs equal slabs, and the global-edge corrections are anchored at static
local planes 0 / spx-1 of the edge devices). Callers fall back to
parallel/sharded.py's general operator otherwise.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from stan_tpu.core.model import FEModel
from stan_tpu.fem import stencil
from stan_tpu.solvers import cg as cg_mod


@dataclasses.dataclass(frozen=True)
class ShardedStencilOperator:
    """Stencil operator in global channel-first grid layout [3,NNX,NNY,NNZ],
    sharded on the x (node-plane) axis."""

    free_mask: jax.Array  # [3, NNX, NNY, NNZ]
    diag: jax.Array       # [3, NNX, NNY, NNZ] masked Jacobi diagonal
    tables: dict          # static {sig: {off: 3x3}} (fem/stencil)
    deltas: dict          # static boundary corrections
    ndev: int
    axis: str = "domain"


jax.tree_util.register_pytree_node(
    ShardedStencilOperator,
    lambda op: ((op.free_mask, op.diag),
                (stencil._freeze_tables(op.tables),
                 stencil._freeze_tables(op.deltas), op.ndev, op.axis)),
    lambda aux, leaves: ShardedStencilOperator(
        free_mask=leaves[0], diag=leaves[1],
        tables=stencil._thaw_tables(aux[0]),
        deltas=stencil._thaw_tables(aux[1]), ndev=aux[2], axis=aux[3]),
)


def operator_specs(op: ShardedStencilOperator) -> ShardedStencilOperator:
    """PartitionSpecs pytree for shard_map in_specs (x-slab sharding)."""
    sp = P(None, op.axis, None, None)
    return ShardedStencilOperator(
        free_mask=sp, diag=sp, tables=op.tables, deltas=op.deltas,
        ndev=op.ndev, axis=op.axis)


def grid_spec(op: ShardedStencilOperator) -> P:
    """PartitionSpec of grid-layout vectors (u, f, rhs)."""
    return P(None, op.axis, None, None)


def _local_apply(op_l: ShardedStencilOperator, u_local: jax.Array
                 ) -> jax.Array:
    """Per-device masked K·u on the local x-slab (inside shard_map)."""
    ax = op_l.axis
    n = jax.lax.axis_size(ax)
    idx = jax.lax.axis_index(ax)
    m = op_l.free_mask  # local slab
    um = m * u_local
    # Halo exchange: non-wrapping perms; edge devices receive zeros, which
    # is exactly the global zero ghost layer.
    fwd = [(i, i + 1) for i in range(n - 1)]
    bwd = [(i + 1, i) for i in range(n - 1)]
    from_left = jax.lax.ppermute(um[:, -1:], ax, fwd)
    from_right = jax.lax.ppermute(um[:, :1], ax, bwd)
    u_ext = jnp.concatenate([from_left, um, from_right], axis=1)
    up = jnp.pad(u_ext, ((0, 0), (0, 0), (1, 1), (1, 1)))
    is_low = (idx == 0).astype(jnp.int32)
    is_high = (idx == n - 1).astype(jnp.int32)
    f = stencil.fused_sweep(op_l.tables, up, is_low, is_high)
    return m * f + (1.0 - m) * u_local


def build_sharded_stencil_operator(
    model: FEModel, ndev: int, dtype=None
) -> Optional[ShardedStencilOperator]:
    """Build the sharded fast path, or None if the mesh doesn't qualify
    (stencil requirements + NNX divisible by ndev)."""
    sop = stencil.build_stencil_operator(model, dtype=dtype)
    if sop is None:
        return None
    nnx = sop.node_shape[0]
    if ndev < 1 or nnx % ndev != 0:
        return None
    return ShardedStencilOperator(
        free_mask=sop.free_mask,
        diag=sop.diagonal(),
        tables=sop.tables,
        deltas=sop.deltas,
        ndev=ndev,
    )


def sharded_apply(mesh: Mesh, op: ShardedStencilOperator, u: jax.Array
                  ) -> jax.Array:
    """Masked K·u under shard_map (one apply; used by tests/benches)."""
    specs = operator_specs(op)
    sp = grid_spec(op)
    fn = jax.shard_map(
        _local_apply, mesh=mesh, in_specs=(specs, sp), out_specs=sp,
        check_vma=False,
    )
    return jax.jit(fn)(op, u)


def sharded_stencil_pcg(
    mesh: Mesh,
    op: ShardedStencilOperator,
    f: jax.Array,
    *,
    tol: float = 1e-6,
    maxiter: int = 0,
):
    """Jacobi-PCG on the sharded stencil operator.

    f: [3, NNX, NNY, NNZ] RHS in grid layout. Returns CGResult with u in
    the same layout.
    """
    axis = op.axis
    specs = operator_specs(op)
    sp = grid_spec(op)
    ndof = int(np.prod(op.free_mask.shape))
    if maxiter == 0:
        maxiter = ndof

    def body(op_l, f_local):
        rhs = op_l.free_mask * f_local
        return cg_mod.pcg(
            lambda u: _local_apply(op_l, u),
            rhs, diag=op_l.diag, tol=tol, maxiter=maxiter, ndof=ndof,
            axis_name=axis,
        )

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(specs, sp),
        out_specs=cg_mod.CGResult(
            u=sp, iters=P(), residual=P(), converged=P(), diverged=P(),
        ),
        check_vma=False,
    )
    return jax.jit(fn)(op, f)
