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


def chain_batched_pcg(
    mesh: Mesh,
    op: ShardedStencilOperator,
    f: jax.Array,
    *,
    scales: Optional[jax.Array] = None,
    tol: float = 1e-6,
    maxiter: int = 0,
    chains_axis: str = "chains",
):
    """Chains x domain composition: independent per-chain PCG solves of
    K u = s_i * f_i with the domain-sharded stencil operator.

    This is the 2-axis mesh layout of SURVEY.md section 2.5/5.8 (the
    parallel solve being composed is the reference's ALGLIB lincg,
    src/STAN_Solver/SolverFunctions.cs:270-330): chains are sharded on
    `chains_axis` and vmapped within each device row; the FEM grid is
    x-slab sharded on the domain axis with halo ppermutes inside the CG
    body. Per-chain solves may converge in different iteration counts, so
    the inner pcg runs with sync_axes=(chains_axis,): every device row
    executes the same number of loop bodies (converged chains no-op) and
    the launch-wide collective schedule stays uniform — the fix for the
    MULTICHIP_r03 rendezvous abort (VERDICT r3 weak item 1).

    Args:
      mesh: 2-axis Mesh with `chains_axis` and op.axis ("domain").
      f: RHS in grid layout — either shared [3, NNX, NNY, NNZ] (then
         `scales` is required) or per-chain [n_chains, 3, NNX, NNY, NNZ].
      scales: optional [n_chains] RHS multipliers (HMC-style per-chain
         load parameters).

    Returns CGResult with u [n_chains, 3, NNX, NNY, NNZ] and per-chain
    iters/residual/converged/diverged vectors.
    """
    if chains_axis not in mesh.axis_names:
        raise ValueError(
            f"mesh has no '{chains_axis}' axis (axes: {mesh.axis_names})")
    axis = op.axis
    specs = operator_specs(op)
    ndof = int(np.prod(op.free_mask.shape))
    if maxiter == 0:
        maxiter = ndof
    per_chain = f.ndim == 5
    if not per_chain and scales is None:
        raise ValueError("shared-f mode needs per-chain `scales`")
    n_chains = f.shape[0] if per_chain else scales.shape[0]
    if scales is None:
        scales = jnp.ones((n_chains,), f.dtype)

    def solve_one(op_l, rhs):
        return cg_mod.pcg(
            lambda u: _local_apply(op_l, u), rhs, diag=op_l.diag,
            tol=tol, maxiter=maxiter, ndof=ndof,
            axis_name=axis, sync_axes=(chains_axis,),
        )

    if per_chain:
        def body(op_l, f_local, scales_local):
            return jax.vmap(
                lambda fi, s: solve_one(op_l, op_l.free_mask * (s * fi))
            )(f_local, scales_local)
        f_spec = P(chains_axis, None, axis, None, None)
    else:
        def body(op_l, f_local, scales_local):
            return jax.vmap(
                lambda s: solve_one(op_l, op_l.free_mask * (s * f_local))
            )(scales_local)
        f_spec = P(None, axis, None, None)

    cp = P(chains_axis)
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(specs, f_spec, cp),
        out_specs=cg_mod.CGResult(
            u=P(chains_axis, None, axis, None, None),
            iters=cp, residual=cp, converged=cp, diverged=cp,
        ),
        check_vma=False,
    )
    return jax.jit(fn)(op, f, scales)
