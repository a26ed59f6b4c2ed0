"""SPMD stiffness operator + CG over a device mesh (the "domain" axis).

The distributed-communication backend of the framework (SURVEY.md section
5.8): the reference has none (single process, .NET TPL threads +
lock-protected shared memory, SolverFunctions.cs:129-174); here the solve is
sharded over TPU devices with XLA collectives riding ICI:

  * SpMV:  all_gather(u) over the domain axis -> local element contractions
           -> psum_scatter back to node shards (the classic FEM
           gather/compute/reduce-scatter pattern; halo-only exchange is a
           planned optimization once the partitioner emits halo maps).
  * CG dot products / norms: local partial sums + psum (solvers/cg.py takes
    `axis_name`).

Array layout: global flat arrays sharded on their leading axis --
node-indexed arrays are [nnode_pad, 3] with nnode_pad = ndev * block
(PartitionSpec("domain", None)), element-indexed arrays are [ndev * epb, ...]
(PartitionSpec("domain")). Inside shard_map each device sees its local block
([block, 3] / [epb, ...]). Padding nodes are marked "fixed" so the masked
operator pins them at zero; padding elements have conn=0 and zero D/detJw so
they are numerically inert.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from stan_tpu.fem import kernels
from stan_tpu.fem.elements import ElementFormulation
from stan_tpu.fem.operator import default_dtype, _element_diag, node_incidence
from stan_tpu.parallel.partition import Partition, partition as make_partition
from stan_tpu.solvers import cg as cg_mod


@dataclasses.dataclass(frozen=True)
class ShardedOperator:
    """Masked stiffness operator in global-flat sharded layout.

      conn:      i32[ndev*epb, nn]   (new node numbering, 0..nnode_pad)
      dN:        [ndev*epb, G, 3, nn]
      detJw:     [ndev*epb, G]
      D:         [ndev*epb, 6, 6]
      free_mask: [nnode_pad, 3]
      diag:      [nnode_pad, 3]
    """

    conn: jax.Array
    dN: jax.Array
    detJw: jax.Array
    D: jax.Array
    free_mask: jax.Array
    diag: jax.Array
    nnode_pad: int
    block: int
    form: ElementFormulation
    axis: str = "domain"
    # Per-device transposed incidence [ndev, nnode_pad, maxdeg] into the
    # local flattened [epb*nn (+1 pad)] axis (see operator.node_incidence);
    # None falls back to segment_sum inside each shard.
    inc_idx: Optional[jax.Array] = None


def _local_apply(op_local: ShardedOperator, u_local: jax.Array) -> jax.Array:
    """Per-device masked SpMV body (inside shard_map).

    op_local holds this device's slices; u_local: [block, 3].
    """
    ax = op_local.axis
    m = op_local.free_mask  # [block, 3] local slice
    u_masked = m * u_local
    # Exchange: assemble the full (padded) node vector on every device.
    u_full = jax.lax.all_gather(u_masked, ax, tiled=True)  # [nnode_pad, 3]
    u_e = u_full[op_local.conn]  # [epb, nn, 3]
    f_e = kernels.internal_force(op_local.dN, op_local.detJw, op_local.D, u_e)
    flat = f_e.reshape(-1, 3)
    if op_local.inc_idx is None:
        f_partial = jax.ops.segment_sum(
            flat, op_local.conn.reshape(-1), num_segments=op_local.nnode_pad
        )
    else:
        padded = jnp.concatenate(
            [flat, jnp.zeros((1, 3), dtype=flat.dtype)], axis=0
        )
        # inc_idx local slice is [1, nnode_pad, maxdeg] (leading device axis)
        f_partial = padded[op_local.inc_idx[0]].sum(axis=1)
    # Reduce partial contributions across devices, keep own block.
    f_local = jax.lax.psum_scatter(
        f_partial, ax, scatter_dimension=0, tiled=True
    )  # [block, 3]
    return m * f_local + (1.0 - m) * u_local


def operator_specs(op: ShardedOperator) -> "ShardedOperator":
    """PartitionSpecs matching the global-flat layout (for shard_map)."""
    ax = op.axis
    return ShardedOperator(
        conn=P(ax), dN=P(ax), detJw=P(ax), D=P(ax),
        free_mask=P(ax, None), diag=P(ax, None),
        nnode_pad=op.nnode_pad, block=op.block, form=op.form, axis=ax,
        inc_idx=None if op.inc_idx is None else P(ax, None, None),
    )


def build_sharded_operator(
    coords: np.ndarray,
    conn: np.ndarray,
    D_e: np.ndarray,
    fix_mask: np.ndarray,
    form: ElementFormulation,
    ndev: int,
    dtype=None,
) -> tuple[ShardedOperator, Partition]:
    """Partition the mesh and precompute padded sharded-layout arrays (host)."""
    if dtype is None:
        dtype = default_dtype()
    nnode = coords.shape[0]
    part = make_partition(np.asarray(conn), nnode, ndev)

    # Geometry in ORIGINAL element order, then scattered into shard slots.
    coords_j = jnp.asarray(coords, dtype=dtype)
    dN, detJw = kernels.element_geometry(coords_j[np.asarray(conn)], form)
    dN, detJw = np.asarray(dN), np.asarray(detJw)

    E, nn = conn.shape
    G = form.ngp
    slot = part.elem_owner * part.epb + part.elem_pos  # flat shard slot
    ne_pad = ndev * part.epb
    dN_sh = np.zeros((ne_pad, G, 3, nn), dtype=dN.dtype)
    detJw_sh = np.zeros((ne_pad, G), dtype=dN.dtype)
    D_sh = np.zeros((ne_pad, 6, 6), dtype=dN.dtype)
    dN_sh[slot] = dN
    detJw_sh[slot] = detJw
    D_sh[slot] = np.asarray(D_e)

    # Node masks in new numbering; padding nodes are "fixed".
    free = np.zeros((part.nnode_pad, 3), dtype=np.float64)
    free[part.perm] = 1.0 - np.asarray(fix_mask, dtype=np.float64)

    # Per-device incidence transpose (gather-based scatter, see
    # operator.scatter_add): computed per shard, padded to a common maxdeg.
    incs = [
        node_incidence(part.conn[d], part.nnode_pad) for d in range(ndev)
    ]
    maxdeg = max(i.shape[1] for i in incs)
    pad_val = part.epb * nn
    inc = np.full((ndev, part.nnode_pad, maxdeg), pad_val, dtype=np.int64)
    for d, i in enumerate(incs):
        inc[d, :, : i.shape[1]] = i

    conn_flat = part.conn.reshape(ne_pad, nn)
    op = ShardedOperator(
        conn=jnp.asarray(conn_flat, dtype=jnp.int32),
        dN=jnp.asarray(dN_sh, dtype=dtype),
        detJw=jnp.asarray(detJw_sh, dtype=dtype),
        D=jnp.asarray(D_sh, dtype=dtype),
        free_mask=jnp.asarray(free, dtype=dtype),
        diag=jnp.zeros((part.nnode_pad, 3), dtype=dtype),
        nnode_pad=part.nnode_pad,
        block=part.block,
        form=form,
        inc_idx=jnp.asarray(inc, dtype=jnp.int32),
    )
    # Jacobi diagonal (one-time setup, computed unsharded).
    d_e = _element_diag(op.dN, op.detJw, op.D)
    d = jax.ops.segment_sum(
        d_e.reshape(-1, 3), op.conn.reshape(-1), num_segments=op.nnode_pad
    )
    diag = op.free_mask * d + (1.0 - op.free_mask)
    op = dataclasses.replace(op, diag=diag)
    return op, part


def sharded_pcg(
    mesh: Mesh,
    op: ShardedOperator,
    f: jax.Array,
    *,
    tol: float = 1e-6,
    maxiter: int = 0,
):
    """Jacobi-PCG under shard_map over the domain axis.

    f: [nnode_pad, 3] RHS in new node numbering (padding rows zero).
    Returns CGResult with u in the same layout.
    """
    shard_map = jax.shard_map

    axis = op.axis
    specs = operator_specs(op)
    ndof = op.nnode_pad * 3
    if maxiter == 0:
        maxiter = ndof

    def body(conn, dN, detJw, D, free, diag, inc, f_local):
        local_op = dataclasses.replace(
            op, conn=conn, dN=dN, detJw=detJw, D=D, free_mask=free,
            diag=diag, inc_idx=inc,
        )
        rhs = free * f_local
        return cg_mod.pcg(
            lambda u: _local_apply(local_op, u),
            rhs, diag=diag, tol=tol, maxiter=maxiter, ndof=ndof,
            axis_name=axis,
        )

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(specs.conn, specs.dN, specs.detJw, specs.D,
                  specs.free_mask, specs.diag, specs.inc_idx,
                  P(axis, None)),
        out_specs=cg_mod.CGResult(
            u=P(axis, None), iters=P(), residual=P(), converged=P()
        ),
        check_vma=False,
    )
    return jax.jit(fn)(
        op.conn, op.dN, op.detJw, op.D, op.free_mask, op.diag, op.inc_idx, f
    )


def shard_rhs(part: Partition, loads: np.ndarray) -> np.ndarray:
    """[nnode, 3] loads (old numbering) -> padded [nnode_pad, 3] (new)."""
    f = np.zeros((part.nnode_pad, 3), dtype=np.float64)
    f[part.perm] = np.asarray(loads)
    return f


def unshard_u(part: Partition, u: np.ndarray) -> np.ndarray:
    """Padded solution [nnode_pad, 3] (new numbering) -> [nnode, 3] (old)."""
    return np.asarray(u)[part.perm]
