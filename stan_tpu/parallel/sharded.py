"""SPMD stiffness operator + CG over a device mesh (the "domain" axis).

The distributed-communication backend of the framework (SURVEY.md section
5.8): the reference has none (single process, .NET TPL threads +
lock-protected shared memory, SolverFunctions.cs:129-174); here the solve is
sharded over TPU devices with XLA collectives riding ICI. Two exchange
modes, chosen by the partitioner:

  * ring halo exchange (preferred): with BFS-blocked partitions every
    element's nodes live in the owner block or its immediate neighbors, so
    the SpMV exchanges only the two neighbor blocks via `ppermute` (u out,
    partial forces back) — O(block) traffic per device instead of the full
    vector, the FEM analogue of ring attention's neighbor passing
    (SURVEY.md §5.7);
  * all_gather fallback: assemble the full padded node vector on every
    device, `psum_scatter` partial forces back — correct for any partition.

CG dot products / norms: local partial sums + `psum` (solvers/cg.py takes
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
      inc_idx:   i32[ndev, nnode_pad, maxdeg]  incidence transpose per shard
                 (all_gather mode; see operator.node_incidence)
      conn_ext:  i32[ndev*epb, nn]   extended-local numbering, ring mode
                 (index into [3*block): left halo | own | right halo)
      inc_ext:   i32[ndev, 3*block, maxdeg]    incidence over the extended
                 range, ring mode
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
    inc_idx: Optional[jax.Array] = None
    ring: bool = False
    conn_ext: Optional[jax.Array] = None
    inc_ext: Optional[jax.Array] = None


_LEAF_FIELDS = ("conn", "dN", "detJw", "D", "free_mask", "diag",
                "inc_idx", "conn_ext", "inc_ext")
_AUX_FIELDS = ("nnode_pad", "block", "form", "axis", "ring")

jax.tree_util.register_pytree_node(
    ShardedOperator,
    lambda op: (
        tuple(getattr(op, f) for f in _LEAF_FIELDS),
        tuple(getattr(op, f) for f in _AUX_FIELDS),
    ),
    lambda aux, leaves: ShardedOperator(
        **dict(zip(_LEAF_FIELDS, leaves)), **dict(zip(_AUX_FIELDS, aux))
    ),
)


def operator_specs(op: ShardedOperator) -> ShardedOperator:
    """PartitionSpecs pytree matching the global-flat layout (shard_map)."""
    ax = op.axis
    return ShardedOperator(
        conn=P(ax), dN=P(ax), detJw=P(ax), D=P(ax),
        free_mask=P(ax, None), diag=P(ax, None),
        inc_idx=None if op.inc_idx is None else P(ax, None, None),
        conn_ext=None if op.conn_ext is None else P(ax),
        inc_ext=None if op.inc_ext is None else P(ax, None, None),
        nnode_pad=op.nnode_pad, block=op.block, form=op.form, axis=ax,
        ring=op.ring,
    )


def _ring_perms(n: int):
    fwd = [(i, (i + 1) % n) for i in range(n)]  # send to right neighbor
    bwd = [(i, (i - 1) % n) for i in range(n)]  # send to left neighbor
    return fwd, bwd


def _gather_scatter_apply(op_l: ShardedOperator, u_masked: jax.Array):
    """all_gather mode: full-vector exchange + psum_scatter reduction."""
    ax = op_l.axis
    u_full = jax.lax.all_gather(u_masked, ax, tiled=True)  # [nnode_pad, 3]
    u_e = u_full[op_l.conn]
    f_e = kernels.internal_force(op_l.dN, op_l.detJw, op_l.D, u_e)
    flat = f_e.reshape(-1, 3)
    if op_l.inc_idx is None:
        f_partial = jax.ops.segment_sum(
            flat, op_l.conn.reshape(-1), num_segments=op_l.nnode_pad
        )
    else:
        padded = jnp.concatenate(
            [flat, jnp.zeros((1, 3), dtype=flat.dtype)], axis=0
        )
        f_partial = padded[op_l.inc_idx[0]].sum(axis=1)
    return jax.lax.psum_scatter(
        f_partial, ax, scatter_dimension=0, tiled=True
    )  # [block, 3]


def _ring_apply(op_l: ShardedOperator, u_masked: jax.Array):
    """ring mode: neighbor-halo ppermute out, partial forces ppermute back."""
    ax = op_l.axis
    n = jax.lax.axis_size(ax)
    fwd, bwd = _ring_perms(n)
    b = op_l.block
    # receive left neighbor's block (they send right = fwd perm) and right
    # neighbor's block (they send left = bwd perm)
    from_left = jax.lax.ppermute(u_masked, ax, fwd)
    from_right = jax.lax.ppermute(u_masked, ax, bwd)
    u_ext = jnp.concatenate([from_left, u_masked, from_right], axis=0)
    u_e = u_ext[op_l.conn_ext]
    f_e = kernels.internal_force(op_l.dN, op_l.detJw, op_l.D, u_e)
    flat = f_e.reshape(-1, 3)
    padded = jnp.concatenate(
        [flat, jnp.zeros((1, 3), dtype=flat.dtype)], axis=0
    )
    f_ext = padded[op_l.inc_ext[0]].sum(axis=1)  # [3*block, 3]
    # send boundary contributions home: our left third belongs to the left
    # neighbor (bwd perm), right third to the right neighbor (fwd perm)
    to_left = f_ext[:b]
    to_right = f_ext[2 * b :]
    recv_from_right = jax.lax.ppermute(to_left, ax, bwd)
    recv_from_left = jax.lax.ppermute(to_right, ax, fwd)
    return f_ext[b : 2 * b] + recv_from_left + recv_from_right


def _local_apply(op_l: ShardedOperator, u_local: jax.Array) -> jax.Array:
    """Per-device masked SpMV body (inside shard_map); u_local [block, 3]."""
    m = op_l.free_mask  # [block, 3] local slice
    u_masked = m * u_local
    if op_l.ring:
        f_local = _ring_apply(op_l, u_masked)
    else:
        f_local = _gather_scatter_apply(op_l, u_masked)
    return m * f_local + (1.0 - m) * u_local


def build_sharded_operator(
    coords: np.ndarray,
    conn: np.ndarray,
    D_e: np.ndarray,
    fix_mask: np.ndarray,
    form: ElementFormulation,
    ndev: int,
    dtype=None,
    prefer_ring: bool = True,
) -> tuple[ShardedOperator, Partition]:
    """Partition the mesh and precompute padded sharded-layout arrays (host).

    When every element's (new-numbered) nodes fall inside the owner block
    or its immediate neighbors — always true for BFS-blocked partitions of
    meshes whose BFS frontier fits in a block — the ring halo-exchange mode
    is selected (prefer_ring); otherwise the all_gather fallback.
    """
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

    conn_flat = part.conn.reshape(ne_pad, nn)
    b = part.block

    # Ring compatibility: every element's nodes within owner-1..owner+1.
    owners_flat = np.repeat(np.arange(ndev), part.epb)
    node_dev = conn_flat // b  # device owning each referenced node
    pad_flat = part.pad_elem.reshape(-1)
    delta = node_dev - owners_flat[:, None]
    ring_ok = prefer_ring and ndev > 1 and bool(
        np.all((np.abs(delta) <= 1) | pad_flat[:, None])
    )

    conn_ext = None
    inc_ext = None
    inc = None
    if ring_ok:
        # Extended-local numbering: index into [left | own | right] blocks.
        conn_ext_np = conn_flat - (owners_flat[:, None] - 1) * b
        # Padding elements (conn=0) of devices > 1 would go negative; clamp
        # them into the (inert) local range.
        conn_ext_np = np.clip(conn_ext_np, 0, 3 * b - 1)
        conn_ext = jnp.asarray(conn_ext_np, dtype=jnp.int32)
        incs = []
        for d in range(ndev):
            rows = conn_ext_np[d * part.epb : (d + 1) * part.epb]
            incs.append(node_incidence(rows, 3 * b))
        maxdeg = max(i.shape[1] for i in incs) if incs else 0
        pad_val = part.epb * nn
        inc_np = np.full((ndev, 3 * b, maxdeg), pad_val, dtype=np.int64)
        for d, i in enumerate(incs):
            inc_np[d, :, : i.shape[1]] = i
        inc_ext = jnp.asarray(inc_np, dtype=jnp.int32)
    else:
        # Per-device incidence transpose over the global padded range.
        incs = [
            node_incidence(part.conn[d], part.nnode_pad) for d in range(ndev)
        ]
        maxdeg = max(i.shape[1] for i in incs)
        pad_val = part.epb * nn
        inc_np = np.full((ndev, part.nnode_pad, maxdeg), pad_val,
                         dtype=np.int64)
        for d, i in enumerate(incs):
            inc_np[d, :, : i.shape[1]] = i
        inc = jnp.asarray(inc_np, dtype=jnp.int32)

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
        inc_idx=inc,
        ring=ring_ok,
        conn_ext=conn_ext,
        inc_ext=inc_ext,
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
    axis = op.axis
    specs = operator_specs(op)
    ndof = op.nnode_pad * 3
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
        in_specs=(specs, P(axis, None)),
        out_specs=cg_mod.CGResult(
            u=P(axis, None), iters=P(), residual=P(), converged=P(),
            diverged=P(),
        ),
        check_vma=False,
    )
    return jax.jit(fn)(op, f)


def shard_rhs(part: Partition, loads: np.ndarray) -> np.ndarray:
    """[nnode, 3] loads (old numbering) -> padded [nnode_pad, 3] (new)."""
    f = np.zeros((part.nnode_pad, 3), dtype=np.float64)
    f[part.perm] = np.asarray(loads)
    return f


def unshard_u(part: Partition, u: np.ndarray) -> np.ndarray:
    """Padded solution [nnode_pad, 3] (new numbering) -> [nnode, 3] (old)."""
    return np.asarray(u)[part.perm]
