"""Multi-device tests on the virtual 8-device CPU mesh: the sharded solve
must match the single-device solve (SURVEY.md section 4 item d)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from stan_tpu.analysis.linear import solve_linear_statics
from stan_tpu.core import meshgen
from stan_tpu.parallel import partition as part_mod
from stan_tpu.parallel import sharded


def test_bfs_order_is_permutation():
    model = meshgen.hex_beam(4, 3, 2)
    order = part_mod.bfs_node_order(model.conn, model.nnode)
    assert sorted(order.tolist()) == list(range(model.nnode))


def test_partition_covers_all_elements():
    model = meshgen.hex_beam(5, 3, 2)
    p = part_mod.partition(model.conn, model.nnode, 4)
    assert (~p.pad_elem).sum() == model.nelem
    # every real slot holds the right connectivity
    new_conn = p.perm[model.conn]
    np.testing.assert_array_equal(p.conn[p.elem_owner, p.elem_pos], new_conn)


@pytest.mark.parametrize("ndev", [2, 8])
def test_sharded_solve_matches_single_device(ndev):
    model = meshgen.hex_beam(6, 3, 3)
    model.analysis.lin_solver_tolerance = 1e-12
    ref = solve_linear_statics(model, store=False)

    devices = np.array(jax.devices()[:ndev])
    mesh = Mesh(devices, axis_names=("domain",))
    form = model.formulation()
    op, part = sharded.build_sharded_operator(
        model.coords, model.conn, model.elem_d_matrices(), model.fix_mask(),
        form, ndev,
    )
    f = jnp.asarray(sharded.shard_rhs(part, model.load_vector()))
    res = sharded.sharded_pcg(mesh, op, f, tol=1e-12)
    u = sharded.unshard_u(part, np.asarray(res.u))
    assert bool(np.asarray(res.converged).reshape(-1)[0])
    np.testing.assert_allclose(u, ref.u, rtol=1e-8, atol=1e-12)


@pytest.mark.parametrize("ndev", [2, 4])
def test_ring_mode_selected_and_matches(ndev):
    """BFS-blocked partitions of beam meshes are ring-compatible; the ring
    halo exchange must give the same solution as the all_gather mode."""
    model = meshgen.hex_beam(8, 2, 2)
    mesh = Mesh(np.array(jax.devices()[:ndev]), axis_names=("domain",))
    op_ring, part = sharded.build_sharded_operator(
        model.coords, model.conn, model.elem_d_matrices(), model.fix_mask(),
        model.formulation(), ndev, prefer_ring=True,
    )
    assert op_ring.ring, "expected ring-compatible partition"
    op_ag, _ = sharded.build_sharded_operator(
        model.coords, model.conn, model.elem_d_matrices(), model.fix_mask(),
        model.formulation(), ndev, prefer_ring=False,
    )
    assert not op_ag.ring
    f = jnp.asarray(sharded.shard_rhs(part, model.load_vector()))
    u_ring = np.asarray(sharded.sharded_pcg(mesh, op_ring, f, tol=1e-12).u)
    u_ag = np.asarray(sharded.sharded_pcg(mesh, op_ag, f, tol=1e-12).u)
    np.testing.assert_allclose(u_ring, u_ag, rtol=1e-9, atol=1e-13)


def test_ring_rejected_when_not_compatible():
    """With more devices than the BFS frontier supports, ring must be
    rejected and the all_gather fallback used (still correct)."""
    model = meshgen.hex_beam(2, 2, 2)  # tiny: blocks too small for ring
    ndev = 8
    op, part = sharded.build_sharded_operator(
        model.coords, model.conn, model.elem_d_matrices(), model.fix_mask(),
        model.formulation(), ndev, prefer_ring=True,
    )
    # Either ring-compatible (fine) or fallback; solve must match regardless
    mesh = Mesh(np.array(jax.devices()[:ndev]), axis_names=("domain",))
    ref = solve_linear_statics(meshgen.hex_beam(2, 2, 2), store=False)
    f = jnp.asarray(sharded.shard_rhs(part, model.load_vector()))
    res = sharded.sharded_pcg(mesh, op, f, tol=1e-12)
    u = sharded.unshard_u(part, np.asarray(res.u))
    np.testing.assert_allclose(u, ref.u, rtol=1e-8, atol=1e-12)


def test_sharded_solve_deterministic():
    ndev = 4
    model = meshgen.hex_beam(4, 2, 2)
    mesh = Mesh(np.array(jax.devices()[:ndev]), axis_names=("domain",))
    op, part = sharded.build_sharded_operator(
        model.coords, model.conn, model.elem_d_matrices(), model.fix_mask(),
        model.formulation(), ndev,
    )
    f = jnp.asarray(sharded.shard_rhs(part, model.load_vector()))
    u1 = np.asarray(sharded.sharded_pcg(mesh, op, f, tol=1e-10).u)
    u2 = np.asarray(sharded.sharded_pcg(mesh, op, f, tol=1e-10).u)
    assert np.array_equal(u1, u2)
