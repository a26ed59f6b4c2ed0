"""Sharded stencil fast path: multi-device apply and CG must match the
single-device stencil operator exactly (x-slab halo exchange, VERDICT r1
item 1; SURVEY.md section 5.7/5.8 halo-exchange-PCG obligation)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from stan_tpu.core import meshgen
from stan_tpu.fem import stencil
from stan_tpu.parallel import sharded_stencil as ss

pytestmark = pytest.mark.slow  # interpret-mode Pallas / large meshes: minutes on CPU



def _mesh(ndev):
    return Mesh(np.array(jax.devices()[:ndev]), axis_names=("domain",))


def _rand(shape, dtype, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), shape, dtype=dtype)


@pytest.mark.parametrize("ndev", [1, 2, 4, 8])
def test_sharded_apply_matches_single(ndev):
    m = meshgen.hex_beam(7, 4, 3)  # NNX = 8 node planes: divisible by all
    sop = stencil.build_stencil_operator(m)
    op = ss.build_sharded_stencil_operator(m, ndev)
    assert op is not None
    u = _rand((3,) + sop.node_shape, sop.dtype)
    f_ref = np.asarray(sop.apply(u))
    f = np.asarray(ss.sharded_apply(_mesh(ndev), op, u))
    scale = np.abs(f_ref).max()
    np.testing.assert_allclose(f, f_ref, atol=1e-12 * scale)


def test_sharded_apply_boundary_rows_exact():
    """Global x faces live on the edge devices; their L/H corrections must
    land exactly where the single-device operator puts them."""
    ndev = 4
    m = meshgen.hex_beam(7, 3, 3)
    sop = stencil.build_stencil_operator(m)
    op = ss.build_sharded_stencil_operator(m, ndev)
    u = _rand((3,) + sop.node_shape, sop.dtype, seed=3)
    f_ref = np.asarray(sop.apply_raw(u))
    # raw apply via the spmd path: free everything so masking is identity
    import dataclasses
    op_free = dataclasses.replace(
        op, free_mask=jnp.ones_like(op.free_mask))
    f = np.asarray(ss.sharded_apply(_mesh(ndev), op_free, u))
    scale = np.abs(f_ref).max()
    for plane in (0, -1):
        np.testing.assert_allclose(f[:, plane], f_ref[:, plane],
                                   atol=1e-12 * scale)
    np.testing.assert_allclose(f, f_ref, atol=1e-12 * scale)


@pytest.mark.parametrize("ndev", [2, 8])
def test_sharded_stencil_cg_matches_single(ndev):
    m = meshgen.hex_beam(7, 3, 3)
    sop = stencil.build_stencil_operator(m)
    op = ss.build_sharded_stencil_operator(m, ndev)
    f = sop.to_grid(jnp.asarray(m.load_vector(), dtype=sop.dtype))

    from stan_tpu.solvers import cg as cg_mod
    ref = cg_mod.pcg(sop.apply, sop.free_mask * f, diag=sop.diagonal(),
                     tol=1e-12, ndof=3 * m.nnode)
    res = ss.sharded_stencil_pcg(_mesh(ndev), op, f, tol=1e-12)
    assert bool(np.asarray(res.converged).reshape(-1)[0])
    u_ref = np.asarray(ref.u)
    u = np.asarray(res.u)
    scale = np.abs(u_ref).max()
    np.testing.assert_allclose(u, u_ref, rtol=1e-8, atol=1e-10 * scale)


def test_sharded_stencil_cg_deterministic():
    ndev = 4
    m = meshgen.hex_beam(7, 3, 3)
    op = ss.build_sharded_stencil_operator(m, ndev)
    sop = stencil.build_stencil_operator(m)
    f = sop.to_grid(jnp.asarray(m.load_vector(), dtype=sop.dtype))
    mesh = _mesh(ndev)
    u1 = np.asarray(ss.sharded_stencil_pcg(mesh, op, f, tol=1e-10).u)
    u2 = np.asarray(ss.sharded_stencil_pcg(mesh, op, f, tol=1e-10).u)
    assert np.array_equal(u1, u2)


def test_indivisible_nnx_returns_none():
    m = meshgen.hex_beam(6, 3, 3)  # NNX = 7, not divisible by 2
    assert ss.build_sharded_stencil_operator(m, 2) is None
    # ...and the qualifying case still builds
    assert ss.build_sharded_stencil_operator(m, 7) is not None


def test_nonqualifying_mesh_returns_none():
    m = meshgen.hex_beam(1, 1, 1)  # too small for the stencil itself
    assert ss.build_sharded_stencil_operator(m, 1) is None


# ---------------------------------------------------------------------------
# chains x domain composition (VERDICT r3 weak item 1 / next-round task 1)
# ---------------------------------------------------------------------------

def _chain_mesh(n_chain_dev, n_dom_dev):
    devs = np.array(jax.devices()[: n_chain_dev * n_dom_dev])
    return Mesh(devs.reshape(n_chain_dev, n_dom_dev),
                axis_names=("chains", "domain"))


def test_chain_batched_pcg_unequal_iters_2x4():
    """Regression for the MULTICHIP_r03 rc=134 rendezvous abort: on a 2x4
    (chains x domain) mesh, per-chain RHS are crafted so the two chain rows
    converge in DIFFERENT iteration counts. Before pcg grew sync_axes the
    row that finished first stopped issuing halo ppermutes and XLA's
    collective rendezvous aborted the launch after ~40 s; with the fix the
    launch runs a uniform trip count with converged chains masked to
    no-ops, so results and per-chain iteration counts are exact."""
    n_chain_dev, n_dom_dev = 2, 4
    mesh = _chain_mesh(n_chain_dev, n_dom_dev)
    m = meshgen.hex_beam(2 * n_dom_dev - 1, 2, 2)
    sop = stencil.build_stencil_operator(m)
    op = ss.build_sharded_stencil_operator(m, n_dom_dev)
    assert op is not None

    f0 = sop.to_grid(jnp.asarray(m.load_vector(), dtype=sop.dtype))
    rough = _rand(f0.shape, f0.dtype, seed=7)
    # Row 0 (chains 0-1): smooth load. Row 1 (chains 2-3): rough load —
    # different spectra, different CG iteration counts.
    f_chains = jnp.stack([f0, 1.3 * f0, f0 + rough, f0 - 0.7 * rough])

    res = ss.chain_batched_pcg(mesh, op, f_chains, tol=1e-10, maxiter=400)
    iters = np.asarray(res.iters)
    assert np.all(np.asarray(res.converged))
    # The deadlock precondition: the two chain rows really did take
    # different iteration counts.
    row0 = iters[: 2]
    row1 = iters[2:]
    assert row0.max() != row1.max(), iters

    # Per-chain results match independent single-device solves, and the
    # masked no-op iterations did not perturb converged chains.
    from stan_tpu.solvers import cg as cg_mod
    for c in range(4):
        ref = cg_mod.pcg(sop.apply, sop.free_mask * f_chains[c],
                         diag=sop.diagonal(), tol=1e-10, maxiter=400,
                         ndof=3 * m.nnode)
        np.testing.assert_allclose(
            np.asarray(res.u[c]), np.asarray(ref.u), rtol=1e-8,
            atol=1e-10 * max(1e-30, float(np.abs(np.asarray(ref.u)).max())))
        # Sharded psum reductions round differently than single-device
        # sums, so counts can differ by a few near the threshold — but a
        # masked-no-op bug would run every chain to the launch max.
        assert abs(int(iters[c]) - int(ref.iters)) <= 5, (
            c, iters, int(ref.iters))


def test_chain_batched_pcg_shared_f_scales():
    """Shared-f + per-chain scales mode on a 4x2 mesh; scaling the RHS must
    not change the solution direction (linear solve): u_c = s_c * u_1."""
    mesh = _chain_mesh(4, 2)
    m = meshgen.hex_beam(3, 3, 3)
    sop = stencil.build_stencil_operator(m)
    op = ss.build_sharded_stencil_operator(m, 2)
    f0 = sop.to_grid(jnp.asarray(m.load_vector(), dtype=sop.dtype))
    scales = jnp.asarray([0.5, 1.0, 2.0, -1.0], f0.dtype)
    res = ss.chain_batched_pcg(mesh, op, f0, scales=scales, tol=1e-11)
    assert np.all(np.asarray(res.converged))
    u = np.asarray(res.u)
    base = u[1]
    for c, s in enumerate(np.asarray(scales)):
        np.testing.assert_allclose(
            u[c], s * base, rtol=1e-6,
            atol=1e-9 * max(1e-30, float(np.abs(base).max())))


def test_chain_batched_pcg_requires_chains_axis():
    m = meshgen.hex_beam(3, 3, 3)
    op = ss.build_sharded_stencil_operator(m, 2)
    sop = stencil.build_stencil_operator(m)
    f0 = sop.to_grid(jnp.asarray(m.load_vector(), dtype=sop.dtype))
    with pytest.raises(ValueError, match="chains"):
        ss.chain_batched_pcg(_mesh(2), op, f0,
                             scales=jnp.ones((2,), f0.dtype))
