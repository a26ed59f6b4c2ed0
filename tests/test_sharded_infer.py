"""Chains x domain inference: the domain-sharded forward model inside the
inference layer (VERDICT r4 missing item 1).

The 2x4 (chains x domain) virtual-CPU-mesh calibration must reproduce the
single-device calibration: identical log-posterior values/gradients (the
forward solve only differs by CG tolerance and reduction order), and an
HMC run whose draws track the single-device driver's draws (same keys,
same batched kernels — divergence can only enter through the solver's
rounding, bounded over a short chain)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from stan_tpu.core import meshgen
from stan_tpu.fem import stencil, structured
from stan_tpu.infer import calibrate, forward, hmc

pytestmark = pytest.mark.slow


def _mesh24():
    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    return Mesh(devs, axis_names=("chains", "domain"))


def _problem_pair(nx=7, ny=3, nz=3, n_obs=24, cg_tol=1e-10):
    """(single-device problem, sharded problem, truth) on an NNX=8 grid
    divisible by the 4-wide domain axis."""
    model = meshgen.hex_beam(nx, ny, nz)
    true_theta = np.array([np.log(190000.0), 0.28, 0.0])
    fwd = forward.build_forward(model, cg_tol=cg_tol)
    u_true = np.asarray(
        forward.displacement_fn(fwd, model.nelem)(jnp.asarray(true_theta)))
    total = np.linalg.norm(u_true, axis=1)
    nodes = np.nonzero(total > 0.3 * total.max())[0][:n_obs]
    obs_nodes = np.repeat(nodes, 3)
    obs_dirs = np.tile([0, 1, 2], len(nodes))
    rng = np.random.default_rng(0)
    sigma = 1e-5
    y = u_true[obs_nodes, obs_dirs] + sigma * rng.normal(size=len(obs_nodes))
    prob1 = calibrate.make_problem(model, obs_nodes, obs_dirs, y, sigma,
                                   cg_tol=cg_tol)
    probS = calibrate.make_sharded_problem(
        model, _mesh24(), obs_nodes, obs_dirs, y, sigma, cg_tol=cg_tol)
    return model, prob1, probS


def test_slab_theta_apply_matches_full_grid():
    """The pure-jnp x-slab operator (ghost planes + dynamic face flags) is
    exact against the full-grid theta apply, split two ways, and is
    globally symmetric (the property custom_linear_solve relies on)."""
    model = meshgen.hex_beam(6, 5, 4)
    base = structured.build_structured_operator(model)
    tl = stencil.signature_tables(np.asarray(base.ke_lam, np.float64))
    tm = stencil.signature_tables(np.asarray(base.ke_mu, np.float64))
    cl = stencil.slab_correction_tables(tl)
    cm = stencil.slab_correction_tables(tm)
    lam, mu = 1.234, 0.789
    comb = {}
    for s in tl:
        comb[s] = {}
        for off in set(tl[s]) | set(tm[s]):
            comb[s][off] = (lam * np.asarray(tl[s].get(off, 0.0))
                            + mu * np.asarray(tm[s].get(off, 0.0)))
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.normal(size=(3, 7, 6, 5)))
    ref = stencil._stencil_apply_jnp(comb, stencil.delta_tables(comb), u)

    # whole grid as one slab (both flags set)
    u_ext = jnp.pad(u, ((0, 0), (1, 1), (0, 0), (0, 0)))
    got = stencil.slab_theta_apply(tl, tm, cl, cm, lam, mu, u_ext, 1.0, 1.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-12, atol=1e-12 * float(jnp.abs(ref).max()))

    # two slabs exchanging ghost planes
    s0, s1 = u[:, :4], u[:, 4:]
    e0 = jnp.concatenate([jnp.zeros_like(s0[:, :1]), s0, s1[:, :1]], axis=1)
    e1 = jnp.concatenate([s0[:, -1:], s1, jnp.zeros_like(s1[:, :1])], axis=1)
    g0 = stencil.slab_theta_apply(tl, tm, cl, cm, lam, mu, e0, 1.0, 0.0)
    g1 = stencil.slab_theta_apply(tl, tm, cl, cm, lam, mu, e1, 0.0, 1.0)
    got2 = jnp.concatenate([g0, g1], axis=1)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref),
                               rtol=1e-12, atol=1e-12 * float(jnp.abs(ref).max()))

    # symmetry: <v, K u> == <K v, u>
    v = jnp.asarray(rng.normal(size=(3, 7, 6, 5)))
    v_ext = jnp.pad(v, ((0, 0), (1, 1), (0, 0), (0, 0)))
    Kv = stencil.slab_theta_apply(tl, tm, cl, cm, lam, mu, v_ext, 1.0, 1.0)
    assert float(jnp.sum(v * ref)) == pytest.approx(
        float(jnp.sum(Kv * u)), rel=1e-12)


def test_sharded_logp_grad_matches_single_device():
    """The shard_map'd chains x domain log-posterior (value AND gradient)
    reproduces the single-device CalibrationProblem at multiple thetas —
    including the explicit domain-psum completion of the local cotangent
    contributions."""
    model, prob1, probS = _problem_pair()
    lgb_ref = jax.jit(jax.vmap(jax.value_and_grad(prob1.log_posterior)))
    lgb_shd = jax.jit(probS.logp_grad_b())
    thetas = jnp.asarray([
        [np.log(210000.0), 0.0, 0.0],
        [np.log(190000.0), 0.5, 0.0],
        [np.log(150000.0), -0.4, 0.0],
        [np.log(250000.0), 1.0, 0.0],
    ])
    v1, g1 = lgb_ref(thetas)
    v2, g2 = lgb_shd(thetas)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v1), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), rtol=1e-7,
                               atol=1e-9 * float(jnp.abs(g1).max()))


def test_sharded_hmc_calibration_matches_single_device():
    """A short HMC calibration on the 2x4 mesh — chains with DIFFERENT
    initial points, so per-chain CG iteration counts genuinely differ
    across chain rows (the MULTICHIP_r03 rendezvous-abort condition) —
    reproduces the single-device run's draws to solver-rounding accuracy.
    One full warmup (windowed adaptation) + sampling pass, gradient
    included in every leapfrog step."""
    model, prob1, probS = _problem_pair(ny=2, nz=2, n_obs=12)
    theta0 = jnp.asarray([
        [np.log(210000.0), 0.0, 0.0],
        [np.log(200000.0), 0.3, 0.0],
        [np.log(180000.0), -0.2, 0.0],
        [np.log(195000.0), 0.1, 0.0],
    ])
    kw = dict(n_samples=12, n_warmup=10, n_leapfrog=3, init_step=0.02)
    res_s = hmc.run_hmc(None, theta0, jax.random.PRNGKey(5),
                        mesh=probS.fwd.mesh, logp_grad_b=probS.logp_grad_b(),
                        **kw)
    res_u = hmc.run_hmc(prob1.log_posterior, theta0, jax.random.PRNGKey(5),
                        **kw)
    assert res_s.samples.shape == res_u.samples.shape == (4, 12, 3)
    np.testing.assert_allclose(res_s.samples, res_u.samples,
                               rtol=1e-4, atol=1e-5)
    assert np.isfinite(res_s.accept_rate).all()
