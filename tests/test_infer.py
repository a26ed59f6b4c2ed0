"""Inference layer tests: samplers on analytic targets + FEM calibration.

Statistical tests compare posterior moments against closed forms within
Monte-Carlo error (SURVEY.md §4 test strategy, item e)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stan_tpu.core import meshgen
from stan_tpu.infer import calibrate, forward, hmc, nuts, smc, vi

pytestmark = pytest.mark.slow  # interpret-mode Pallas / large meshes: minutes on CPU



# ---------------------------------------------------------------------------
# Analytic-target sanity: correlated 2-D Gaussian
# ---------------------------------------------------------------------------

_COV = np.array([[1.0, 0.6], [0.6, 2.0]])
_COV_INV = np.linalg.inv(_COV)
_MEAN = np.array([1.0, -2.0])


def _gauss_logp(theta):
    d = theta - jnp.asarray(_MEAN)
    return -0.5 * d @ jnp.asarray(_COV_INV) @ d


def _check_moments(samples, mean_tol, cov_tol):
    flat = samples.reshape(-1, samples.shape[-1])
    m = flat.mean(axis=0)
    C = np.cov(flat.T)
    np.testing.assert_allclose(m, _MEAN, atol=mean_tol)
    np.testing.assert_allclose(C, _COV, atol=cov_tol)


def test_hmc_gaussian_moments():
    theta0 = jnp.zeros((4, 2))
    res = hmc.run_hmc(
        _gauss_logp, theta0, jax.random.PRNGKey(0),
        n_samples=1500, n_warmup=500, n_leapfrog=12,
    )
    assert (res.accept_rate > 0.6).all()
    assert (res.rhat < 1.05).all()
    _check_moments(res.samples, mean_tol=0.12, cov_tol=0.35)


def test_nuts_gaussian_moments():
    theta0 = jnp.zeros((4, 2))
    res = nuts.run_nuts(
        _gauss_logp, theta0, jax.random.PRNGKey(1),
        n_samples=1200, n_warmup=400, max_depth=5,
    )
    assert (res.rhat < 1.05).all()
    _check_moments(res.samples, mean_tol=0.15, cov_tol=0.4)


def test_nuts_dynamic_cost():
    """Iterative NUTS pays for the realized trajectory, not 2^max_depth:
    on an easy 2-D Gaussian with max_depth=8, the measured gradient evals
    per draw must sit far below the worst case of 255 (VERDICT.md round-1
    weak item 4 — the static recursion paid full depth every transition)."""
    theta0 = jnp.zeros((4, 2))
    res = nuts.run_nuts(
        _gauss_logp, theta0, jax.random.PRNGKey(11),
        n_samples=300, n_warmup=300, max_depth=8,
    )
    assert res.evals_per_sample is not None
    assert float(res.evals_per_sample.mean()) < 100.0
    _check_moments(res.samples, mean_tol=0.3, cov_tol=0.9)


def test_nuts_subtree_matches_bruteforce_uturn():
    """The O(max_depth) checkpoint stack stops at exactly the leaf where a
    recursive builder would detect the first aligned power-of-two U-turn.

    Reference: an explicit numpy walk of the same leapfrog trajectory that
    checks every aligned span [n+1-2^k, n] directly."""
    from stan_tpu.infer.nuts import _Z, _build_subtree

    def logp_grad(th):
        return -0.5 * jnp.sum(th**2), -th

    max_depth = 6
    rng = np.random.default_rng(3)
    for trial in range(8):
        theta = rng.normal(size=2)
        p = rng.normal(size=2)
        step = float(rng.uniform(0.3, 1.2))
        # numpy replica of the leapfrog trajectory (inv_mass = 1)
        leaves_p = []
        th, pp = theta.copy(), p.copy()
        n_max = 2 ** max_depth
        for _ in range(n_max):
            pp = pp + 0.5 * step * (-th)
            th = th + step * pp
            pp = pp + 0.5 * step * (-th)
            leaves_p.append(pp.copy())
        # first leaf n where an aligned span ending at n U-turns
        def trailing_ones(n):
            t = 0
            while n & 1:
                t += 1
                n >>= 1
            return t

        expect_leaves, expect_turn = n_max, False
        for n in range(n_max):
            for k in range(1, trailing_ones(n) + 1):
                s = n + 1 - 2**k
                span = np.sum(leaves_p[s:n + 1], axis=0)
                if (span @ leaves_p[s] <= 0) or (span @ leaves_p[n] <= 0):
                    expect_leaves, expect_turn = n + 1, True
                    break
            if expect_turn:
                break

        z0 = _Z(jnp.asarray(theta), jnp.asarray(p),
                *map(jnp.asarray, logp_grad(jnp.asarray(theta))))
        energy0 = jnp.asarray(-0.5 * (theta @ theta) - 0.5 * (p @ p))
        sub = _build_subtree(
            logp_grad, jax.random.PRNGKey(trial), z0,
            jnp.int32(max_depth), jnp.asarray(step), jnp.ones(2),
            jnp.asarray(1.0), energy0, max_depth,
        )
        assert int(sub.n_leaves) == expect_leaves, (
            f"trial {trial}: stopped at {int(sub.n_leaves)} "
            f"leaves, brute force says {expect_leaves}")
        assert bool(sub.turning) == expect_turn


def test_advi_gaussian():
    res = vi.run_advi(
        _gauss_logp, jnp.zeros(2), jax.random.PRNGKey(2),
        n_steps=3000, learning_rate=2e-2,
    )
    np.testing.assert_allclose(res.mu, _MEAN, atol=0.1)
    # mean-field: marginal stddevs bounded by full-cov values but same order
    assert 0.4 < res.sigma[0] < 1.2
    assert 0.6 < res.sigma[1] < 1.7
    # ELBO improved
    assert res.elbo_trace[-100:].mean() > res.elbo_trace[:100].mean()


def test_smc_gaussian():
    def log_prior(theta):
        return -0.5 * jnp.sum((theta / 5.0) ** 2)

    def log_like(theta):
        return _gauss_logp(theta)

    def sample_prior(key, n):
        return 5.0 * jax.random.normal(key, (n, 2))

    res = smc.run_smc(
        log_prior, log_like, sample_prior, jax.random.PRNGKey(3),
        n_particles=2048, n_mcmc=10,
    )
    assert res.temperatures[-1] == 1.0
    # posterior = prior * N(mean, cov) with wide prior: close to N(mean, cov)
    m = res.particles.mean(axis=0)
    np.testing.assert_allclose(m, _MEAN, atol=0.25)
    C = np.cov(res.particles.T)
    np.testing.assert_allclose(np.diag(C), np.diag(_COV), rtol=0.4)


def test_hmc_chain_sharding_matches_shapes():
    """Chains sharded over the 8-device CPU mesh run and keep shapes."""
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:8])
    mesh = Mesh(devs, axis_names=("chains",))
    theta0 = jnp.zeros((8, 2))
    res = hmc.run_hmc(
        _gauss_logp, theta0, jax.random.PRNGKey(4),
        n_samples=200, n_warmup=200, n_leapfrog=8, mesh=mesh,
    )
    assert res.samples.shape == (8, 200, 2)
    _check_moments(res.samples, mean_tol=0.3, cov_tol=0.8)


def test_hmc_sharded_matches_unsharded():
    """Chain sharding is a placement choice, not a numerics choice: the
    sharded run reproduces the unsharded samples (same key) exactly."""
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("chains",))
    theta0 = jax.random.normal(jax.random.PRNGKey(7), (8, 2))
    kw = dict(n_samples=60, n_warmup=60, n_leapfrog=6)
    res_s = hmc.run_hmc(_gauss_logp, theta0, jax.random.PRNGKey(8),
                        mesh=mesh, **kw)
    res_u = hmc.run_hmc(_gauss_logp, theta0, jax.random.PRNGKey(8), **kw)
    np.testing.assert_allclose(res_s.samples, res_u.samples,
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(res_s.step_size, res_u.step_size, rtol=1e-12)


# ---------------------------------------------------------------------------
# Differentiable forward model
# ---------------------------------------------------------------------------

def _small_problem(sigma_obs=1e-5, infer_load=False):
    m = meshgen.hex_beam(3, 2, 2)
    true_theta = np.array([np.log(190000.0), 0.28, 0.0])
    fwd = forward.build_forward(m)
    u_fn = forward.displacement_fn(fwd, m.nelem)
    u_true = np.asarray(u_fn(jnp.asarray(true_theta)))
    # Observe all 3 displacement components on strongly-deflected nodes
    # (x/y components carry the Poisson-contraction signal that identifies nu)
    total = np.linalg.norm(u_true, axis=1)
    nodes = np.nonzero(total > 0.3 * total.max())[0]
    obs_nodes = np.repeat(nodes, 3)
    obs_dirs = np.tile([0, 1, 2], len(nodes))
    rng = np.random.default_rng(0)
    y = u_true[obs_nodes, obs_dirs] + sigma_obs * rng.normal(size=len(obs_nodes))
    prob = calibrate.make_problem(
        m, obs_nodes, obs_dirs, y, sigma_obs,
        mu_logE=np.log(210000.0), infer_load=infer_load,
    )
    return m, prob, true_theta


def test_forward_gradient_finite_difference():
    m, prob, true_theta = _small_problem()
    theta = jnp.asarray([np.log(200000.0), 0.0, 0.0])  # unconstrained
    lp = jax.jit(prob.log_posterior)
    g = jax.jit(jax.grad(prob.log_posterior))(theta)
    h = 1e-4
    for i in range(2):
        e = jnp.zeros(3).at[i].set(h)
        fd = (lp(theta + e) - lp(theta - e)) / (2 * h)
        assert float(g[i]) == pytest.approx(float(fd), rel=2e-3, abs=1e-3)


def test_stencil_forward_selected_and_matches_general():
    """build_forward auto-selects the stencil fast path on structured grids
    (VERDICT r3 missing item 3) and it reproduces the general-operator
    displacements and gradients."""
    m = meshgen.hex_beam(4, 3, 3)
    theta = jnp.asarray([np.log(190000.0), 0.28, 0.05])
    sf = forward.build_forward(m)
    gf = forward.build_forward(m, prefer_stencil=False)
    assert isinstance(sf, forward.StencilForwardProblem)
    assert isinstance(gf, forward.ForwardProblem)
    us = forward.displacement_fn(sf, m.nelem)(theta)
    ug = forward.displacement_fn(gf, m.nelem)(theta)
    np.testing.assert_allclose(np.asarray(us), np.asarray(ug),
                               rtol=1e-7, atol=1e-9 * float(jnp.abs(ug).max()))

    def loss(th, fw):
        u = forward.displacement_fn(fw, m.nelem)(th)
        return jnp.sum(u**2)

    gs = jax.grad(loss)(theta, sf)
    gg = jax.grad(loss)(theta, gf)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gg), rtol=1e-6)


def test_general_forward_gradient_finite_difference():
    """FD-gradient check pinned to the general gather/scatter path (the
    stencil path is covered by test_forward_gradient_finite_difference via
    auto-selection in _small_problem)."""
    m = meshgen.hex_beam(3, 2, 2)
    fwd = forward.build_forward(m, prefer_stencil=False)
    assert isinstance(fwd, forward.ForwardProblem)
    u_fn = forward.displacement_fn(fwd, m.nelem)
    theta = jnp.asarray([np.log(200000.0), 0.25, 0.0])

    def loss(th):
        return jnp.sum(u_fn(th) ** 2)

    g = jax.grad(loss)(theta)
    h = 1e-5
    for i in range(3):
        e = jnp.zeros(3).at[i].set(h)
        fd = (loss(theta + e) - loss(theta - e)) / (2 * h)
        assert float(g[i]) == pytest.approx(float(fd), rel=2e-4, abs=1e-12)


def test_calibration_recovers_truth_map():
    """VI MAP-quality check: posterior mean close to the generating theta."""
    m, prob, true_theta = _small_problem(sigma_obs=1e-6)
    res = vi.run_advi(
        prob.log_posterior,
        jnp.asarray([np.log(210000.0), 0.0, 0.0]),
        jax.random.PRNGKey(5),
        n_steps=1500, learning_rate=3e-2, n_elbo_samples=4,
    )
    E_est = float(np.exp(res.mu[0]))
    nu_est = 0.5 / (1.0 + np.exp(-res.mu[1]))
    assert E_est == pytest.approx(190000.0, rel=0.02)
    assert nu_est == pytest.approx(0.28, abs=0.02)


def test_calibration_hmc_posterior():
    """HMC on the FEM posterior: recovers truth within posterior spread."""
    m, prob, true_theta = _small_problem(sigma_obs=1e-6)
    theta0 = jnp.tile(jnp.asarray([[np.log(210000.0), 0.0, 0.0]]), (2, 1))
    res = hmc.run_hmc(
        prob.log_posterior, theta0, jax.random.PRNGKey(6),
        n_samples=300, n_warmup=300, n_leapfrog=8,
    )
    cons = calibrate.CalibrationProblem.constrain(res.samples)
    E_mean = cons[..., 0].mean()
    nu_mean = cons[..., 1].mean()
    assert E_mean == pytest.approx(190000.0, rel=0.05)
    assert nu_mean == pytest.approx(0.28, abs=0.03)
    assert (res.accept_rate > 0.5).all()
