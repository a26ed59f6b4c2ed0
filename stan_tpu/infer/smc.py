"""Sequential Monte Carlo: adaptive-tempering particle sampler.

New capability (BASELINE.json: "SMC load-uncertainty UQ: particle ensemble
of FEM solves with all-gather resampling"). Standard adaptive-tempering SMC
(Del Moral et al.):

  * particles start from the prior; the likelihood is annealed prior ->
    posterior with the inverse-temperature schedule chosen adaptively so
    each step's effective sample size stays near `ess_target`;
  * systematic resampling whenever ESS drops below the threshold;
  * particles rejuvenated with a few random-walk Metropolis steps at the
    current temperature (scale adapted from the particle covariance).

Particle axis = leading vmap axis; on a device mesh the weights/ESS
reductions are global sums over the sharded axis (XLA inserts psum when the
particle axis is sharded via NamedSharding) and systematic resampling
gathers across shards — the all-gather component of SURVEY.md §2.5.
Bisection for the next temperature runs on host (cheap scalar search)
against device-computed log-likelihoods.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class SMCResult:
    particles: np.ndarray  # [N, D] posterior particles (equal weights)
    log_evidence: float  # marginal-likelihood estimate
    temperatures: np.ndarray  # annealing schedule actually used
    acceptance: np.ndarray  # rejuvenation acceptance per stage


def _systematic_resample(rng, log_w, n):
    """Systematic resampling indices from normalized log-weights."""
    w = jnp.exp(log_w - jax.scipy.special.logsumexp(log_w))
    positions = (jax.random.uniform(rng) + jnp.arange(n)) / n
    cum = jnp.cumsum(w)
    return jnp.searchsorted(cum, positions)


def run_smc(
    log_prior: Callable[[jax.Array], jax.Array],
    log_likelihood: Callable[[jax.Array], jax.Array],
    sample_prior: Callable[[jax.Array, int], jax.Array],
    rng: jax.Array,
    *,
    n_particles: int = 512,
    ess_target: float = 0.5,
    n_mcmc: int = 5,
    max_stages: int = 50,
    mesh=None,
    particle_axis: str = "chains",
) -> SMCResult:
    """Adaptive-tempering SMC from prior to prior*likelihood."""
    k_init, rng = jax.random.split(jnp.asarray(rng))
    particles = jnp.asarray(sample_prior(k_init, n_particles))  # [N, D]

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        sharding = NamedSharding(mesh, P(particle_axis))
        particles = jax.device_put(particles, sharding)

    loglike_v = jax.jit(jax.vmap(log_likelihood))
    logprior_v = jax.jit(jax.vmap(log_prior))

    @jax.jit
    def mcmc_sweep(rng, particles, beta, scale):
        """n_mcmc random-walk Metropolis steps at temperature beta."""

        def logp(theta):
            return log_prior(theta) + beta * log_likelihood(theta)

        logp_v = jax.vmap(logp)

        def step(carry, key):
            parts, lp, n_acc = carry
            k1, k2 = jax.random.split(key)
            prop = parts + scale * jax.random.normal(
                k1, parts.shape, parts.dtype
            )
            lp_prop = logp_v(prop)
            lp_prop = jnp.where(jnp.isfinite(lp_prop), lp_prop, -jnp.inf)
            accept = (
                jnp.log(jax.random.uniform(k2, (parts.shape[0],)))
                < lp_prop - lp
            )
            parts = jnp.where(accept[:, None], prop, parts)
            lp = jnp.where(accept, lp_prop, lp)
            return (parts, lp, n_acc + jnp.mean(accept)), None

        lp0 = logp_v(particles)
        keys = jax.random.split(rng, n_mcmc)
        (parts, _, n_acc), _ = jax.lax.scan(
            step, (particles, lp0, jnp.asarray(0.0, particles.dtype)), keys
        )
        return parts, n_acc / n_mcmc

    beta = 0.0
    temps = [0.0]
    accs = []
    log_Z = 0.0
    rng = np.asarray(rng)
    rng_j = jnp.asarray(rng)

    for _ in range(max_stages):
        ll = loglike_v(particles)  # [N]
        ll_np = np.asarray(ll)
        ll_np = np.where(np.isfinite(ll_np), ll_np, -1e300)

        # Host bisection: largest delta_beta with ESS >= ess_target * N
        def ess_of(delta):
            w = delta * ll_np
            w = w - w.max()
            ew = np.exp(w)
            return (ew.sum() ** 2) / (ew**2).sum()

        target = ess_target * n_particles
        lo, hi = 0.0, 1.0 - beta
        if ess_of(hi) >= target:
            delta = hi
        else:
            for _ in range(50):
                mid = 0.5 * (lo + hi)
                if ess_of(mid) >= target:
                    lo = mid
                else:
                    hi = mid
            delta = lo
        delta = max(delta, 1e-6)
        beta = min(1.0, beta + delta)
        temps.append(beta)

        # Incremental evidence: log mean exp(delta * ll)
        w = delta * ll_np
        wmax = w.max()
        log_Z += wmax + np.log(np.mean(np.exp(w - wmax)))

        # Resample + rejuvenate
        rng_j, k_res, k_mcmc = jax.random.split(rng_j, 3)
        idx = _systematic_resample(k_res, jnp.asarray(delta) * ll, n_particles)
        particles = particles[idx]
        scale = 0.5 * jnp.std(particles, axis=0) + 1e-8
        particles, acc = mcmc_sweep(k_mcmc, particles, beta, scale)
        accs.append(float(acc))

        if beta >= 1.0:
            break

    return SMCResult(
        particles=np.asarray(particles),
        log_evidence=float(log_Z),
        temperatures=np.asarray(temps),
        acceptance=np.asarray(accs),
    )
