"""Automatic Differentiation Variational Inference (mean-field Gaussian).

New capability (BASELINE.json: "NUTS/HMC, VI, and SMC over material
parameters"). Standard ADVI (Kucukelbir et al.): q(theta) = N(mu,
diag(exp(log_sigma)^2)), reparameterized ELBO gradients, optax Adam.
Monte-Carlo ELBO samples vmap over a draws axis; the whole optimization is
one lax.scan inside jit.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax


@dataclasses.dataclass
class VIResult:
    mu: np.ndarray  # [D] posterior mean (Gaussian approx)
    sigma: np.ndarray  # [D] posterior stddev
    elbo_trace: np.ndarray  # [n_steps]

    def sample(self, rng, n: int) -> np.ndarray:
        eps = jax.random.normal(rng, (n, self.mu.shape[0]))
        return np.asarray(self.mu + eps * self.sigma)


def run_advi(
    logp_fn: Callable[[jax.Array], jax.Array],
    theta0: jax.Array,  # [D] initial mean
    rng: jax.Array,
    *,
    n_steps: int = 2000,
    n_elbo_samples: int = 8,
    learning_rate: float = 2e-2,
) -> VIResult:
    theta0 = jnp.asarray(theta0)
    dim = theta0.shape[0]
    params0 = {
        "mu": theta0,
        "log_sigma": jnp.full((dim,), -2.0, theta0.dtype),
    }
    opt = optax.adam(learning_rate)

    def neg_elbo(params, key):
        eps = jax.random.normal(key, (n_elbo_samples, dim), theta0.dtype)
        sigma = jnp.exp(params["log_sigma"])
        thetas = params["mu"] + eps * sigma
        logps = jax.vmap(logp_fn)(thetas)
        logps = jnp.where(jnp.isfinite(logps), logps, -1e30)
        # Gaussian entropy: 0.5*D*log(2*pi*e) + sum(log_sigma)
        entropy = jnp.sum(params["log_sigma"]) + 0.5 * dim * (
            1.0 + jnp.log(2.0 * jnp.pi)
        )
        return -(jnp.mean(logps) + entropy)

    @jax.jit
    def fit(params, rng):
        opt_state = opt.init(params)

        def step(carry, key):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(neg_elbo)(params, key)
            updates, opt_state = opt.update(grads, opt_state)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), -loss

        keys = jax.random.split(rng, n_steps)
        (params, _), elbos = jax.lax.scan(step, (params, opt_state), keys)
        return params, elbos

    params, elbos = fit(params0, rng)
    return VIResult(
        mu=np.asarray(params["mu"]),
        sigma=np.asarray(jnp.exp(params["log_sigma"])),
        elbo_trace=np.asarray(elbos),
    )
