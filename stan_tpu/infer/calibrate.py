"""FEM calibration: posterior over material/load parameters from displacements.

The end-to-end inference task of BASELINE.json: given noisy displacement
observations at selected DOFs, infer theta = (log E, nu, log load-scale)
with the linear FEM solve as forward model (implicit-diff gradients,
infer/forward.py). Provides the log-posterior builder plus thin wrappers
over HMC / NUTS / VI / SMC.

Priors (weakly informative, transformable by the caller):
  log E        ~ Normal(mu_logE, sigma_logE)
  nu           ~ Uniform(0, 0.5)   via logit transform with Jacobian
  log s (load) ~ Normal(0, sigma_logs)
Likelihood: y ~ Normal(u_obs(theta), sigma_obs), independent per observed DOF.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from stan_tpu.core.model import FEModel
from stan_tpu.infer import forward as fwd_mod


@dataclasses.dataclass
class CalibrationProblem:
    fwd: object  # ForwardProblem or StencilForwardProblem (forward.py)
    nelem: int
    obs_idx: np.ndarray  # [n_obs, 2] (node, dir) indices
    y: jax.Array  # [n_obs] observations
    sigma_obs: float
    mu_logE: float = np.log(210000.0)
    sigma_logE: float = 1.0
    sigma_logs: float = 0.5
    infer_load: bool = False  # fix log s = 0 unless enabled

    def u_obs(self, theta: jax.Array) -> jax.Array:
        """Forward displacements at observed DOFs; theta = (log_E, nu, log_s)."""
        u_fn = fwd_mod.displacement_fn(self.fwd, self.nelem)
        u = u_fn(theta)
        return u[self.obs_idx[:, 0], self.obs_idx[:, 1]]

    def log_posterior(self, theta: jax.Array) -> jax.Array:
        """Unnormalized log posterior in the unconstrained parameterization
        theta = (log_E, logit(2*nu), log_s)."""
        log_E = theta[0]
        # nu = 0.5 * sigmoid(t): maps R -> (0, 0.5)
        t_nu = theta[1]
        nu = 0.5 * jax.nn.sigmoid(t_nu)
        log_s = jnp.where(jnp.asarray(self.infer_load), theta[2], 0.0)

        pred = self.u_obs(jnp.stack([log_E, nu, log_s]))
        resid = (self.y - pred) / self.sigma_obs
        loglike = -0.5 * jnp.sum(resid**2)

        lp = -0.5 * ((log_E - self.mu_logE) / self.sigma_logE) ** 2
        # logit-uniform Jacobian: log d(nu)/d(t) = log(0.5) + log sig + log(1-sig)
        lp = lp + jax.nn.log_sigmoid(t_nu) + jax.nn.log_sigmoid(-t_nu)
        lp = lp + jnp.where(
            jnp.asarray(self.infer_load),
            -0.5 * (log_s / self.sigma_logs) ** 2,
            0.0,
        )
        return loglike + lp

    # Convenience: constrained draws from samples in unconstrained space
    @staticmethod
    def constrain(samples: np.ndarray) -> np.ndarray:
        """[..., 3] unconstrained -> (E, nu, s)."""
        E = np.exp(samples[..., 0])
        nu = 0.5 / (1.0 + np.exp(-samples[..., 1]))
        s = np.exp(samples[..., 2])
        return np.stack([E, nu, s], axis=-1)


def make_problem(
    model: FEModel,
    obs_nodes: Sequence[int],
    obs_dirs: Sequence[int],
    y: np.ndarray,
    sigma_obs: float,
    *,
    dtype=None,
    cg_tol: float = 1.0e-8,
    infer_load: bool = False,
    prefer_stencil: bool = True,
    **prior_kwargs,
) -> CalibrationProblem:
    fwd = fwd_mod.build_forward(model, dtype=dtype, cg_tol=cg_tol,
                                prefer_stencil=prefer_stencil)
    obs_idx = np.stack(
        [np.asarray(obs_nodes, np.int64), np.asarray(obs_dirs, np.int64)],
        axis=1,
    )
    return CalibrationProblem(
        fwd=fwd,
        nelem=model.nelem,
        obs_idx=obs_idx,
        y=jnp.asarray(y, dtype=fwd.dtype),
        sigma_obs=float(sigma_obs),
        infer_load=infer_load,
        **prior_kwargs,
    )
