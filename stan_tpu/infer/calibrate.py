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


@dataclasses.dataclass
class ShardedCalibrationProblem:
    """Chains x domain calibration: the same log-posterior as
    CalibrationProblem (identical priors/transforms, observation term as a
    masked grid sum), with the forward solve domain-sharded under shard_map
    (infer/forward.ShardedStencilForwardProblem). Feed `logp_grad_b()` to
    hmc.run_hmc(logp_grad_b=...) with the same 2-axis mesh."""

    fwd: object  # ShardedStencilForwardProblem
    w_grid: np.ndarray  # [3, NNX, NNY, NNZ] observation mask
    y_grid: np.ndarray  # observed values on the grid
    sigma_obs: float
    mu_logE: float = np.log(210000.0)
    sigma_logE: float = 1.0
    sigma_logs: float = 0.5
    infer_load: bool = False

    def theta_to_material(self, theta):
        """Unconstrained theta = (log_E, logit(2 nu), log_s) -> (lam, mu,
        load scale); the transform of CalibrationProblem.log_posterior."""
        nu = 0.5 * jax.nn.sigmoid(theta[1])
        lam, mu = fwd_mod.lame_from_E_nu(jnp.exp(theta[0]), nu)
        s = jnp.where(jnp.asarray(self.infer_load),
                      jnp.exp(theta[2]), 1.0)
        return lam, mu, s

    def prior_logp(self, theta):
        lp = -0.5 * ((theta[0] - self.mu_logE) / self.sigma_logE) ** 2
        lp = lp + jax.nn.log_sigmoid(theta[1]) + jax.nn.log_sigmoid(-theta[1])
        lp = lp + jnp.where(
            jnp.asarray(self.infer_load),
            -0.5 * (theta[2] / self.sigma_logs) ** 2,
            0.0,
        )
        return lp

    def logp_grad_b(self):
        """Batched [C, D] -> ([C], [C, D]) log-posterior value+gradient
        running the sharded forward (for hmc.run_chains)."""
        return self.fwd.make_batched_logp_grad(
            self.w_grid, self.y_grid, self.sigma_obs,
            self.theta_to_material, self.prior_logp,
        )

    constrain = staticmethod(CalibrationProblem.constrain)


def obs_grids(node_shape, obs_nodes, obs_dirs, y):
    """Scatter (node, dir) observations onto [3, NNX, NNY, NNZ] mask/value
    grids (meshgen flat numbering: id = i*nny*nnz + j*nnz + k). Duplicate
    (node, dir) pairs are refused — the grid form holds one value per DOF."""
    nnx, nny, nnz = node_shape
    nodes = np.asarray(obs_nodes, np.int64)
    dirs = np.asarray(obs_dirs, np.int64)
    pairs = set(zip(nodes.tolist(), dirs.tolist()))
    if len(pairs) != len(nodes):
        raise ValueError("duplicate (node, dir) observations")
    i = nodes // (nny * nnz)
    j = (nodes // nnz) % nny
    k = nodes % nnz
    w = np.zeros((3, nnx, nny, nnz))
    yg = np.zeros((3, nnx, nny, nnz))
    w[dirs, i, j, k] = 1.0
    yg[dirs, i, j, k] = np.asarray(y, np.float64)
    return w, yg


def make_sharded_problem(
    model: FEModel,
    mesh,
    obs_nodes: Sequence[int],
    obs_dirs: Sequence[int],
    y: np.ndarray,
    sigma_obs: float,
    *,
    domain_axis: str = "domain",
    chains_axis: str = "chains",
    dtype=None,
    cg_tol: float = 1.0e-8,
    infer_load: bool = False,
    **prior_kwargs,
) -> ShardedCalibrationProblem:
    """Build the chains x domain calibration problem (VERDICT r4 missing
    item 1). Raises if the mesh/model doesn't qualify for the sharded
    stencil forward — the caller should fall back to make_problem."""
    fwd = fwd_mod.build_sharded_stencil_forward(
        model, mesh, domain_axis=domain_axis, chains_axis=chains_axis,
        dtype=dtype, cg_tol=cg_tol,
    )
    if fwd is None:
        raise ValueError(
            "model does not qualify for the sharded stencil forward "
            "(structured HEX8 grid with NNX divisible by the domain axis)")
    w, yg = obs_grids(fwd.node_shape, obs_nodes, obs_dirs, y)
    return ShardedCalibrationProblem(
        fwd=fwd, w_grid=w, y_grid=yg, sigma_obs=float(sigma_obs),
        infer_load=infer_load, **prior_kwargs,
    )


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
