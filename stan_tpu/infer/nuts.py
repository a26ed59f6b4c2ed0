"""No-U-Turn Sampler (multinomial variant) with static tree recursion.

New capability (BASELINE.json: "NUTS/HMC calibration of E and nu"). The
tree doubling is expressed as *static Python recursion* over tree depth, so
the whole transition is one jit-compilable computation graph with
`lax.cond` dispatch — no data-dependent Python control flow (XLA-friendly,
vmappable across chains; under vmap both cond branches execute, the usual
SPMD NUTS trade-off, so keep max_depth moderate for expensive targets like
FEM forward solves).

Implements the multinomial-sampling NUTS of Betancourt (2017): progressive
multinomial sampling from the trajectory weighted by exp(logp - kinetic),
generalized U-turn criterion checked for every power-of-two subtree.

Warmup (step size dual averaging + diagonal mass) reuses infer/hmc.py.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from stan_tpu.infer import hmc as hmc_mod


class _Z(NamedTuple):
    theta: jax.Array
    p: jax.Array
    logp: jax.Array
    grad: jax.Array


class _Tree(NamedTuple):
    z_left: _Z
    z_right: _Z
    z_prop: _Z  # multinomial proposal from this subtree
    log_weight: jax.Array  # logsumexp of canonical weights in subtree
    turning: jax.Array  # bool
    diverging: jax.Array  # bool
    sum_p: jax.Array  # sum of momenta (generalized U-turn)
    sum_accept: jax.Array  # sum over leaves of min(1, exp(e - e0))
    n_leaves: jax.Array  # leaf count (for the mean accept statistic)


def _leapfrog_step(logp_grad, z: _Z, step, inv_mass, direction):
    eps = direction * step
    p = z.p + 0.5 * eps * z.grad
    theta = z.theta + eps * inv_mass * p
    logp, grad = logp_grad(theta)
    p = p + 0.5 * eps * grad
    return _Z(theta, p, logp, grad)


def _energy(z: _Z, inv_mass):
    return z.logp - 0.5 * jnp.sum(inv_mass * z.p**2)


def _is_turning(z_left: _Z, z_right: _Z, sum_p, inv_mass):
    """Generalized U-turn: momentum projected on the trajectory span."""
    dr = inv_mass * sum_p
    left = jnp.sum(dr * z_left.p) <= 0.0
    right = jnp.sum(dr * z_right.p) <= 0.0
    return jnp.logical_or(left, right)


def _combine(rng, first: _Tree, second: _Tree, inv_mass, direction):
    """Merge two adjacent subtrees (first is nearer the start point)."""
    z_left = jax.tree_util.tree_map(
        lambda a, b: jnp.where(direction > 0, a, b), first.z_left, second.z_left
    )
    z_right = jax.tree_util.tree_map(
        lambda a, b: jnp.where(direction > 0, b, a), first.z_right, second.z_right
    )
    log_w = jnp.logaddexp(first.log_weight, second.log_weight)
    # Multinomial: take second's proposal with prob exp(lw2 - lw)
    take2 = jnp.log(jax.random.uniform(rng)) < second.log_weight - log_w
    z_prop = jax.tree_util.tree_map(
        lambda a, b: jnp.where(take2, b, a), first.z_prop, second.z_prop
    )
    sum_p = first.sum_p + second.sum_p
    turning = jnp.logical_or(
        jnp.logical_or(first.turning, second.turning),
        _is_turning(z_left, z_right, sum_p, inv_mass),
    )
    return _Tree(
        z_left, z_right, z_prop, log_w, turning,
        jnp.logical_or(first.diverging, second.diverging), sum_p,
        first.sum_accept + second.sum_accept,
        first.n_leaves + second.n_leaves,
    )


_MAX_DELTA_ENERGY = 1000.0  # Stan's divergence threshold


def _build_tree(logp_grad, rng, z_edge: _Z, depth, step, inv_mass,
                direction, energy0):
    """Static recursion: subtree of 2^depth leaves grown from z_edge."""
    if depth == 0:
        z = _leapfrog_step(logp_grad, z_edge, step, inv_mass, direction)
        e = _energy(z, inv_mass)
        delta = e - energy0
        diverging = delta < -_MAX_DELTA_ENERGY
        log_w = jnp.where(jnp.isfinite(delta), delta, -jnp.inf)
        accept = jnp.where(
            jnp.isfinite(delta), jnp.minimum(1.0, jnp.exp(delta)), 0.0
        )
        return _Tree(
            z, z, z, log_w,
            jnp.asarray(False), diverging, z.p,
            accept, jnp.asarray(1.0, z.theta.dtype),
        )
    k1, k2, k3 = jax.random.split(rng, 3)
    half = _build_tree(logp_grad, k1, z_edge, depth - 1, step, inv_mass,
                       direction, energy0)

    def grow(_):
        # the outward edge of `half` is z_right when direction>0 else z_left
        edge = jax.tree_util.tree_map(
            lambda a, b: jnp.where(direction > 0, a, b),
            half.z_right, half.z_left,
        )
        second = _build_tree(logp_grad, k2, edge, depth - 1, step, inv_mass,
                             direction, energy0)
        return _combine(k3, half, second, inv_mass, direction)

    def stop(_):
        return half

    return jax.lax.cond(
        jnp.logical_or(half.turning, half.diverging), stop, grow, None
    )


def nuts_transition(logp_grad, rng, state: hmc_mod.HMCState, step, inv_mass,
                    max_depth: int):
    """One NUTS transition. Returns (state, accept_stat)."""
    k_mom, k_dir, k_tree = jax.random.split(rng, 3)
    p0 = jax.random.normal(k_mom, state.theta.shape, state.theta.dtype)
    p0 = p0 * jnp.sqrt(1.0 / inv_mass)
    z0 = _Z(state.theta, p0, state.logp, state.grad)
    energy0 = _energy(z0, inv_mass)

    init = _Tree(z0, z0, z0, jnp.asarray(0.0, state.theta.dtype),
                 jnp.asarray(False), jnp.asarray(False), p0,
                 jnp.asarray(1.0, state.theta.dtype),
                 jnp.asarray(1.0, state.theta.dtype))

    def doubling(carry, key):
        tree, depth_done = carry
        kd, kb, kc = jax.random.split(key, 3)
        direction = jnp.where(
            jax.random.bernoulli(kd), 1.0, -1.0
        ).astype(state.theta.dtype)

        def grow(_):
            edge = jax.tree_util.tree_map(
                lambda a, b: jnp.where(direction > 0, a, b),
                tree.z_right, tree.z_left,
            )
            # subtree of the same size as the current tree
            sub = _build_tree(logp_grad, kb, edge, depth_done, step,
                              inv_mass, direction, energy0)
            return _combine(kc, tree, sub, inv_mass, direction)

        def stop(_):
            return tree

        new = jax.lax.cond(
            jnp.logical_or(tree.turning, tree.diverging), stop, grow, None
        )
        return (new, depth_done + 1), None

    # Python loop over doublings (static max_depth); each doubling's subtree
    # size is 2^depth via the static recursion above.
    carry = (init, 0)
    keys = jax.random.split(k_tree, max_depth)
    for d in range(max_depth):
        carry, _ = doubling(carry, keys[d])
    tree, _ = carry

    new_state = hmc_mod.HMCState(
        tree.z_prop.theta, tree.z_prop.logp, tree.z_prop.grad
    )
    # Stan's accept statistic: mean Metropolis ratio over trajectory leaves.
    accept = tree.sum_accept / tree.n_leaves
    return new_state, accept


def run_nuts(
    logp_fn: Callable[[jax.Array], jax.Array],
    theta0: jax.Array,
    rng: jax.Array,
    *,
    n_samples: int = 1000,
    n_warmup: int = 500,
    max_depth: int = 6,
    init_step: float = 0.1,
    target_accept: float = 0.8,
    mesh=None,
    chain_axis: str = "chains",
) -> hmc_mod.HMCResult:
    """NUTS with HMC-style warmup; same chain vmap/sharding as run_hmc."""
    theta0 = jnp.asarray(theta0)
    n_chains, dim = theta0.shape
    val_grad = jax.value_and_grad(logp_fn)

    def logp_grad(theta):
        v, g = val_grad(theta)
        v = jnp.where(jnp.isfinite(v), v, -jnp.inf)
        g = jnp.where(jnp.isfinite(g), g, 0.0)
        return v, g

    def transition(rng_i, state, step, inv_mass):
        return nuts_transition(logp_grad, rng_i, state, step, inv_mass,
                               max_depth)

    def warmup_scan(carry, rng_i):
        state, da, mean, m2, cnt, inv_mass = carry
        state, ap = transition(rng_i, state, jnp.exp(da.log_step), inv_mass)
        da = hmc_mod._dual_avg_update(da, ap, target=target_accept)
        cnt = cnt + 1.0
        delta = state.theta - mean
        mean = mean + delta / cnt
        m2 = m2 + delta * (state.theta - mean)
        return (state, da, mean, m2, cnt, inv_mass), ap

    def sample_scan(carry, rng_i):
        state, step, inv_mass = carry
        state, ap = transition(rng_i, state, step, inv_mass)
        return (state, step, inv_mass), (state.theta, ap)

    def one_chain(theta_init, key):
        v, g = logp_grad(theta_init)
        state = hmc_mod.HMCState(theta_init, v, g)
        da = hmc_mod._dual_avg_init(jnp.asarray(init_step, theta_init.dtype))
        inv_mass = jnp.ones_like(theta_init)
        keys = jax.random.split(key, n_warmup + n_samples + 1)
        carry = (state, da, jnp.zeros_like(theta_init),
                 jnp.zeros_like(theta_init),
                 jnp.asarray(0.0, theta_init.dtype), inv_mass)
        (state, da, mean, m2, cnt, _), _ = jax.lax.scan(
            warmup_scan, carry, keys[:n_warmup]
        )
        var = m2 / jnp.maximum(cnt - 1.0, 1.0)
        inv_mass = jnp.where(var > 0, var, 1.0)
        step = jnp.exp(da.log_step_avg)
        (state, step, inv_mass), (thetas, aps) = jax.lax.scan(
            sample_scan, (state, step, inv_mass), keys[n_warmup:-1]
        )
        return thetas, jnp.mean(aps), step, inv_mass

    chain_keys = jax.random.split(rng, n_chains)
    fn = jax.vmap(one_chain)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        sharding = NamedSharding(mesh, P(chain_axis))
        theta0 = jax.device_put(theta0, sharding)
        chain_keys = jax.device_put(chain_keys, sharding)
        fn = jax.jit(fn, in_shardings=(sharding, sharding))
    else:
        fn = jax.jit(fn)

    thetas, acc, step, inv_mass = fn(theta0, chain_keys)
    samples = np.asarray(thetas)
    rhat, ess = hmc_mod.diagnostics(samples)
    return hmc_mod.HMCResult(
        samples=samples, accept_rate=np.asarray(acc),
        step_size=np.asarray(step), inv_mass=np.asarray(inv_mass),
        rhat=rhat, ess=ess,
    )
