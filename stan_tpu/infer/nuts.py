"""No-U-Turn Sampler (multinomial variant), iterative tree building.

New capability (BASELINE.json: "NUTS/HMC calibration of E and nu"); the
reference has no inference layer.

Design: the trajectory is grown by a `lax.while_loop` over *individual
leapfrog steps* with an O(max_depth) checkpoint stack for the aligned
power-of-two U-turn checks (the iterative formulation of Phan & Pradhan,
arXiv:1912.11554, as adopted by Stan/NumPyro). Compared to a static
recursion that evaluates both `lax.cond` branches under vmap, a trajectory
that U-turns after k steps costs k gradient evaluations instead of always
2^max_depth — for FEM forward models each gradient is an implicit-adjoint
linear solve, so this is the difference between paying for the actual
trajectory and paying worst-case every transition.

Implements multinomial sampling from the trajectory weighted by
exp(logp - kinetic) (Betancourt 2017), with the generalized U-turn
criterion checked for every power-of-two aligned subtree, and Stan
semantics for rejected subtrees (a doubling that turns or diverges
contributes no proposal).

Warmup (step size dual averaging + diagonal mass) and chunked
checkpoint/resume reuse infer/hmc.run_chains.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from stan_tpu.infer import hmc as hmc_mod


class _Z(NamedTuple):
    theta: jax.Array
    p: jax.Array
    logp: jax.Array
    grad: jax.Array


def _leapfrog_step(logp_grad, z: _Z, step, inv_mass, direction):
    eps = direction * step
    p = z.p + 0.5 * eps * z.grad
    theta = z.theta + eps * inv_mass * p
    logp, grad = logp_grad(theta)
    p = p + 0.5 * eps * grad
    return _Z(theta, p, logp, grad)


def _energy(z: _Z, inv_mass):
    return z.logp - 0.5 * jnp.sum(inv_mass * z.p**2)


def _turning(p_left, p_right, sum_p, inv_mass):
    """Generalized U-turn: momentum projected on the trajectory span.

    Symmetric in (left, right), so it is orientation-agnostic: valid for
    spans built in either direction.
    """
    dr = inv_mass * sum_p
    return jnp.logical_or(
        jnp.sum(dr * p_left) <= 0.0, jnp.sum(dr * p_right) <= 0.0
    )


def _popcount16(n):
    """Population count for 0 <= n < 2^16 (traced int32)."""
    return jnp.sum((n >> jnp.arange(16, dtype=jnp.int32)) & 1)


def _trailing_ones(n):
    """Number of trailing 1-bits of n >= 0 (traced int32)."""
    return _popcount16((~n & (n + 1)) - 1)


_MAX_DELTA_ENERGY = 1000.0  # Stan's divergence threshold


class _Subtree(NamedTuple):
    z_end: _Z  # outermost leaf (the new trajectory edge if accepted)
    z_prop: _Z  # multinomial proposal from this subtree
    log_weight: jax.Array
    sum_p: jax.Array  # momentum sum over built leaves
    turning: jax.Array
    diverging: jax.Array
    sum_accept: jax.Array
    n_leaves: jax.Array  # leaves actually built (= gradient evals)


def _build_subtree(logp_grad, rng, z_edge: _Z, depth, step, inv_mass,
                   direction, energy0, max_depth: int) -> _Subtree:
    """Grow up to 2^depth leaves from z_edge, one leapfrog per iteration.

    U-turn checks cover every aligned power-of-two sub-span via a
    checkpoint stack: leaf n (0-based, build order) stores its momentum and
    the inclusive momentum prefix-sum at stack slot popcount(n >> 1) when n
    is even; when n is odd it checks the spans ending at n against slots
    [popcount(n>>1) - trailing_ones(n) + 1 .. popcount(n>>1)], which hold
    exactly the first leaves of those spans. Stops at the first U-turn or
    divergence, so the loop cost is the realized trajectory length.
    `depth` may be traced (the outer doubling loop carries it).
    """
    dim = z_edge.theta.shape[0]
    dtype = z_edge.theta.dtype
    n_max = jnp.left_shift(jnp.int32(1), jnp.asarray(depth, jnp.int32))

    init = (
        jnp.int32(0),  # n: leaves built so far
        z_edge,  # current (outermost) state
        z_edge,  # proposal (placeholder until first leaf)
        jnp.asarray(-jnp.inf, dtype),  # subtree log weight
        jnp.zeros(dim, dtype),  # momentum prefix sum
        jnp.zeros((max_depth, dim), dtype),  # p checkpoints
        jnp.zeros((max_depth, dim), dtype),  # prefix-sum checkpoints
        jnp.asarray(False),  # turning
        jnp.asarray(False),  # diverging
        jnp.asarray(0.0, dtype),  # sum of leaf Metropolis ratios
        rng,
    )

    def cond(c):
        n, *_ = c
        turning, diverging = c[7], c[8]
        return (n < n_max) & ~turning & ~diverging

    def body(c):
        n, z, z_prop, lw, cps, p_ck, ps_ck, turning, diverging, sacc, key = c
        key, k_take = jax.random.split(key)
        z = _leapfrog_step(logp_grad, z, step, inv_mass, direction)
        e = _energy(z, inv_mass)
        delta = e - energy0
        diverging = delta < -_MAX_DELTA_ENERGY
        w = jnp.where(jnp.isfinite(delta), delta, -jnp.inf)
        # Progressive multinomial sampling: take the new leaf with
        # probability exp(w - logaddexp(lw, w)) — equivalent in
        # distribution to the recursive pairwise combine.
        lw_new = jnp.logaddexp(lw, w)
        u = jax.random.uniform(k_take, dtype=dtype)
        take = jnp.log(u) < w - lw_new
        z_prop = jax.tree_util.tree_map(
            lambda a, b: jnp.where(take, a, b), z, z_prop
        )
        sacc = sacc + jnp.where(
            jnp.isfinite(delta), jnp.minimum(1.0, jnp.exp(delta)), 0.0
        )
        cps = cps + z.p
        idx_max = _popcount16(n >> 1)
        # Even leaf: start of future aligned spans -> store checkpoint.
        even = (n & 1) == 0
        p_ck = jnp.where(even, p_ck.at[idx_max].set(z.p), p_ck)
        ps_ck = jnp.where(even, ps_ck.at[idx_max].set(cps), ps_ck)
        # Odd leaf: spans of size 2^k end here for k = 1..trailing_ones(n);
        # their first leaves sit at slots idx_min..idx_max (empty range on
        # even leaves, so no guard needed).
        idx_min = idx_max - _trailing_ones(n) + 1

        def check(i, turn):
            span_sum = cps - ps_ck[i] + p_ck[i]
            return turn | _turning(p_ck[i], z.p, span_sum, inv_mass)

        turning = jax.lax.fori_loop(
            idx_min, idx_max + 1, check, jnp.asarray(False)
        )
        return (n + 1, z, z_prop, lw_new, cps, p_ck, ps_ck,
                turning, diverging, sacc, key)

    (n, z, z_prop, lw, cps, _, _, turning, diverging, sacc, _) = (
        jax.lax.while_loop(cond, body, init)
    )
    return _Subtree(z, z_prop, lw, cps, turning, diverging, sacc,
                    n.astype(dtype))


def nuts_transition(logp_grad, rng, state: hmc_mod.HMCState, step, inv_mass,
                    max_depth: int):
    """One NUTS transition. Returns (state, accept_stat, n_grad_evals)."""
    dtype = state.theta.dtype
    k_mom, k_loop = jax.random.split(rng)
    p0 = jax.random.normal(k_mom, state.theta.shape, dtype)
    p0 = p0 * jnp.sqrt(1.0 / inv_mass)
    z0 = _Z(state.theta, p0, state.logp, state.grad)
    energy0 = _energy(z0, inv_mass)

    init = (
        z0,  # left edge of trajectory
        z0,  # right edge
        z0,  # proposal
        jnp.asarray(0.0, dtype),  # trajectory log weight (initial leaf = 1)
        p0,  # trajectory momentum sum
        jnp.asarray(False),  # turning
        jnp.asarray(False),  # diverging
        jnp.asarray(0.0, dtype),  # sum_accept (seed point is NOT a proposal)
        jnp.asarray(1.0, dtype),  # n_leaves
        jnp.int32(0),  # depth (doublings completed)
        k_loop,
    )

    def cond(c):
        turning, diverging, depth = c[5], c[6], c[9]
        return (depth < max_depth) & ~turning & ~diverging

    def body(c):
        (z_left, z_right, z_prop, lw, sum_p, turning, diverging,
         sacc, n_leaves, depth, key) = c
        key, kd, kt, kc = jax.random.split(key, 4)
        direction = jnp.where(jax.random.bernoulli(kd), 1.0, -1.0).astype(
            dtype)
        edge = jax.tree_util.tree_map(
            lambda a, b: jnp.where(direction > 0, a, b), z_right, z_left
        )
        sub = _build_subtree(logp_grad, kt, edge, depth, step, inv_mass,
                             direction, energy0, max_depth)
        # Stan semantics: a subtree that turned or diverged is rejected
        # whole — no proposal, no weight, the trajectory ends here.
        valid = ~sub.turning & ~sub.diverging
        lw_new = jnp.logaddexp(lw, sub.log_weight)
        u = jax.random.uniform(kc, dtype=dtype)
        take = valid & (jnp.log(u) < sub.log_weight - lw_new)
        z_prop = jax.tree_util.tree_map(
            lambda a, b: jnp.where(take, a, b), sub.z_prop, z_prop
        )
        lw = jnp.where(valid, lw_new, lw)
        z_left_new = jax.tree_util.tree_map(
            lambda a, b: jnp.where(direction > 0, a, b), z_left, sub.z_end
        )
        z_right_new = jax.tree_util.tree_map(
            lambda a, b: jnp.where(direction > 0, a, b), sub.z_end, z_right
        )
        sum_p_new = sum_p + sub.sum_p
        turn_comb = _turning(z_left_new.p, z_right_new.p, sum_p_new,
                             inv_mass)
        z_left = jax.tree_util.tree_map(
            lambda a, b: jnp.where(valid, a, b), z_left_new, z_left
        )
        z_right = jax.tree_util.tree_map(
            lambda a, b: jnp.where(valid, a, b), z_right_new, z_right
        )
        sum_p = jnp.where(valid, sum_p_new, sum_p)
        turning = sub.turning | (valid & turn_comb)
        diverging = sub.diverging
        sacc = sacc + sub.sum_accept
        n_leaves = n_leaves + sub.n_leaves
        return (z_left, z_right, z_prop, lw, sum_p, turning, diverging,
                sacc, n_leaves, depth + 1, key)

    (_, _, z_prop, _, _, _, _, sacc, n_leaves, _, _) = jax.lax.while_loop(
        cond, body, init
    )
    new_state = hmc_mod.HMCState(z_prop.theta, z_prop.logp, z_prop.grad)
    # Stan's accept statistic: mean Metropolis ratio over *proposed* leaves
    # (the seed point excluded — seeding it 1/1 biased the statistic toward
    # 1 and made dual averaging tune slightly-too-large steps, ADVICE r2).
    # An immediately-diverging trajectory has no proposed leaves: accept 0.
    accept = sacc / jnp.maximum(n_leaves - 1.0, 1.0)
    return new_state, accept, n_leaves - 1.0  # gradient evals (minus seed)


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
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 0,
    warmup_chunk: int = 0,
) -> hmc_mod.HMCResult:
    """NUTS with HMC-style windowed warmup; same chain batching/sharding
    and chunked checkpoint/resume as run_hmc (shared driver:
    hmc.run_chains). The per-chain transition (data-dependent trajectory
    while_loop) is vmapped into the driver's chain-batched contract with
    per-chain keys folded from the step key."""
    if not 0 < max_depth <= 14:
        raise ValueError("max_depth must be in 1..14")
    val_grad = jax.value_and_grad(logp_fn)

    def logp_grad(theta):
        v, g = val_grad(theta)
        v = jnp.where(jnp.isfinite(v), v, -jnp.inf)
        g = jnp.where(jnp.isfinite(g), g, 0.0)
        return v, g

    n_chains = jnp.asarray(theta0).shape[0]

    def transition(rng_i, state, step, inv_mass):
        keys = jax.random.split(rng_i, n_chains)
        return jax.vmap(
            lambda k, th, v, g, s, im: nuts_transition(
                logp_grad, k, hmc_mod.HMCState(th, v, g), s, im, max_depth)
        )(keys, state.theta, state.logp, state.grad, step, inv_mass)

    return hmc_mod.run_chains(
        jax.vmap(logp_grad), transition, theta0, rng,
        n_samples=n_samples, n_warmup=n_warmup, init_step=init_step,
        target_accept=target_accept, mesh=mesh, chain_axis=chain_axis,
        checkpoint_path=checkpoint_path, checkpoint_every=checkpoint_every,
        kernel_id=f"nuts:maxdepth{max_depth}", warmup_chunk=warmup_chunk,
    )
