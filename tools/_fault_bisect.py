import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from stan_tpu.core import meshgen
from stan_tpu.infer import forward
from stan_tpu.fem import stencil

stage = sys.argv[1]
model = meshgen.hex_beam(32, 32, 32)
fwd = forward.build_forward(model, cg_tol=1e-6)
B = 16
lam = jnp.linspace(0.9, 1.1, B)
mu = jnp.linspace(0.4, 0.6, B)
u0 = jnp.asarray(np.random.default_rng(1).normal(
    size=(B, 3) + tuple(fwd.node_shape)), jnp.float32)

if stage == "sweep":
    f = jax.jit(lambda l, m, u: stencil.theta_sweep(l, m, u, fwd.ft_lam, fwd.ft_mu))
    r = f(lam, mu, u0); jax.block_until_ready(r)
    print("batched sweep OK", float(jnp.abs(r).max()), flush=True)
    # compare vs sequential
    r1 = jnp.stack([jax.jit(lambda l, m, u: stencil.theta_sweep(l, m, u, fwd.ft_lam, fwd.ft_mu))(lam[i], mu[i], u0[i]) for i in range(3)])
    print("match:", float(jnp.abs(r[:3]-r1).max()/jnp.abs(r1).max()), flush=True)
elif stage == "solve":
    u_fn = forward.displacement_fn(fwd, model.nelem)
    thetas = jnp.asarray(np.array([np.log(210000.0), 0.0, 0.0])[None]
                         + 0.02 * np.random.default_rng(0).normal(size=(B, 3)))
    ub = jax.jit(jax.vmap(u_fn))(thetas)
    jax.block_until_ready(ub)
    print("vmapped solve OK", float(jnp.abs(ub).max()), flush=True)
elif stage == "grad":
    u_fn = forward.displacement_fn(fwd, model.nelem)
    thetas = jnp.asarray(np.array([np.log(210000.0), 0.0, 0.0])[None]
                         + 0.02 * np.random.default_rng(0).normal(size=(B, 3)))
    g = jax.jit(jax.grad(lambda t: jnp.sum(jax.vmap(u_fn)(t) ** 2)))(thetas)
    jax.block_until_ready(g)
    print("vmapped grad OK", bool(jnp.all(jnp.isfinite(g))), flush=True)
if stage == "transition":
    import time
    from stan_tpu.infer import hmc
    sys.path.insert(0, "/root/repo")
    import bench as Bn
    model2, prob = Bn._calibration_problem(32)
    lgb = hmc.guarded_logp_grad_b(prob.log_posterior)
    thetas = jnp.asarray(np.array([np.log(210000.0), 0.0, 0.0])[None]
                         + 0.02 * np.random.default_rng(0).normal(size=(B, 3)))
    t0 = time.time()
    v, g = jax.jit(lgb)(thetas)
    jax.block_until_ready(g)
    print("one batched logp_grad: %.1fs (incl compile)" % (time.time()-t0), flush=True)
    t0 = time.time()
    v, g = jax.jit(lgb)(thetas); jax.block_until_ready(g)
    print("warm logp_grad: %.2fs" % (time.time()-t0), flush=True)
    state = hmc.HMCState(thetas, v, g)
    step = jnp.full((B,), 0.002)
    inv_mass = jnp.ones_like(thetas)
    fn = jax.jit(lambda s, st, im: hmc.hmc_transition(lgb, jax.random.PRNGKey(0), s, st, im, 8))
    t0 = time.time()
    out, ap = fn(state, step, inv_mass)
    jax.block_until_ready(out.theta)
    print("one 8-leapfrog transition: %.1fs (incl compile), accept %s" % (time.time()-t0, np.asarray(ap)[:4]), flush=True)
    t0 = time.time()
    out, ap = fn(state, step, inv_mass); jax.block_until_ready(out.theta)
    print("warm transition: %.2fs" % (time.time()-t0), flush=True)
if stage.startswith("hmc"):
    import time
    from stan_tpu.infer import hmc
    sys.path.insert(0, "/root/repo")
    import bench as Bn
    model2, prob = Bn._calibration_problem(32)
    nch = int(stage.split(":")[1]); nw = int(stage.split(":")[2]); ns = int(stage.split(":")[3])
    thetas = jnp.asarray(np.array([np.log(210000.0), 0.0, 0.0])[None]
                         + 0.02 * np.random.default_rng(0).normal(size=(nch, 3)))
    t0 = time.time()
    res = hmc.run_hmc(prob.log_posterior, thetas, jax.random.PRNGKey(1),
                      n_samples=ns, n_warmup=nw, n_leapfrog=8,
                      init_step=0.02, warmup_chunk=4)
    print(f"hmc {nch}ch w{nw} s{ns}: wall {time.time()-t0:.1f}s warmup {res.warmup_seconds:.1f}s chunks {res.chunk_seconds} accept {np.mean(res.accept_rate):.3f}", flush=True)
