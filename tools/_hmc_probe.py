import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
import bench as B

model, prob = B._calibration_problem(32)
from stan_tpu.infer import hmc
rng = np.random.default_rng(7)
for n_chains in (16,):
    theta0 = jnp.asarray(np.array([np.log(210000.0), 0.0, 0.0])[None]
                         + 0.05 * rng.normal(size=(n_chains, 3)))
    t0 = time.time()
    res = hmc.run_hmc(prob.log_posterior, theta0, jax.random.PRNGKey(11),
                      n_samples=8, n_warmup=8, n_leapfrog=8, init_step=0.02,
                      checkpoint_every=4, warmup_chunk=4)
    print(f"chains={n_chains}: wall {time.time()-t0:.1f}s warmup {res.warmup_seconds:.1f}s "
          f"chunks {res.chunk_seconds} accept {np.mean(res.accept_rate):.3f}", flush=True)
