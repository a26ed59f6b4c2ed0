import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
import bench as B
from stan_tpu.infer import hmc

nch = int(sys.argv[1])
model, prob = B._calibration_problem(32)
rng = np.random.default_rng(7)
theta0 = jnp.asarray(np.array([np.log(210000.0), 0.0, 0.0])[None]
                     + 0.05 * rng.normal(size=(nch, 3)))
print("start row", nch, flush=True)
t0 = time.time()
res = hmc.run_hmc(prob.log_posterior, theta0, jax.random.PRNGKey(11),
                  n_samples=20, n_warmup=64, n_leapfrog=8, init_step=0.02,
                  checkpoint_every=2, warmup_chunk=2)
print(f"row {nch}: wall {time.time()-t0:.0f}s warmup {res.warmup_seconds:.0f}s "
      f"accept {np.mean(res.accept_rate):.3f} step {np.mean(res.step_size):.2e} "
      f"sd {res.samples[...,0].std():.2e}", flush=True)
