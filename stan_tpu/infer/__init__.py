"""Probabilistic inference layer: FEM forward model + samplers.

New subsystem relative to the reference (which has no inference; see
BASELINE.json north star): HMC/NUTS/VI/SMC over material and load
parameters with the linear-statics solve as the differentiable forward
model.
"""

from stan_tpu.infer.calibrate import CalibrationProblem, make_problem  # noqa: F401
from stan_tpu.infer.forward import build_forward, displacement_fn  # noqa: F401
from stan_tpu.infer.hmc import run_hmc  # noqa: F401
from stan_tpu.infer.nuts import run_nuts  # noqa: F401
from stan_tpu.infer.smc import run_smc  # noqa: F401
from stan_tpu.infer.vi import run_advi  # noqa: F401
