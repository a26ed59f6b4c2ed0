"""stan_tpu: a TPU-native structural-analysis + probabilistic-inference
framework, built from scratch with the capabilities of galuszkm/STAN
(reference surveyed in SURVEY.md).

Compute path: JAX/XLA (+ Pallas kernels) over device meshes; host runtime:
Python + native C++ helpers (IO, partitioning).
"""

__version__ = "0.1.0"
