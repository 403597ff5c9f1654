"""sdpb_tpu: a TPU-native semidefinite-program solver framework.

A from-scratch reimplementation of the capabilities of SDPB
(https://github.com/davidsd/sdpb): an arbitrary-precision primal-dual
interior-point solver for polynomial matrix programs, designed for the
conformal bootstrap.  Instead of Elemental+GMP+MPI, high precision is
carried by multi-word float64 expansions evaluated on TPU (JAX/XLA,
Pallas kernels for hot paths), and distribution is JAX sharding over a
device mesh with XLA collectives.

Reference layer map: see SURVEY.md at the repo root.
"""

import jax

# Multi-word float arithmetic requires IEEE double words everywhere.
jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"
