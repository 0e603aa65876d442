"""Test configuration: run everything on CPU with 8 virtual devices so
sharding/multi-chip logic is exercised without a pod (SURVEY.md section 4).

NB this environment pre-imports jax at interpreter startup with
JAX_PLATFORMS=axon (the tunneled TPU), so env vars are too late --
jax.config.update is the only thing that works.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

REFERENCE_DIR = "/root/reference"
