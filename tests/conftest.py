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

# Persistent compilation cache: the suite is compile-bound (every xdist
# worker recompiles the same integrator programs), so cache executables on
# disk across workers AND across runs.  Safe for tests: keys include the
# computation, flags, and backend.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

REFERENCE_DIR = "/root/reference"
