"""Test config: CPU backend with 8 virtual devices (multi-chip sharding tests
run on a fake mesh — the TPU answer to 'multi-node without a cluster')."""
import os

# Allow 8 virtual devices if the CPU backend is selected (sharding tests);
# numeric/parity tests run on whatever backend is default — they pin fp32
# matmul precision below, so they pass identically on CPU and TPU.
# (Forcing everything to CPU is impractical here: the single-core CPU XLA
# backend compiles the big conv graphs orders of magnitude slower than the
# TPU backend.)
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Parity tests compare against fp32 PyTorch: force exact fp32 contractions.
# (The framework itself leaves precision at the backend default so the TPU
# MXU bf16 fast path stays on for benchmarks.)
import jax
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compile cache: the conv graphs compile in minutes via the
# remote compile service; repeated suite runs hit disk instead.
from otvm_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
