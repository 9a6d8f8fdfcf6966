"""Test configuration: force an honest local 8-device CPU backend.

Two obstacles in this image:

* a sitecustomize hook (gated on ``PALLAS_AXON_POOL_IPS``) imports jax at
  interpreter startup and force-registers the remote single-TPU "axon"
  backend, overriding ``JAX_PLATFORMS`` — so env vars set here are too late
  and the backend must be reset explicitly;
* the VM has ONE CPU core, so XLA CPU compiles are slow — a persistent
  compilation cache makes repeated runs cheap.

The 8 virtual CPU devices exercise all jax.sharding mesh logic (data/tensor
parallel) without TPU hardware — the standard JAX multi-chip test pattern.
"""
import os

# TPU lane (benchmarks/tpu_lane.py): keep the real TPU backend so the
# hardware-only kernel tests (in-kernel dropout PRNG, op-level flash perf)
# actually run instead of skipping.  Everything else below pins CPU.
TPU_LANE = os.environ.get("TPU_LANE") == "1"

if not TPU_LANE:
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
if not TPU_LANE:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

# Persistent compile cache (single-core VM: XLA CPU compiles are slow).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

# jax 0.9 does not read the cache env vars at import — set explicitly
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

if not TPU_LANE:
    if jax.config.jax_platforms != "cpu":
        jax.config.update("jax_platforms", "cpu")
        from jax._src import xla_bridge as _xb  # noqa: E402

        _xb._clear_backends()

    assert jax.default_backend() == "cpu", (
        f"tests require the CPU backend, got {jax.default_backend()}")
    assert jax.device_count() == 8, (
        f"tests require 8 virtual CPU devices, got {jax.device_count()}")
