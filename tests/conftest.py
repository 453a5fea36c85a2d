"""Test env: force CPU backend with an 8-device virtual mesh so all sharding
paths (tp/dp over ICI) are exercised without TPU hardware. Mirrors the
reference's strategy of keeping the full test suite runnable with no GPU
(SURVEY.md §4: fake-backend pattern, src/queue/worker.rs:502-538)."""

import os
import sys

# Override (not setdefault): the host env pins JAX_PLATFORMS=axon (TPU).
# OPENHUSH_TEST_TPU=1 keeps the real device (hardware validation runs).
_USE_TPU = os.environ.get("OPENHUSH_TEST_TPU") == "1"
if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon sitecustomize (PYTHONPATH=/root/.axon_site) force-registers the
# TPU backend regardless of JAX_PLATFORMS in the env; jax.config overrides it.
if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
    # The axon sitecustomize patches jax's compilation cache in every
    # process; its executable-serialization write path has segfaulted
    # under full-suite memory pressure (zstd write in
    # put_executable_and_time, seen twice at test_finetune_memorizes).
    # CPU compiles are cheap — no persistent cache in the test harness.
    jax.config.update("jax_enable_compilation_cache", False)

# XLA:CPU's default matmul/conv precision is visibly lossy (~1e-3); force full
# fp32 so parity tests measure architecture, not backend rounding. Production
# TPU runs keep the default (bf16 MXU passes) — set per-op where it matters.
jax.config.update("jax_default_matmul_precision", "highest")


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running end-to-end test")
    config.addinivalue_line("markers", "tpu: requires real TPU hardware")
