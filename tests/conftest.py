"""Test env: force CPU backend with an 8-device virtual mesh so all sharding
paths (tp/dp over ICI) are exercised without TPU hardware. Mirrors the
reference's strategy of keeping the full test suite runnable with no GPU
(SURVEY.md §4: fake-backend pattern, src/queue/worker.rs:502-538)."""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
