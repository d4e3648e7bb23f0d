"""Test configuration: run on CPU with 8 virtual devices (simulates the
multi-chip mesh; the reference's analog is real MPI jobs with layouts up to
8x8x6 — SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
