"""Test configuration: run on CPU with 12 virtual devices (simulates the
multi-chip mesh; the reference's analog is real MPI jobs with layouts up to
8x8x6 — SURVEY.md §4).

The axon sitecustomize force-registers the TPU plugin and overrides the
JAX_PLATFORMS env var, so the platform must be selected via jax.config after
import (before first backend use)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=12"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
