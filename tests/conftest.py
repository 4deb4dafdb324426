"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is tested on virtual CPU devices per SURVEY.md §4 —
the reference has no multi-node test story at all; we compile and execute
real mesh-sharded programs on one host via
``xla_force_host_platform_device_count``.

Note: the environment's axon sitecustomize pins ``JAX_PLATFORMS=axon``
(the tunneled TPU) and prepends itself even when the env var is
overridden, so we must force the platform through ``jax.config`` before
any backend is initialized.
"""

import os

# MIXGRPO_TPU_TESTS=1 leaves the real accelerator attached so the
# hardware tier (tests/test_tpu_hardware.py, ``-m tpu``) can compile on
# the actual chip; everything else runs on the virtual CPU mesh.
_USE_HW = os.environ.get("MIXGRPO_TPU_TESTS") == "1"

flags = os.environ.get("XLA_FLAGS", "")
if not _USE_HW and "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if not _USE_HW and "xla_cpu_enable_concurrency_optimized_scheduler" not in flags:
    # XLA:CPU's concurrency-optimized thunk scheduler lets independent
    # collectives (an fsdp weight all-gather vs a tp grad all-reduce)
    # start in different orders on different virtual-device threads —
    # a rendezvous deadlock cycle, reproduced 3/4 runs at recipe-shape
    # geometry.  Real TPUs execute in program order; pin the CPU
    # emulation to the sequential schedule.
    flags = (flags + " --xla_cpu_enable_concurrency_optimized_scheduler=false").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

if not _USE_HW:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
