"""Test configuration.

Tests run on a virtual 8-device CPU mesh so that multi-chip sharding
(`pjit` over a `jax.sharding.Mesh`) can be validated without TPU pods.
This mirrors the reference's implicit reliance on real GPUs for its
DataParallel/DDP paths (reference train.py:136-138, light_training/trainer.py:97)
but makes it testable on any host.

Note: the ambient environment boots an `axon` TPU backend from
sitecustomize and pins jax_platforms there, so plain env vars are not
enough — the platform must be overridden via jax.config after import.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# persistent compilation cache: the suite is compile-dominated on 1 vCPU;
# repeat runs hit the cache (measured 3.2x faster cold-start on the big
# serving programs, BASELINE.md r3)
from diff_unet_tpu.utils import compile_cache  # noqa: E402

compile_cache.enable(os.path.expanduser("~/.cache/diff_unet_tpu/xla-test"))
