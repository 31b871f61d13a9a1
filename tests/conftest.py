"""Test configuration: run everything on a virtual 8-device CPU mesh.

The environment pre-imports jax at interpreter startup (sitecustomize) with
JAX_PLATFORMS=axon, so env vars set here are too late — use jax.config, which
takes effect because no backend has been initialized yet at conftest time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses tests spawn

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")
