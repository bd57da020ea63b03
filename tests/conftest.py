"""Test configuration: run everything on a virtual 8-device CPU mesh.

XLA flags must be set before jax initializes its backends, so this sits at
the top of conftest (pytest imports it before any test module).  NOTE: in the
axon-TPU environment the JAX_PLATFORMS env var is overridden by the harness —
`jax.config.update` is the only reliable way to force the CPU platform.
"""

import os

# tests never need the network: skip straight to the cached tokenizer or the
# byte fallback instead of minutes of HF hub retries (tokenizers/text.py)
os.environ.setdefault("HF_HUB_OFFLINE", "1")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# NEKO_TEST_TPU=1 runs the suite on the real accelerator (enables the
# TPU-only pallas kernel tests); default is the virtual 8-device CPU mesh.
if not os.environ.get("NEKO_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
