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


# --------------------------------------------------------------- slow lane
# Modules dominated by multi-device jit compiles or full train loops (every
# test >=10s in the r03 `--durations` report lives in one of these).  The
# default `pytest tests/ -q` lane skips them and finishes in <10 min; run
# the full suite with `--slow` (DockerTest does) or select with `-m slow`.
# Regenerate the list from `pytest tests/ --slow --durations=0` when modules
# move tiers.
import pytest  # noqa: E402

SLOW_MODULES = {
    "test_dict_action", "test_dict_space", "test_distributed", "test_ema",
    "test_export_reference", "test_fp8_weights", "test_fsdp",
    "test_graft_entry", "test_imagine", "test_loss_curve_parity",
    "test_multidiscrete", "test_observation_loss", "test_pipeline",
    "test_ring_attention", "test_ring_kernel", "test_rollout_cache",
    "test_server", "test_serving_restore", "test_sharding",
    "test_spec_decode", "test_spec_draft", "test_stochastic_depth",
    "test_text_space", "test_tp_serving", "test_trainer", "test_vq",
}


def pytest_addoption(parser):
    parser.addoption(
        "--slow", action="store_true", default=False,
        help="include tests marked slow (full lane)",
    )


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
    # explicit deselection (not markexpr mutation, which races pytest's own
    # mark plugin): default lane drops slow unless --slow or a -m was given
    if config.getoption("--slow") or config.option.markexpr:
        return
    keep, drop = [], []
    for item in items:
        (drop if item.get_closest_marker("slow") else keep).append(item)
    if drop:
        config.hook.pytest_deselected(items=drop)
        items[:] = keep
