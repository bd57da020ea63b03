"""Dispatch predicate for the head-packed kernels (ops/attention.py)."""

import jax

from neko_tpu.ops import attention as attn
from neko_tpu.parallel.mesh import create_mesh


def test_packed_flash_ok_checks_per_shard_heads(monkeypatch):
    """Under tensor parallelism the kernel sees heads // model_shards, so
    lane-groupability must be checked on the PER-SHARD count: heads=12,
    hd=32 is groupable globally (g=4) but NOT at model=2 (local 6)."""
    monkeypatch.setattr(attn, "flash_supported", lambda: True)

    # no active mesh: global head count governs
    assert attn.packed_flash_ok(256, 32, 12)
    assert not attn.packed_flash_ok(256, 32, 6)

    mesh = create_mesh(model=2)
    with mesh:
        assert not attn.packed_flash_ok(256, 32, 12)  # local heads 6 -> g=0
        assert attn.packed_flash_ok(256, 32, 8)       # local heads 4, D=128
        assert not attn.packed_flash_ok(256, 32, 7)   # heads % model != 0


def test_packed_flash_ok_false_off_tpu():
    # without the monkeypatch, CPU has no flash path at all
    if jax.devices()[0].platform not in ("tpu", "axon"):
        assert not attn.packed_flash_ok(256, 32, 24)
