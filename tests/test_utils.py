"""Utility-layer tests: checkpoint discovery, metrics logging, prefetcher."""

import json
import os
import time

import numpy as np
import pytest

from neko_tpu.data.pipeline import HostPrefetcher
from neko_tpu.utils.checkpoint import latest_checkpoint, load_args_dict, save_args
from neko_tpu.utils.logging import MetricsLogger


def test_latest_checkpoint(tmp_path):
    assert latest_checkpoint(str(tmp_path)) is None
    for step in (10, 200, 30):
        os.makedirs(tmp_path / f"checkpoint_{step}")
    (tmp_path / "checkpoint_bogus").mkdir()
    assert latest_checkpoint(str(tmp_path)).endswith("checkpoint_200")


def test_save_args_written_once(tmp_path):
    import dataclasses

    @dataclasses.dataclass
    class A:
        x: int = 1

    save_args(str(tmp_path), A(x=5))
    save_args(str(tmp_path), A(x=9))  # reference writes args.json only once
    assert load_args_dict(str(tmp_path))["x"] == 5


def test_metrics_logger_jsonl(tmp_path):
    logger = MetricsLogger(exp_dir=str(tmp_path), print_logs=False)
    logger.log({"training/loss": 1.5, "weird": np.float32(2.0)}, step=3)
    logger.finish()
    rec = json.loads(open(tmp_path / "metrics.jsonl").read().strip())
    assert rec["training/loss"] == 1.5
    assert rec["_step"] == 3
    assert rec["weird"] == 2.0


def test_prefetcher_orders_and_forwards_errors():
    state = {"n": 0}

    def sample():
        state["n"] += 1
        if state["n"] == 4:
            raise RuntimeError("boom")
        return state["n"]

    pf = HostPrefetcher(sample, depth=2)
    got = [pf.get() for _ in range(3)]
    assert got == [1, 2, 3]
    with pytest.raises(RuntimeError, match="boom"):
        pf.get()
    pf.close()


def test_prefetcher_close_unblocks():
    def slow():
        time.sleep(0.05)
        return 1

    pf = HostPrefetcher(slow, depth=1)
    assert pf.get() == 1
    pf.close()  # must not hang
