#!/usr/bin/env python
"""Measure the ACTUAL reference's training throughput at the bench config.

BASELINE.md: "The reference publishes no benchmark numbers ... The rebuild
must therefore measure its own reference baseline."  This runs the real
ManifoldRG/NEKO GatoPolicy (imported from /root/reference with the same
transformers shim the parity tests use) through full train steps — its own
tokenize_input_dicts packing path (gato_policy.py:195-432), forward, backward,
AdamW — on the same mixed text+MuJoCo+Atari batch mixture bench.py uses
(768d/6L/24h, batch 16, k=1024), and records measured tokens/sec.

Writes BASELINE_MEASURED.json at the repo root; bench.py reads it to report
`vs_measured_reference`.  Hardware metadata is recorded so the number is
honest: in this environment torch is CPU-only, so the measurement is
reference-on-host-CPU (torch threads = all cores).
"""

from __future__ import annotations

import json
import os
import platform
import sys
import time
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

D, L, H, S = 768, 6, 24, 1024
BATCH = 16
WARMUP = 1
STEPS = 3


class _StubTokenizer:
    vocab_size = 50257

    def decode(self, ids):
        return " ".join(str(int(i)) for i in ids)

    def encode(self, text):
        return [int(t) for t in text.split()]


def _load_reference_policy():
    """Import the reference GatoPolicy with the transformers-compat shim
    (same approach as tests/test_full_model_parity.py)."""
    import transformers.modeling_utils as mu
    from transformers.pytorch_utils import (
        Conv1D,
        find_pruneable_heads_and_indices,
        prune_conv1d_layer,
    )

    mu.Conv1D = Conv1D
    mu.find_pruneable_heads_and_indices = find_pruneable_heads_and_indices
    mu.prune_conv1d_layer = prune_conv1d_layer
    if not hasattr(mu, "SequenceSummary"):
        mu.SequenceSummary = type("SequenceSummary", (), {})
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")

    import gato.policy.gato_policy as gp

    gp.AutoTokenizer = types.SimpleNamespace(
        from_pretrained=lambda name: _StubTokenizer()
    )
    return gp.GatoPolicy


def build_batches(torch, n_batches, seed=0):
    """Same mixture as bench.py::build_batch: 1/3 full-context text, 1/3
    MuJoCo-like continuous (8 obs + 2 act dims), 1/3 Atari-like 96x96 image +
    discrete action (36 patches/timestep)."""
    rng = np.random.RandomState(seed)
    ctx_ts_cont = S // (8 + 2 + 1)
    ctx_ts_img = S // 38
    batches = []
    for _ in range(n_batches):
        examples = []
        for i in range(BATCH):
            k = i % 3
            if k == 0:
                examples.append(
                    {"text": torch.tensor(rng.randint(1, 50257, size=S - 1))}
                )
            elif k == 1:
                examples.append(
                    {
                        "continuous_obs": torch.tensor(
                            rng.randn(ctx_ts_cont, 8).astype(np.float32)
                        ),
                        "continuous_actions": torch.tensor(
                            np.tanh(rng.randn(ctx_ts_cont, 2)).astype(np.float32)
                        ),
                    }
                )
            else:
                examples.append(
                    {
                        "images": torch.tensor(
                            rng.randint(0, 255, (ctx_ts_img, 3, 96, 96)).astype(
                                np.float32
                            )
                        ),
                        "discrete_actions": torch.tensor(
                            rng.randint(0, 18, size=(ctx_ts_img, 1)).astype(
                                np.int64
                            )
                        ),
                    }
                )
        batches.append(examples)
    return batches


def main():
    import torch

    torch.set_num_threads(os.cpu_count() or 1)
    GatoPolicy = _load_reference_policy()
    torch.manual_seed(0)
    model = GatoPolicy(
        device="cpu",
        embed_dim=D,
        layers=L,
        heads=H,
        dropout=0.1,
        patch_size=16,
        resid_mid_channels=128,
        num_groups=32,
        position_vocab_size=128,
        context_len=S,
        activation_fn="gelu",
        use_pos_encoding=True,
        use_patch_pos_encoding=True,
        flash=True,  # reference's fastest path (torch SDPA)
        pad_seq=False,
    )
    model.train()
    opt = torch.optim.AdamW(
        model.parameters(), lr=1e-4, betas=(0.9, 0.95), eps=1e-8, weight_decay=0.1
    )

    batches = build_batches(torch, WARMUP + STEPS)

    def step(batch):
        logits, loss = model.forward(inputs=batch, compute_loss=True)
        opt.zero_grad(set_to_none=True)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        opt.step()
        return float(loss)

    for b in batches[:WARMUP]:
        step(b)

    t0 = time.perf_counter()
    losses = [step(b) for b in batches[WARMUP:]]
    dt = time.perf_counter() - t0

    tokens_per_step = BATCH * S
    tokens_per_sec = tokens_per_step * STEPS / dt
    result = {
        "reference_tokens_per_sec": round(tokens_per_sec, 2),
        "seconds_per_step": round(dt / STEPS, 3),
        "steps_measured": STEPS,
        "losses": [round(x, 4) for x in losses],
        "config": {
            "embed_dim": D,
            "layers": L,
            "heads": H,
            "context_len": S,
            "batch_size": BATCH,
            "mixture": "1/3 text + 1/3 mujoco-like + 1/3 atari-like (bench.py::build_batch)",
            "flash": True,
            "dropout": 0.1,
        },
        "hardware": {
            "device": "cpu",
            "torch_threads": torch.get_num_threads(),
            "cpu_count": os.cpu_count(),
            "platform": platform.platform(),
            "torch_version": torch.__version__,
            "note": (
                "torch in this environment is CPU-only; this is the reference "
                "measured like-for-like on the build host. The A100 ESTIMATE "
                "used for vs_baseline remains documented in bench.py."
            ),
        },
    }
    out = os.path.join(REPO, "BASELINE_MEASURED.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
