"""Average N checkpoints into one (model soup / trajectory averaging).

    python tools/average_checkpoints.py \
        --checkpoints models/<exp>/checkpoint_100 models/<exp>/checkpoint_200 \
        --out models/<exp>_soup [--weights 0.3 0.7]

Writes <out>/checkpoint_<last_step> + args.json, loadable by eval.py /
serve.py exactly like a training checkpoint (params averaged; step and
optimizer state taken from the LAST checkpoint listed; EMA shadows are
averaged too when every input has one).  The reference has no checkpoint
tooling at all (utils/utils.py:19-32 writes weight-only .pt files).
"""

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoints", nargs="+", required=True,
                   help="two or more checkpoint_<N> dirs (same model config)")
    p.add_argument("--weights", nargs="+", type=float, default=None,
                   help="per-checkpoint weights (default: uniform); "
                        "normalized to sum to 1")
    p.add_argument("--out", required=True, help="output experiment dir")
    cli = p.parse_args()
    assert len(cli.checkpoints) >= 2, "need at least two checkpoints"
    if cli.weights is None:
        w = [1.0 / len(cli.checkpoints)] * len(cli.checkpoints)
    else:
        assert len(cli.weights) == len(cli.checkpoints)
        s = sum(cli.weights)
        w = [x / s for x in cli.weights]

    import jax

    jax.config.update("jax_platforms", "cpu")

    from neko_tpu.cli.build import (
        build_context,
        load_state_for,
        resolve_checkpoint_and_args,
    )
    from neko_tpu.utils.checkpoint import save_checkpoint

    states = []
    ctx = None
    for c in cli.checkpoints:
        ckpt, args = resolve_checkpoint_and_args(c, {"cpu": True})
        if ctx is None:
            ctx, _ = build_context(args, tasks=[], ckpt_path=ckpt)
            base_args = args
        state, _ = load_state_for(ctx, ckpt)
        states.append(state)
        print(f"loaded {ckpt} (step {int(state.step)})")

    def avg(*leaves):
        out = leaves[0].astype("float32") * w[0]
        for wi, leaf in zip(w[1:], leaves[1:]):
            out = out + leaf.astype("float32") * wi
        return out.astype(leaves[0].dtype)

    params = jax.tree.map(avg, *[s.params for s in states])
    last = states[-1]
    ema = None
    if all(s.ema_params is not None for s in states):
        ema = jax.tree.map(avg, *[s.ema_params for s in states])
    soup = last.replace(params=params, ema_params=ema)

    os.makedirs(cli.out, exist_ok=True)
    src_args = os.path.join(
        os.path.dirname(resolve_checkpoint_and_args(
            cli.checkpoints[-1], {})[0]), "args.json"
    )
    dst_args = os.path.join(cli.out, "args.json")
    if not os.path.exists(dst_args):
        shutil.copy(src_args, dst_args)
    path = save_checkpoint(cli.out, soup, step=int(last.step))
    print(f"wrote {path} (weights {['%.3f' % x for x in w]})")


if __name__ == "__main__":
    main()
