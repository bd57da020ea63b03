"""Inspect a neko-tpu checkpoint: step, param counts, shapes, EMA presence.

    python tools/inspect_checkpoint.py --model_path models/<exp> [--tree]

Reads the Orbax metadata only — no device compute, no model build — so it
works on any host in seconds.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", required=True,
                   help="checkpoint_<N> dir, or an exp dir (latest used)")
    p.add_argument("--tree", action="store_true",
                   help="print every leaf path with shape/dtype")
    cli = p.parse_args()

    import jax

    # metadata-only: never touch the accelerator (a wedged tunnel hangs
    # any backend init; the axon harness ignores JAX_PLATFORMS env vars)
    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import orbax.checkpoint as ocp

    from neko_tpu.utils.checkpoint import (
        load_args_dict,
        resolve_checkpoint_dir,
    )

    ckpt = resolve_checkpoint_dir(cli.model_path)

    meta = ocp.StandardCheckpointer().metadata(os.path.abspath(ckpt))
    tree = getattr(meta, "item_metadata", meta)
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]

    def size(v):
        return int(np.prod(v.shape)) if getattr(v, "shape", None) else 1

    sections = {}
    for path, v in leaves:
        keys = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
        sections.setdefault(keys[0], []).append((".".join(keys), v))

    print(f"checkpoint: {ckpt}")
    try:
        args = load_args_dict(os.path.dirname(ckpt))
        print(f"run args: embed_dim={args.get('embed_dim')} "
              f"layers={args.get('layers')} heads={args.get('heads')} "
              f"k={args.get('sequence_length')} seed={args.get('seed')}")
    except FileNotFoundError:
        pass
    for sec in sorted(sections):
        n = sum(size(v) for _, v in sections[sec])
        print(f"  {sec:<16} {n:>14,} values "
              f"({len(sections[sec])} arrays)")
    total_params = sum(
        size(v) for _, v in sections.get("params", [])
    )
    print(f"trainable params: {total_params:,}")
    if "ema_params" in sections:
        print("ema shadow: present (eval with --use_ema)")
    if cli.tree:
        for sec in sorted(sections):
            for name, v in sections[sec]:
                print(f"  {name}  {getattr(v, 'shape', ())} "
                      f"{getattr(v, 'dtype', '')}")


if __name__ == "__main__":
    main()
