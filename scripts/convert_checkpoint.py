#!/usr/bin/env python
"""Convert a checkpoint's backbone execution form (dense-tail boundary).

Checkpoints store params in the TRAIN form (``backbone.dense_from_scale_train``
when set — see train/loop.py). This tool rewrites a checkpoint into any
other tail-boundary form so it can be restored under a config without the
per-mode knob (e.g. a pure-eval serving config at dense-2, or a fully
sparse deployment):

    python scripts/convert_checkpoint.py --config configs/config2_scannet_2cm.yaml \
        --to-dense 2 --out-dir checkpoints/config2_dense2 [--step N] [--best]

``--to-dense none`` produces the fully-sparse form. The conversion is an
exact reparametrization (models/convert.py): params, EMA params,
batch_stats AND the optimizer moments (adam mu/nu mirror the param tree)
are permuted consistently, so training can resume from the converted
checkpoint with bit-equivalent dynamics.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def convert_state_trees(node, to_s0):
    """Recursively convert every subtree that looks like a detector param
    tree (a mapping with a 'backbone' child) — covers params, ema_params,
    batch_stats, and the param-shaped moment trees inside optax states
    (NamedTuples / tuples are rebuilt preserving type)."""
    from collections.abc import Mapping

    from sparse_rcnn_tpu.models.convert import convert_variables

    if isinstance(node, Mapping):  # dict / flax FrozenDict
        if "backbone" in node:
            return convert_variables(dict(node), to_s0)
        return {k: convert_state_trees(v, to_s0) for k, v in node.items()}
    if isinstance(node, tuple):
        vals = (convert_state_trees(x, to_s0) for x in node)
        return type(node)(*vals) if hasattr(node, "_fields") else tuple(vals)
    if isinstance(node, list):
        return [convert_state_trees(x, to_s0) for x in node]
    return node


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--to-dense", required=True,
                    help="target dense_from_scale (int) or 'none' for the "
                         "fully sparse form")
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--step", type=int, default=None)
    ap.add_argument("--best", action="store_true",
                    help="convert <checkpoint_dir>_best instead")
    ap.add_argument("--set", action="append", dest="overrides")
    args = ap.parse_args()

    from train import parse_overrides

    from sparse_rcnn_tpu.config import load_config
    from sparse_rcnn_tpu.data.pipeline import Loader
    from sparse_rcnn_tpu.train import checkpoint as CK
    from sparse_rcnn_tpu.train import loop as TL

    to_s0 = None if args.to_dense.lower() == "none" else int(args.to_dense)
    cfg = load_config(args.config, parse_overrides(args.overrides))

    loader = Loader(cfg, "val", train=False)
    first = next(iter(loader))
    state = TL.init_state(cfg, first)
    loader.close()
    src = (CK.best_dir(cfg.train.checkpoint_dir) if args.best
           else cfg.train.checkpoint_dir)
    restored = CK.restore(CK.make_manager(src, cfg.train.keep_checkpoints),
                          state, step=args.step)
    if restored is None:
        raise SystemExit(f"no checkpoint under {src!r}")
    state = restored

    state = state.replace(
        params=convert_state_trees(dict(state.params), to_s0),
        batch_stats=convert_state_trees(dict(state.batch_stats), to_s0),
        ema_params=(convert_state_trees(dict(state.ema_params), to_s0)
                    if state.ema_params is not None else None),
        opt_state=convert_state_trees(state.opt_state, to_s0),
    )
    out_mgr = CK.make_manager(args.out_dir, keep=1)
    CK.save(out_mgr, state)
    out_mgr.wait_until_finished()
    import jax

    print(f"converted step {int(jax.device_get(state.step))} -> "
          f"dense_from_scale={to_s0} at {args.out_dir}")


if __name__ == "__main__":
    main()
