#!/usr/bin/env python
"""Evaluation CLI: restore a checkpoint and report instance mAP on a split."""

import argparse

from train import parse_overrides


def main():
    from sparse_rcnn_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("--set", action="append", dest="overrides")
    ap.add_argument("--split", default="val")
    ap.add_argument("--max-batches", type=int, default=None)
    ap.add_argument("--step", type=int, default=None,
                    help="checkpoint step to restore (default: latest) — "
                         "e.g. the best-mAP step rather than the last")
    ap.add_argument("--raw-params", action="store_true",
                    help="with train.ema > 0: score the raw (last-step) "
                         "weights of the SAME checkpoint instead of the EMA "
                         "weights — the controlled drift comparison")
    ap.add_argument("--best", action="store_true",
                    help="restore from <checkpoint_dir>_best (the best-"
                         "mid-run-mAP weights train.py retains)")
    ap.add_argument("--per-class", action="store_true",
                    help="also report AP@t per class id (ScanNet-style table)")
    ap.add_argument("--per-scene", action="store_true",
                    help="also report the per-scene mAP@0.5 list and its "
                         "mean/std/min/max (eval-subset sensitivity)")
    args = ap.parse_args()

    import jax

    from sparse_rcnn_tpu.config import load_config
    from sparse_rcnn_tpu.data.pipeline import Loader
    from sparse_rcnn_tpu.train import checkpoint as CK
    from sparse_rcnn_tpu.train import loop as TL
    from sparse_rcnn_tpu.train.evaluate import run_eval
    from sparse_rcnn_tpu.utils.logging import JsonlLogger

    cfg = load_config(args.config, parse_overrides(args.overrides))
    log = JsonlLogger()
    loader = Loader(cfg, args.split, train=False)
    it = iter(loader)
    first = next(it)
    state = TL.init_state(cfg, first)
    ckpt_dir = (CK.best_dir(cfg.train.checkpoint_dir) if args.best
                else cfg.train.checkpoint_dir)
    mgr = CK.make_manager(ckpt_dir, cfg.train.keep_checkpoints)
    restored = CK.restore(mgr, state, step=args.step)
    if restored is not None:
        state = restored
        log.log("restored", step=int(jax.device_get(state.step)))
    else:
        log.log("warning", message="no checkpoint found; evaluating random init")
    if args.raw_params and state.ema_params is not None:
        # the eval step reads ema_params when train.ema > 0; aliasing them
        # to the raw params scores the unsmoothed weights of the same run
        state = state.replace(ema_params=state.params)
        log.log("eval_params", source="raw")

    # chain the first batch back in front
    def batches():
        yield first
        yield from it

    res = run_eval(cfg, state, batches(), max_batches=args.max_batches,
                   num_scenes=len(loader.dataset), per_class=args.per_class,
                   per_scene=args.per_scene)
    log.log("eval", **res)
    loader.close()


if __name__ == "__main__":
    main()
