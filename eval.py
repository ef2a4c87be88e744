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
    mgr = CK.make_manager(cfg.train.checkpoint_dir, cfg.train.keep_checkpoints)
    restored = CK.restore(mgr, state)
    if restored is not None:
        state = restored
        log.log("restored", step=int(jax.device_get(state.step)))
    else:
        log.log("warning", message="no checkpoint found; evaluating random init")

    # chain the first batch back in front
    def batches():
        yield first
        yield from it

    res = run_eval(cfg, state, batches(), max_batches=args.max_batches,
                   num_scenes=len(loader.dataset))
    log.log("eval", **res)
    loader.close()


if __name__ == "__main__":
    main()
