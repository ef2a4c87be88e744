#!/usr/bin/env python
"""Inference / visualization CLI (SURVEY.md C24): run scenes, export
per-point instance labels (+ optional colored PLY)."""

import argparse
import os

import numpy as np

from train import parse_overrides


def write_ply(path, points, colors):
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(points)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write("end_header\n")
        for p, c in zip(points, colors):
            f.write(f"{p[0]:.4f} {p[1]:.4f} {p[2]:.4f} {c[0]} {c[1]} {c[2]}\n")


def main():
    from sparse_rcnn_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("--set", action="append", dest="overrides")
    ap.add_argument("--split", default="val")
    ap.add_argument("--num-scenes", type=int, default=1)
    ap.add_argument("--out-dir", default="inference_out")
    ap.add_argument("--ply", action="store_true")
    ap.add_argument("--step", type=int, default=None,
                    help="checkpoint step to restore (default: latest)")
    ap.add_argument("--best", action="store_true",
                    help="restore from <checkpoint_dir>_best")
    args = ap.parse_args()

    import jax

    from sparse_rcnn_tpu.config import load_config
    from sparse_rcnn_tpu.data.pipeline import Loader
    from sparse_rcnn_tpu.train import checkpoint as CK
    from sparse_rcnn_tpu.train import loop as TL
    from sparse_rcnn_tpu.train.evaluate import (fetch_eval_outputs,
                                                 postprocess_scene)

    cfg = load_config(args.config, parse_overrides(args.overrides))
    os.makedirs(args.out_dir, exist_ok=True)
    loader = Loader(cfg, args.split, train=False)
    it = iter(loader)
    first = next(it)
    state = TL.init_state(cfg, first)
    ckpt_dir = (CK.best_dir(cfg.train.checkpoint_dir) if args.best
                else cfg.train.checkpoint_dir)
    restored = CK.restore(
        CK.make_manager(ckpt_dir, cfg.train.keep_checkpoints), state,
        step=args.step,
    )
    if restored is not None:
        state = restored
    step = TL.make_eval_step(cfg)

    rng = np.random.default_rng(0)
    palette = rng.integers(40, 255, (256, 3))
    done = 0
    batch = first
    while done < args.num_scenes:
        # selective fetch: masks come from the packed-bits path; the 268MB
        # f32 logits stay on device (train/evaluate.py helper)
        out = fetch_eval_outputs(step(state, batch))
        for b in range(cfg.data.batch_size):
            if done >= args.num_scenes:
                break
            masks, scores, pred_cls, pmask = postprocess_scene(
                out, b, cfg.model.num_classes
            )
            pts = np.asarray(batch["points"][b])
            valid = np.asarray(batch["valid"][b])
            inst_label = np.full(len(pts), -1, np.int32)
            order = np.argsort(-scores)
            for rank, p in enumerate(order):
                if pmask[p]:
                    sel = masks[p] & (inst_label < 0)
                    inst_label[sel] = rank
            np.savez(
                os.path.join(args.out_dir, f"scene{done:04d}.npz"),
                points=pts[valid], instance=inst_label[valid],
                scores=scores, classes=pred_cls, proposal_valid=pmask,
            )
            if args.ply:
                colors = np.where(
                    inst_label[valid, None] >= 0,
                    palette[inst_label[valid] % 256], 128,
                ).astype(np.uint8)
                write_ply(os.path.join(args.out_dir, f"scene{done:04d}.ply"),
                          pts[valid], colors)
            print(f"scene {done}: {int(pmask.sum())} instances, "
                  f"{(inst_label >= 0).sum()} labeled points")
            done += 1
        try:
            batch = next(it)
        except StopIteration:
            break
    loader.close()


if __name__ == "__main__":
    main()
