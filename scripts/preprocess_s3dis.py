#!/usr/bin/env python
"""Preprocess raw S3DIS (Stanford3dDataset aligned) rooms into .npz scenes.

Input: <raw>/Area_{1..6}/<room>/Annotations/<object>_<i>.txt files with
``x y z r g b`` rows; each annotation file is one instance.
Output: <out>/Area_<n>_<room>.npz (flat layout; the S3DISDataset reader
splits by test area).
"""

import argparse
import glob
import os

import numpy as np

CLASSES = [
    "ceiling", "floor", "wall", "beam", "column", "window", "door",
    "table", "chair", "sofa", "bookcase", "board", "clutter",
]
# instance classes: structural categories are semantic-only
INSTANCE_CLASSES = {"table", "chair", "sofa", "bookcase", "board", "door", "window"}


def process_room(room_dir: str):
    pts_all, rgb_all, sem_all, inst_all = [], [], [], []
    next_inst = 0
    for ann in sorted(glob.glob(os.path.join(room_dir, "Annotations", "*.txt"))):
        name = os.path.basename(ann).rsplit("_", 1)[0]
        if name not in CLASSES:
            name = "clutter"
        cls = CLASSES.index(name)
        data = np.loadtxt(ann)
        if data.ndim == 1:
            data = data[None]
        pts_all.append(data[:, :3].astype(np.float32))
        rgb_all.append((data[:, 3:6] / 127.5 - 1.0).astype(np.float32))
        sem_all.append(np.full(len(data), cls, np.int32))
        if name in INSTANCE_CLASSES:
            inst_all.append(np.full(len(data), next_inst, np.int32))
            next_inst += 1
        else:
            inst_all.append(np.full(len(data), -1, np.int32))
    return {
        "points": np.concatenate(pts_all),
        "feats": np.concatenate(rgb_all),
        "semantic": np.concatenate(sem_all),
        "instance": np.concatenate(inst_all),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--raw", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    for area in sorted(glob.glob(os.path.join(args.raw, "Area_*"))):
        for room in sorted(os.listdir(area)):
            room_dir = os.path.join(area, room)
            if not os.path.isdir(room_dir):
                continue
            out_path = os.path.join(
                args.out, f"{os.path.basename(area)}_{room}.npz"
            )
            if os.path.exists(out_path):
                continue
            try:
                np.savez_compressed(out_path, **process_room(room_dir))
                print(f"{out_path}: ok")
            except Exception as e:
                print(f"{out_path}: FAILED {e}")


if __name__ == "__main__":
    main()
