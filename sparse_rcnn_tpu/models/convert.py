"""Backbone execution-form conversion: sparse ⇄ dense-tail parameter trees.

``dense_from_scale`` is an EXECUTION-STRATEGY knob, not an architecture
change: the dense tail computes exactly the submanifold sum (empty cells
hold zeros — tests/parity/test_dense_tail.py), so a backbone trained with
one tail boundary can run with another after a pure reparametrization of
its weights: flax tree entries for scales past the boundary move in/out of
the ``dense_tail`` submodule and conv kernels change layout:

  * submanifold block conv  [K³, Cin, Cout]  ⇄  flipped [K,K,K,Cin,Cout]
    (``lax.conv`` computes correlation; the rulebook enumerates offsets in
    the opposite order, hence the flip — derived in test_dense_tail)
  * k2s2 down conv          [8, Cin, Cout]   ⇄  [2,2,2,Cin,Cout] (no flip)
  * k2s2 up (inverse) conv  [8, Cin, Cout]   ⇄  ConvTranspose kernel (flip)
  * 1×1 residual proj       [1, Cin, Cout]   ⇄  [1,1,1,Cin,Cout]
  * BN / bias entries                        ⇄  renamed only

This powers the per-mode knob ``backbone.dense_from_scale_train`` (train
with the boundary that is fastest for the BACKWARD, evaluate/serve with
the boundary that is fastest FORWARD — measured −11% train at dense-3 vs
−3.5% eval at dense-2 on the 2cm shape, BASELINE.md) and a checkpoint
conversion utility. Works on params AND batch_stats trees: entries without
conv kernels are renamed, never touched.

All transforms are reshapes/flips — cheap enough to run inside the jitted
eval step, and exactly invertible (round-trip tested).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp


def _scale_of(name: str) -> Optional[int]:
    for p in ("enc", "dec", "up", "down"):
        if name.startswith(p) and len(name) > len(p) and name[len(p)].isdigit():
            i = len(p)
            while i < len(name) and name[i].isdigit():
                i += 1
            return int(name[len(p):i])
    return None


# ---- kernel layout transforms (sparse row-major tap order <-> lax.conv) ---

def _to_dense_kernel(w, flip: bool):
    """[K³|8|1, Cin, Cout] tap-major → [k,k,k,Cin,Cout] spatial kernel."""
    k = round(w.shape[0] ** (1.0 / 3.0))
    assert k ** 3 == w.shape[0], w.shape
    w = jnp.asarray(w).reshape(k, k, k, *w.shape[1:])
    return w[::-1, ::-1, ::-1] if flip else w


def _to_sparse_kernel(w, flip: bool):
    """Inverse of :func:`_to_dense_kernel`."""
    w = jnp.asarray(w)
    k = w.shape[0]
    if flip:
        w = w[::-1, ::-1, ::-1]
    return w.reshape(k ** 3, *w.shape[3:])


def tree_boundary(tree: Dict[str, Any]) -> Optional[int]:
    """The dense-tail start scale of a backbone tree (None = fully sparse)."""
    if "dense_tail" not in tree:
        return None
    scales = [_scale_of(k) for k in tree["dense_tail"]]
    return min(s for s in scales if s is not None)


def _block_to_dense(v):
    new = {}
    for sub, sv in v.items():
        if isinstance(sv, dict) and "conv" in sv and "kernel" in sv["conv"]:
            w = sv["conv"]["kernel"]
            new[sub] = {"kernel": _to_dense_kernel(w, flip=w.shape[0] > 1)}
        else:
            new[sub] = sv  # bn entries / stats tree
    return new


def _block_to_sparse(v):
    new = {}
    for sub, sv in v.items():
        if isinstance(sv, dict) and "kernel" in sv:
            w = sv["kernel"]
            new[sub] = {"conv": {"kernel": _to_sparse_kernel(
                w, flip=w.shape[0] > 1)}}
        else:
            new[sub] = sv
    return new


def to_sparse(tree: Dict[str, Any]) -> Dict[str, Any]:
    """Dense-tail backbone tree → fully-sparse form (identity if already)."""
    if "dense_tail" not in tree:
        return dict(tree)
    out = {k: v for k, v in tree.items() if k != "dense_tail"}
    for name, v in tree["dense_tail"].items():
        s = _scale_of(name)
        if name.endswith("_bn"):
            out[name] = v
        elif name == f"down{s}_conv":
            out[name] = {"kernel": _to_sparse_kernel(v["kernel"], flip=False)}
        elif name == f"up{s}_conv":
            out[name] = {"kernel": _to_sparse_kernel(v["kernel"], flip=True)}
        else:  # enc/dec residual block (params or stats)
            out[name] = _block_to_sparse(v)
    return out


def to_dense(tree: Dict[str, Any], s0: int) -> Dict[str, Any]:
    """Fully-sparse backbone tree → dense-tail-from-``s0`` form."""
    assert "dense_tail" not in tree, "call to_sparse first"
    out, tail = {}, {}
    for name, v in tree.items():
        s = _scale_of(name)
        if s is None or s < s0:
            out[name] = v
        elif name.endswith("_bn"):
            tail[name] = v
        elif name == f"down{s}_conv":
            tail[name] = {"kernel": _to_dense_kernel(v["kernel"], flip=False)}
        elif name == f"up{s}_conv":
            tail[name] = {"kernel": _to_dense_kernel(v["kernel"], flip=True)}
        elif name == f"down{s}_proj":
            raise ValueError(
                f"pooling downsample (down{s}_proj) has no spatial kernel — "
                "scales crossing the dense-tail boundary must use "
                "backbone.downsample='conv' to be convertible")
        else:
            tail[name] = _block_to_dense(v)
    if tail:
        out["dense_tail"] = tail
    return out


def convert_backbone(tree: Dict[str, Any],
                     to_s0: Optional[int]) -> Dict[str, Any]:
    """Backbone tree in ANY form → the ``dense_from_scale=to_s0`` form
    (``None`` = fully sparse). Exact reparametrization; composes through
    the sparse form."""
    sp = to_sparse(tree)
    return sp if to_s0 is None else to_dense(sp, to_s0)


def convert_variables(tree: Dict[str, Any], to_s0: Optional[int],
                      backbone_key: str = "backbone") -> Dict[str, Any]:
    """Detector-level params or batch_stats tree with the backbone subtree
    converted to the ``dense_from_scale=to_s0`` execution form."""
    out = dict(tree)
    if backbone_key in out:
        out[backbone_key] = convert_backbone(dict(out[backbone_key]), to_s0)
    return out
