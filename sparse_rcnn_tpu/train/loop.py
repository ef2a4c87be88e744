"""Training step + loop (SURVEY.md C20, L5).

One fully-jitted ``train_step`` does everything after host data loading:
device voxelization → hierarchy build → GT construction → forward →
losses → grads → optax update (+ batch-stats update). Under GSPMD the same
step runs unchanged on a device mesh with the batch sharded over the
``data`` axis — gradient all-reduce is inserted by XLA (SURVEY.md §2
parallelism table: DP first-class, everything else N/A).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import core, struct

from ..config import Config
from ..data.gt import build_scene_gt
from ..models import SparseRCNN, rpn_targets, roi_targets
from ..models import losses as L
from ..ops import hierarchy as H
from ..ops import voxelize as V


@struct.dataclass
class TrainState:
    step: jax.Array
    params: core.FrozenDict
    batch_stats: core.FrozenDict
    opt_state: Any
    rng: jax.Array
    # Exponential moving average of params (cfg.train.ema > 0), used by
    # eval. None when EMA is off — a None field is an EMPTY pytree node,
    # so the state's leaf structure (and therefore orbax checkpoints)
    # stays byte-identical to pre-EMA checkpoints
    # (tests/e2e/test_train.py::test_checkpoint_restores_pre_ema_format).
    ema_params: Any = None


def train_cfg(cfg: Config) -> Config:
    """The config the TRAIN step runs with: the per-mode tail boundary
    ``backbone.dense_from_scale_train`` (when set) replaces the eval-form
    ``dense_from_scale``. Params/checkpoints live in this TRAIN form —
    :func:`eval_step` converts to the eval form on the fly
    (models/convert.py; exact reparametrization). Idempotent."""
    import dataclasses

    bb = cfg.model.backbone
    t = bb.dense_from_scale_train
    if t is None or t == bb.dense_from_scale:
        return cfg
    return dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, backbone=dataclasses.replace(bb, dense_from_scale=t)))


def make_schedule(cfg: Config):
    # config step counts are MICRO-steps; the schedule is consumed once per
    # optimizer update, i.e. every grad_accum_steps micro-steps
    k = max(1, cfg.train.grad_accum_steps)
    total = max(cfg.train.total_steps // k, 1)
    warmup = min(cfg.train.warmup_steps // k, max(total // 10, 0))
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=cfg.train.lr,
        warmup_steps=warmup,
        decay_steps=max(total, warmup + 1),
        end_value=cfg.train.lr * 0.01,
    )


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    sched = make_schedule(cfg)
    if cfg.train.optimizer == "sgd":
        opt = optax.sgd(sched, momentum=0.9)
    else:
        opt = optax.adamw(sched, weight_decay=cfg.train.weight_decay)
    opt = optax.chain(optax.clip_by_global_norm(cfg.train.grad_clip), opt)
    if cfg.train.grad_accum_steps > 1:
        # mean-accumulate k micro-grads, apply the inner chain (clip +
        # optimizer) to the MEAN on every k-th call — numerically the
        # large-batch update, at micro-batch activation memory
        opt = optax.MultiSteps(opt, every_k_schedule=cfg.train.grad_accum_steps)
    return opt


def build_model(cfg: Config) -> SparseRCNN:
    dtype = jnp.bfloat16 if cfg.model.backbone.dtype == "bfloat16" else jnp.float32
    return SparseRCNN(cfg.model, dtype=dtype)


def prepare_inputs(cfg: Config, batch: Dict[str, jax.Array]):
    """Device-side front half: voxelize + hierarchy + GT. Pure, jit-safe.

    If the batch carries host-voxelized tables (C++ core in the loader
    workers, BASELINE config 5 overlap), device voxelization is skipped —
    the native path's output contract is identical (tests/parity).
    """
    from ..sparse import make_sparse_tensor

    vs = jnp.asarray(cfg.data.voxel_size)
    if "voxel_coords" in batch:
        st = make_sparse_tensor(
            batch["voxel_coords"], batch["voxel_feats"],
            batch["voxel_nvalid"], assume_sorted=True,
        )
        p2v, ovf = batch["p2v"], batch["voxel_overflow"]
    else:
        st, p2v, ovf = V.voxelize_batch(
            batch["points"], batch["feats"], batch["valid"], vs,
            cfg.data.voxel_capacity,
        )
    # Integer per-scene rebase to non-negative coords: exact (integer
    # translation commutes with every op bit-for-bit) and required by the
    # dense backbone tail's [0, grid_extent) frame. GT boxes get the same
    # shift below so all geometry stays in one frame.
    st, base = V.rebase_coords(st, margin=2)
    scales, hovf = H.build_hierarchy(
        st, len(cfg.model.backbone.widths), cfg.scale_capacities(),
        cfg.model.backbone.kernel_size,
        subm_scales=cfg.model.backbone.dense_from_scale,
    )
    gt = build_scene_gt(
        batch["points"], batch["valid"], batch["point_instance"],
        batch["point_semantic"], p2v, cfg.data.voxel_capacity, vs,
        cfg.model.max_instances, base=base,
    )
    # overflow counters (BASELINE config 3: capacity-overflow paths must be
    # observable, not silent)
    aux = {
        "voxel_overflow": jnp.sum(ovf),
        "hierarchy_overflow": jnp.sum(hovf),
        "voxels_per_scene": jnp.mean(st.nvalid.astype(jnp.float32)),
        # GT instance-capacity overflow: points whose instance id does not
        # fit max_instances (build_scene_gt's segment ops drop those ids
        # from boxes/classes — deterministic policy, but it must be
        # countable, not silent; the evaluator still scores them as
        # unmatched GT via the raw point labels)
        "gt_instance_overflow": jnp.sum(
            batch["valid"] & (batch["point_instance"] >= cfg.model.max_instances)
        ),
    }
    dfs = cfg.model.backbone.dense_from_scale
    if dfs is not None:
        # Dense-tail drop counter: scatter_to_grid silently zeroes any site
        # outside [0, grid_extent >> dfs) — e.g. a room larger than the
        # configured extent. Same observability contract as the capacity
        # overflows above (SURVEY.md §7 invariant 1). Counted here (a pure
        # function of the scale-dfs site set) so it rides the step metrics
        # without threading counters through the flax modules; a site
        # outside at scale dfs is outside at every deeper scale too.
        ext = jnp.asarray(
            [e >> dfs for e in cfg.model.backbone.grid_extent], jnp.int32
        )
        sc = scales[dfs]
        live = (
            jnp.arange(sc.coords.shape[1], dtype=jnp.int32)[None, :]
            < sc.nvalid[:, None]
        )
        oob = live & ~jnp.all((sc.coords >= 0) & (sc.coords < ext), axis=-1)
        aux["dense_tail_oob"] = jnp.sum(oob)
    return st, p2v, scales, gt, aux


def pool_instance_labels(gt, scales, max_level: int = None):
    """Per-scale voxel instance ids: max over each coarse voxel's children.

    Only levels [0, max_level] are built (dense-tail scales carry no
    down rulebooks, and only RPN scales need pooled labels anyway).
    """
    from ..ops.batching import map_scenes

    n = len(scales) - 1 if max_level is None else max_level
    levels = [gt.voxel_instance]
    for s in range(n):
        idx = scales[s].down_idx  # [B, 8, M_{s+1}]
        prev = levels[-1]

        def one(v, ix):
            safe = jnp.clip(ix, 0, v.shape[0] - 1)
            g = jnp.where(ix >= 0, v[safe], -1)
            return jnp.max(g, axis=0)

        # batch policy (ops/batching.py): gathers under vmap take XLA's
        # batched emitters — unroll/shard_map instead
        levels.append(map_scenes(one, prev, idx))
    return levels


def compute_losses(cfg: Config, out, scales, gt, row_mask):
    from ..models import paint_instance_masks

    rpn_scales = cfg.model.rpn.rpn_scales or (cfg.model.rpn.rpn_scale,)
    inst_levels = pool_instance_labels(gt, scales, max_level=max(rpn_scales))
    obj_l = box_l = 0.0
    for i, s in enumerate(rpn_scales):
        rt = rpn_targets(
            scales[s].coords, out["rpn_mask"][i], gt,
            cfg.model.rpn.box_norm, 1 << s,
            voxel_instance=inst_levels[s],
        )
        o, bx = L.rpn_loss(out["rpn_obj"][i], out["rpn_deltas"][i], rt)
        obj_l = obj_l + o / len(rpn_scales)
        box_l = box_l + bx / len(rpn_scales)
    tt = roi_targets(
        out["crop_boxes"], out["proposal_mask"], scales[0].coords,
        scales[0].nvalid, gt, cfg.model,
    )
    # mask loss at the actual voxels, through the same sampling path used
    # at inference (train/eval alignment)
    voxel_mask_logits, _ = paint_instance_masks(out, scales, masked=False)
    parts = {
        "rpn_obj": obj_l,
        "rpn_box": box_l,
        "roi_cls": L.roi_cls_loss(out["cls_logits"], tt),
        "roi_mask": L.roi_mask_loss(voxel_mask_logits, tt),
    }
    if cfg.model.use_semantic_head:
        parts["semantic"] = L.semantic_loss(
            out["semantic_logits"], gt.voxel_semantic, row_mask,
            cfg.model.num_classes,
        )
    return L.total_loss(parts, cfg.train.loss_weights), parts


def init_state(cfg: Config, sample_batch: Dict[str, jax.Array]) -> TrainState:
    cfg = train_cfg(cfg)  # state/checkpoints live in the TRAIN form
    model = build_model(cfg)
    # One jitted program instead of eager op-at-a-time execution: eager
    # init at the 2cm shape was ~20 min of serial tiny compiles through
    # the device tunnel; a single compiled init is minutes cheaper and
    # numerically identical (PRNG semantics are trace-invariant).
    st, _, scales, _, _ = jax.jit(
        functools.partial(prepare_inputs, cfg)
    )(sample_batch)
    rng = jax.random.PRNGKey(cfg.train.seed)
    rng, init_rng = jax.random.split(rng)
    variables = jax.jit(
        lambda r, f, s: model.init(r, f, s, train=False)
    )(init_rng, st.feats, scales)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", core.FrozenDict())
    opt_state = make_optimizer(cfg).init(params)
    return TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        batch_stats=batch_stats, opt_state=opt_state, rng=rng,
        # distinct buffers (jnp.copy): the train step donates the state, and
        # aliasing params into ema_params would donate one buffer twice
        ema_params=(jax.tree_util.tree_map(jnp.copy, params)
                    if cfg.train.ema > 0 else None),
    )


def train_step(
    cfg: Config, state: TrainState, batch: Dict[str, jax.Array]
) -> Tuple[TrainState, Dict[str, jax.Array]]:
    """One optimization step. Wrap in jax.jit(static_argnums=0) or use
    :func:`make_train_step`."""
    cfg = train_cfg(cfg)
    model = build_model(cfg)
    st, _, scales, gt, aux = prepare_inputs(cfg, batch)
    # per-step dropout rng only when the backbone asks for it (keeps the
    # default-config trace byte-identical to before)
    if cfg.model.backbone.dropout > 0:
        next_rng, drop_rng = jax.random.split(state.rng)
        rngs = {"dropout": drop_rng}
    else:
        next_rng, rngs = state.rng, None

    def loss_fn(params):
        out, updates = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            st.feats, scales, train=True,
            gt_boxes=gt.boxes, gt_boxes_valid=gt.valid,
            mutable=["batch_stats"], rngs=rngs,
        )
        total, parts = compute_losses(cfg, out, scales, gt, st.row_mask)
        return total, (parts, updates["batch_stats"])

    (total, (parts, new_stats)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(state.params)
    updates, new_opt = make_optimizer(cfg).update(
        grads, state.opt_state, state.params
    )
    new_params = optax.apply_updates(state.params, updates)
    metrics = dict(parts)
    metrics.update(aux)
    metrics["total"] = total
    metrics["grad_norm"] = optax.global_norm(grads)
    new_state = state.replace(
        step=state.step + 1, params=new_params,
        batch_stats=new_stats, opt_state=new_opt, rng=next_rng,
    )
    if cfg.train.ema > 0:
        # debiased EMA: ramp the decay from 0 so early evals track params
        # instead of the random init (standard (1+t)/(10+t) ramp capped
        # at the configured decay)
        t = state.step.astype(jnp.float32)
        d = jnp.minimum(cfg.train.ema, (1.0 + t) / (10.0 + t))
        if cfg.train.grad_accum_steps > 1:
            # only smooth on micro-steps that APPLIED an update (MultiSteps
            # wraps back to mini_step 0 after applying): params are frozen
            # in between, and repeated no-op smoothing would drag the EMA
            # toward the frozen params k x faster than configured
            applied = (new_opt.mini_step == 0).astype(jnp.float32)
            d = 1.0 - (1.0 - d) * applied
        new_state = new_state.replace(ema_params=jax.tree_util.tree_map(
            lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d),
            state.ema_params, new_params,
        ))
    return new_state, metrics


def make_train_step(cfg: Config):
    return jax.jit(functools.partial(train_step, cfg), donate_argnums=(0,))


def eval_step(cfg: Config, state: TrainState, batch: Dict[str, jax.Array]):
    """Inference forward: returns model outputs + painted voxel masks + p2v."""
    from ..models import paint_instance_masks

    model = build_model(cfg)
    st, p2v, scales, gt, _ = prepare_inputs(cfg, batch)
    # evaluate the EMA weights when configured (cfg is trace-static)
    params = state.ema_params if cfg.train.ema > 0 else state.params
    stats = state.batch_stats
    bb = cfg.model.backbone
    if (bb.dense_from_scale_train is not None
            and bb.dense_from_scale_train != bb.dense_from_scale):
        # state lives in the TRAIN tail form — reparametrize to the eval
        # form inside the jitted step (reshapes/flips only; exact)
        from ..models.convert import convert_variables

        params = convert_variables(dict(params), bb.dense_from_scale)
        stats = convert_variables(dict(stats), bb.dense_from_scale)
    out = model.apply(
        {"params": params, "batch_stats": stats},
        st.feats, scales, train=False,
    )
    vox_logits, _ = paint_instance_masks(out, scales)
    point_logits = V.devoxelize(
        jnp.swapaxes(vox_logits, 1, 2), p2v, fill_value=-1e9
    )  # [B, N, P]
    pml = jnp.swapaxes(point_logits, 1, 2)                      # [B, P, N]
    result = {
        "proposal_scores": out["proposal_scores"],
        "proposal_mask": out["proposal_mask"],
        "cls_logits": out["cls_logits"],
        "point_mask_logits": pml,
        # thresholded ON DEVICE at sigmoid 0.5 (logit 0) and bit-packed:
        # the evaluator only needs booleans, and arrays are fetched
        # per-key — pulling packed bits instead of the f32 logits cuts
        # eval host transfer 32x (at 2cm: 268 MB -> 8.4 MB per batch
        # through the tunnel); host side unpacks + slices to N
        "point_mask_bits": jnp.packbits(pml > 0.0, axis=-1),
        "gt": gt,
    }
    if cfg.model.use_semantic_head:
        sem_pred = jnp.argmax(out["semantic_logits"], -1).astype(jnp.int32)
        result["point_semantic_pred"] = V.devoxelize(sem_pred, p2v, fill_value=-1)
    return result


def make_eval_step(cfg: Config):
    return jax.jit(functools.partial(eval_step, cfg))
