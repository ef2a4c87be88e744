#!/usr/bin/env python
"""Training CLI (SURVEY.md L6).

    python train.py --config configs/config1_tiny.yaml
    python train.py --set train.total_steps=100 --set data.dataset=synthetic
"""

import argparse
import ast
import atexit
import os

import jax


def parse_overrides(pairs):
    out = {}
    for pair in pairs or []:
        key, _, val = pair.partition("=")
        try:
            val = ast.literal_eval(val)
        except (ValueError, SyntaxError):
            pass
        node = out
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return out


def main():
    from sparse_rcnn_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("--set", action="append", dest="overrides",
                    metavar="key.path=value")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--profile", action="store_true")
    ap.add_argument("--log-file", default=None)
    ap.add_argument("--tensorboard", default=None, metavar="DIR",
                    help="mirror numeric metrics to TensorBoard event files")
    args = ap.parse_args()

    from sparse_rcnn_tpu.config import load_config
    from sparse_rcnn_tpu.data.pipeline import Loader
    from sparse_rcnn_tpu.parallel import (
        batch_sharding, make_mesh, make_parallel_train_step, replicate_state,
    )
    from sparse_rcnn_tpu.train import checkpoint as CK
    from sparse_rcnn_tpu.train import loop as TL
    from sparse_rcnn_tpu.train.evaluate import run_eval
    from sparse_rcnn_tpu.utils.logging import JsonlLogger
    from sparse_rcnn_tpu.utils.profiling import StepTimer, maybe_trace

    cfg = load_config(args.config, parse_overrides(args.overrides))

    # Refuse to share a checkpoint_dir with a LIVE trainer: two processes
    # writing the same orbax dir + best-score sidecar interleave silently
    # (near-identical twins even look healthy in the shared jsonl — it
    # happened; see BASELINE.md round-4 run-hygiene caveat). A stale
    # pidfile from a crashed/killed run is reclaimed automatically.
    os.makedirs(cfg.train.checkpoint_dir, exist_ok=True)
    pidfile = os.path.join(cfg.train.checkpoint_dir, "trainer.pid")
    if os.path.exists(pidfile):
        try:
            other = int(open(pidfile).read().strip())
            os.kill(other, 0)  # raises if not running
            raise SystemExit(
                f"checkpoint_dir {cfg.train.checkpoint_dir!r} is in use by "
                f"live trainer pid {other} ({pidfile}); pick another dir or "
                "stop that run first")
        except (ValueError, ProcessLookupError):
            pass  # stale or unreadable — reclaim
        except PermissionError:
            raise SystemExit(
                f"checkpoint_dir {cfg.train.checkpoint_dir!r} is in use by "
                f"a live trainer we cannot signal ({pidfile})")
    with open(pidfile, "w") as f:
        f.write(str(os.getpid()))
    atexit.register(lambda: os.path.exists(pidfile) and os.remove(pidfile))

    log = JsonlLogger(args.log_file, tb_dir=args.tensorboard)
    log.log("config", name=cfg.name, devices=len(jax.devices()))

    mesh = make_mesh(cfg.parallel.num_devices, cfg.parallel.data_axis)
    bshard = batch_sharding(mesh, cfg.parallel.data_axis)
    loader = Loader(cfg, "train", train=True, seed=cfg.train.seed, sharding=bshard)
    it = iter(loader)
    first = next(it)

    state = TL.init_state(cfg, first)
    state = replicate_state(state, mesh)
    mgr = CK.make_manager(cfg.train.checkpoint_dir, cfg.train.keep_checkpoints)
    if args.resume:
        restored = CK.restore(mgr, state)
        if restored is not None:
            state = restored
            log.log("resume", step=int(state.step))

    step_fn = make_parallel_train_step(cfg, mesh)
    # one jitted eval step reused at every eval point (EMA and raw-control
    # passes): a fresh make_eval_step per call would re-trace the whole
    # detector each time — the persistent compile cache skips XLA but not
    # Python/jaxpr tracing
    eval_fn = TL.make_eval_step(cfg)
    timer = StepTimer(cfg.data.batch_size)
    best_mgr = CK.make_manager(CK.best_dir(cfg.train.checkpoint_dir), keep=1)
    # seeded from the sidecar so --resume can't let a worse post-resume
    # eval overwrite the retained best weights (keep=1 rotation)
    best_map = CK.read_best_score(cfg.train.checkpoint_dir)

    with maybe_trace(args.profile):
        batch = first
        while int(jax.device_get(state.step)) < cfg.train.total_steps:
            state, metrics = step_fn(state, batch)
            batch = next(it)
            step = int(jax.device_get(state.step))
            sps = timer.tick()
            if step % cfg.train.log_every == 0:
                log.log("train", step=step, scenes_per_sec=round(sps, 2),
                        **{k: float(v) for k, v in metrics.items()})
            if step % cfg.train.eval_every == 0:
                eval_loader = Loader(cfg, "val", train=False, sharding=bshard)
                n_val = len(eval_loader.dataset)
                # canonical protocol: the SAME leading val scenes at every
                # eval point; quality configs set eval_scenes == val_scenes
                # so this is the identical set eval.py scores at the end
                n_eval = min(cfg.train.eval_scenes or n_val, n_val)
                mb = -(-n_eval // cfg.data.batch_size)  # ceil
                res = run_eval(cfg, state, iter(eval_loader), max_batches=mb,
                               eval_step=eval_fn,
                               num_scenes=min(n_eval, n_val))
                eval_loader.close()
                log.log("eval", step=step, **res)
                if cfg.train.ema > 0 and state.ema_params is not None:
                    # raw-weight control at the same eval point (eval_step
                    # reads ema_params when train.ema > 0 — alias them)
                    raw_loader = Loader(cfg, "val", train=False,
                                        sharding=bshard)
                    raw_res = run_eval(
                        cfg, state.replace(ema_params=state.params),
                        iter(raw_loader), max_batches=mb, eval_step=eval_fn,
                        num_scenes=min(n_eval, n_val))
                    raw_loader.close()
                    log.log("eval_raw", step=step, **raw_res)
                # retain the best-mAP@0.5 weights in a sibling manager so
                # the rotating keep=N window can't drop them before the
                # final post-hoc eval (`eval.py --best`)
                score = res.get("mAP@0.5", res.get("mAP@0.25"))
                if score is not None and score > best_map:
                    best_map = score
                    CK.save(best_mgr, state)
                    CK.write_best_score(cfg.train.checkpoint_dir, score, step)
                    log.log("checkpoint_best", step=step,
                            map50=round(float(score), 4))
            if step % cfg.train.checkpoint_every == 0:
                CK.save(mgr, state)
                log.log("checkpoint", step=step)

    CK.save(mgr, state)
    mgr.wait_until_finished()
    best_mgr.wait_until_finished()
    log.log("done", step=int(jax.device_get(state.step)))
    loader.close()


if __name__ == "__main__":
    main()
