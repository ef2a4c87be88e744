#!/usr/bin/env python
"""Row-gather bandwidth study on the v5e (VERDICT r2 item 1 / r3 headline).

Scales 0-1 of the 2cm forward are gather-bound: BASELINE.md measured row
gathers at ~2.7 ms/M rows bf16 C=32 == 24 GB/s against ~800 GB/s HBM. This
study answers the question that decides the round-3 executor design:

    Is XLA's gather cost per-ROW (fixed descriptor overhead, so wider rows
    ride free) or per-BYTE (so layout changes don't help)?

Sweeps, all with the chained-scan protocol (see the axon measurement-
pitfalls note: data-dependent carry feeds the indices so the relay can't
dedup and XLA can't hoist):

  * row width C in {16, 32, 64, 128, 256} x dtype {bf16, f32}, random idx
  * index order: random | sorted (monotone, conv-rulebook-like) | near-id
  * pencil emulation: 1 gather of [N, 3C] from a shifted-concat table vs
    3 gathers of [N, C] (equal useful bytes — the z-pencil executor bet)
  * brick emulation: indices grouped in runs of 2/4/8 consecutive rows
    (does XLA exploit contiguity it can't see statically? expect no)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/gather_study.py
Prints one JSON line per measurement + a summary table.
"""

import functools
import json
import sys
import time

sys.path.insert(0, ".")
from sparse_rcnn_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402

print = functools.partial(print, flush=True)

M = 1 << 18          # table rows (2cm scale-0 capacity)
N = 1 << 20          # queries (~ K x M of one conv layer / 7)
ITERS = 16


def chained_gather(table, idx0, iters=ITERS):
    """Sum over `iters` gathers whose indices depend on the previous result."""
    m = table.shape[0]

    def step(carry, i):
        # carry is a data value: the shift below can't be constant-folded,
        # hoisted, or relay-deduped
        shift = (carry.astype(jnp.int32) % 7) + i
        idx = (idx0 + shift) % m
        g = table[idx]                       # [N, C] row gather — the op
        s = jnp.sum(g[:: 4096].astype(jnp.float32))
        return carry + s, None

    out, _ = lax.scan(step, jnp.float32(0.0), jnp.arange(iters))
    return out


def time_one(fn, *args):
    """Compile+warm with perturbed args, then time one chained call."""
    f = jax.jit(fn)
    warm = tuple(a + 1 if a.dtype in (jnp.int32,) else a for a in args)
    jax.block_until_ready(f(*warm))
    t0 = time.perf_counter()
    jax.block_until_ready(f(*args))
    return (time.perf_counter() - t0) / ITERS


def report(name, dt, rows, bytes_per_row):
    ms_per_m = dt / rows * 1e3 * 1e6
    gbs = rows * bytes_per_row / dt / 1e9
    print(json.dumps({
        "case": name, "ms_per_Mrow": round(ms_per_m, 3),
        "GB_s": round(gbs, 1), "rows": rows, "bytes_per_row": bytes_per_row,
    }))
    return ms_per_m, gbs


def main():
    print(f"# device: {jax.devices()[0]}, table M={M}, queries N={N}, "
          f"iters={ITERS}")
    rng = np.random.default_rng(0)
    idx_random = jnp.asarray(rng.integers(0, M, N, dtype=np.int32))
    idx_sorted = jnp.asarray(np.sort(np.asarray(idx_random)))

    results = {}
    # ---- width x dtype sweep, random order -------------------------------
    for dtype, dname in ((jnp.bfloat16, "bf16"), (jnp.float32, "f32")):
        for c in (16, 32, 64, 128, 256):
            table = jnp.asarray(
                rng.standard_normal((M, c), dtype=np.float32)
            ).astype(dtype)
            dt = time_one(chained_gather, table, idx_random)
            bpr = c * jnp.dtype(dtype).itemsize
            results[f"rand_{dname}_C{c}"] = report(
                f"random {dname} C={c}", dt, N, bpr)

    # ---- index order, bf16 C=32 -----------------------------------------
    table32 = jnp.asarray(
        rng.standard_normal((M, 32), dtype=np.float32)).astype(jnp.bfloat16)
    dt = time_one(chained_gather, table32, idx_sorted)
    results["sorted_bf16_C32"] = report("sorted bf16 C=32", dt, N, 64)
    idx_nearid = jnp.asarray(
        np.clip(np.arange(N) % M + rng.integers(-2, 3, N), 0, M - 1)
        .astype(np.int32))
    dt = time_one(chained_gather, table32, idx_nearid)
    results["nearid_bf16_C32"] = report("near-identity bf16 C=32", dt, N, 64)

    # ---- pencil emulation: 3 x [N,C] vs 1 x [N,3C] (equal useful bytes) --
    for c in (32, 64):
        table = jnp.asarray(
            rng.standard_normal((M, c), dtype=np.float32)).astype(jnp.bfloat16)

        def three_gathers(t, i0):
            def step(carry, i):
                shift = (carry.astype(jnp.int32) % 7) + i
                s = jnp.float32(0.0)
                for j in range(3):
                    idx = (i0 + shift + j) % M
                    s = s + jnp.sum(t[idx][:: 4096].astype(jnp.float32))
                return carry + s, None
            out, _ = lax.scan(step, jnp.float32(0.0), jnp.arange(ITERS))
            return out

        dt = time_one(three_gathers, table, idx_random)
        results[f"tap3_bf16_C{c}"] = report(
            f"3 taps separate bf16 C={c}", dt, 3 * N, c * 2)

        # shifted concat: row i holds rows (i, i+1, i+2) — built once per
        # conv from sequential HBM reads, then ONE wide gather
        def pencil(t, i0):
            def step(carry, i):
                t3 = jnp.concatenate(
                    [t, jnp.roll(t, -1, 0), jnp.roll(t, -2, 0)], axis=1)
                shift = (carry.astype(jnp.int32) % 7) + i
                idx = (i0 + shift) % M
                g = t3[idx]                     # [N, 3C]
                s = jnp.sum(g[:: 4096].astype(jnp.float32))
                return carry + s, None
            out, _ = lax.scan(step, jnp.float32(0.0), jnp.arange(ITERS))
            return out

        dt = time_one(pencil, table, idx_random)
        results[f"pencil_bf16_C{c}"] = report(
            f"pencil concat+1 gather bf16 C={c} (3C rows)", dt, N, 3 * c * 2)

    # ---- windowed gather: one descriptor moves an (L, C) slice ------------
    # The z-run/column-layout candidate (VERDICT r3 item 6): IF gather with
    # slice_sizes=(L, C) costs ~one descriptor per window, a layout storing
    # z-runs contiguously could amortize the per-row wall over the run
    # length. The DATA kills the layout regardless (measured 2cm z-run
    # length: mean 1.47, 80% singletons — benchmarks/zrun_stats.py), but the
    # primitive rate is recorded so the closure note is airtight.
    for L in (2, 4, 8):
        nw = N // L
        starts = jnp.asarray(
            rng.integers(0, M - L, nw, dtype=np.int32))

        def windowed(t, s0, _L=L, _nw=nw):
            dn = lax.GatherDimensionNumbers(
                offset_dims=(1, 2), collapsed_slice_dims=(),
                start_index_map=(0,))

            def step(carry, i):
                shift = (carry.astype(jnp.int32) % 7) + i
                s = jnp.clip((s0 + shift) % M, 0, M - _L)
                g = lax.gather(t, s[:, None], dn,
                               slice_sizes=(_L, t.shape[1]),
                               mode="clip")          # [nw, L, C]
                acc = jnp.sum(g.reshape(-1, t.shape[1])[:: 4096]
                              .astype(jnp.float32))
                return carry + acc, None

            out, _ = lax.scan(step, jnp.float32(0.0), jnp.arange(ITERS))
            return out

        dt = time_one(windowed, table32, starts)
        # report per USEFUL row moved (nw windows x L rows = N rows)
        results[f"window{L}_bf16_C32"] = report(
            f"windowed gather L={L} bf16 C=32", dt, N, 64)

    # ---- brick emulation: runs of consecutive rows ------------------------
    for run in (2, 4, 8):
        base = rng.integers(0, M - run, N // run, dtype=np.int32)
        idx_brick = jnp.asarray(
            (base[:, None] + np.arange(run)[None, :]).reshape(-1))
        dt = time_one(chained_gather, table32, idx_brick)
        results[f"brick{run}_bf16_C32"] = report(
            f"brick runs of {run} bf16 C=32", dt, N, 64)

    # ---- summary ---------------------------------------------------------
    print("\n# case                         ms/Mrow   GB/s")
    for k, (ms, gbs) in results.items():
        print(f"# {k:28s} {ms:8.2f} {gbs:7.1f}")


if __name__ == "__main__":
    main()
