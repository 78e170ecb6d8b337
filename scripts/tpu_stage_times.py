"""Measure the 512^3 pallas pass stage-by-stage on the real TPU.

Isolates (each as its own jit, timed by host readback of a tiny reduction
so transfer cost stays off the clock):
  1. kernel-only: the pallas grid (packed per-block outputs)
  2. prep: pad + blockify + extras build (XLA, pre-kernel)
  3. moments: global segment combine + reconstruction
  4. pairs: compaction (top_k + id lookup) + global sort-reduce
  5. full fused sweep (the real path) for reference
plus the host stages (readback, assemble, graph export) from the
engine's timing log.

Usage: PYTHONPATH=/root/repo python -u scripts/tpu_stage_times.py [SIZE]
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import numpy as np


def fence(x):
    return np.asarray(jax.device_get(x))


def timeit(fn, *args, reps=3):
    fn(*args)  # warm
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(*args)
        best = min(best, time.perf_counter() - t0)
    return best


if __name__ == "__main__":
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    import jax
    import jax.numpy as jnp

    from tissue_analysis_tpu.core.stack import LabeledStack
    from tissue_analysis_tpu.engine import (
        _GOOD_CFG,
        analyze_stack_pallas,
        collect_stack_pallas,
        dispatch_stack_pallas,
    )
    from tissue_analysis_tpu.ops import blocked, pallas_block

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from _fixtures import load_tiled, load_voronoi

    # sizes above 512 use the tiled fixture (matches tpu_1024_bench /
    # BASELINE.md's scale-up construction; a fresh EDT at 1024^3 costs
    # ~10 min of 1-core host time)
    img = load_tiled(size) if size > 512 else load_voronoi(size)

    stack = LabeledStack.from_array(img, background=1)
    fence(stack.dense[0, 0, 0])
    n = stack.n_labels

    # converge + compile the good cfg (two warmups)
    t = analyze_stack_pallas(stack)
    t = analyze_stack_pallas(stack)
    cfg = _GOOD_CFG.get(("pallas", stack.shape, n)) or pallas_block.PallasConfig()
    print("cfg:", cfg, flush=True)

    shape = tuple(stack.dense.shape)
    slab = pallas_block.build_pallas_slab_fn(shape, n, cfg, False)

    # full slab pass (kernel + compaction, no global sort)
    slab_j = jax.jit(lambda d: slab(d, 0))
    out = slab_j(stack.dense)
    t_slab = timeit(lambda d: fence(slab_j(d)[0][0, 0]), stack.dense)

    # full sweep (everything on device; returns ONE flat buffer + layout)
    full, _layout = pallas_block.pallas_sweep(stack.dense, n, cfg)
    t_full = timeit(
        lambda d: fence(pallas_block.pallas_sweep(d, n, cfg)[0][0]),
        stack.dense,
    )

    # whole engine incl. host assemble (readback path)
    t_engine = timeit(lambda s: analyze_stack_pallas(s), stack)

    # property-graph export (pure host work on the final table — VERDICT
    # r4 next #6: the 1024^3 host-side number previously excluded it)
    from tissue_analysis_tpu.graph.from_image import graph_from_table

    t_graph = timeit(lambda: graph_from_table(t))

    # readback payload estimate: the engine's ONE flat device_get buffer
    payload_mb = float(np.asarray(full).nbytes) / 1e6

    # relay round-trip floor: fence of a trivial jit — subtract from every
    # standalone number (each timed call ends in one scalar readback)
    trivj = jax.jit(lambda d: d[0, 0, 0] + 1)
    t_rt = timeit(lambda d: fence(trivj(d)), stack.dense)

    # pair sort-reduce alone, on the slab outputs (device-resident inputs)
    ids, cols, gmin_l, gmax_l, los, his, counts, tags = (
        out[0], out[1], out[2], out[3], out[4], out[5], out[6], out[7]
    )
    max_entries = 3 * cfg.derived_max_pairs(n)
    # match the real in-sweep path: packed readback + converged entry_cap
    # (the uncapped variant runs its scans over the FULL padded stream and
    # overstates the stage ~4x at 512^3)
    sortj = jax.jit(
        lambda a, b, c, d: blocked._sorted_pair_reduce(
            a, b, c, d, max_entries, n_labels=n, unpack=False,
            entry_cap=cfg.entry_cap, return_live=True,
        )
    )
    t_sort = timeit(lambda: fence(sortj(los, his, tags, counts)[2][0]))

    # moment combine alone
    momj = jax.jit(
        lambda i, c, mn, mx: blocked._global_moment_combine(i, c, mn, mx, n)
    )
    t_mom = timeit(lambda: fence(momj(ids, cols, gmin_l, gmax_l)[0][0, 0]))

    # sub-slab attribution: grid-only (pallas_call + input prep, no pair
    # compaction), and prep-only (pad + extras build, no kernel)
    from tissue_analysis_tpu.ops.pallas_block import (
        _extras_v2,
        _pad_to_blocks,
        _pallas_main_pass,
        _v2_eligible,
    )

    L = cfg.max_labels_per_block

    def prep_only(dense):
        if dense.dtype != jnp.uint16 and n <= 65535:
            dense = dense.astype(jnp.uint16)
        padded = _pad_to_blocks(dense, n, cfg.block)
        ex = _extras_v2(padded, n, cfg.block)
        return padded[0, 0, 0].astype(jnp.int32) + ex[0, 0, 0].astype(jnp.int32)

    prepj = jax.jit(prep_only)
    t_prep = timeit(lambda d: fence(prepj(d)), stack.dense)

    def grid_only(dense):
        if dense.dtype != jnp.uint16 and n <= 65535:
            dense = dense.astype(jnp.uint16)
        padded = _pad_to_blocks(dense, n, cfg.block)
        offs = jnp.asarray(
            pallas_block._block_offsets_np(padded.shape, cfg.block)
        )
        ids, cols68, gmin, gmax, pz, py, px, dovf = _pallas_main_pass(
            padded, cfg.block, L, n, False, offs=offs
        )
        return ids[0, 0] + pz[0, 0, 0].astype(jnp.int32)

    gridj = jax.jit(grid_only)
    t_grid = timeit(lambda d: fence(gridj(d)), stack.dense)
    print("v2_eligible:", _v2_eligible(cfg.block, n), flush=True)

    # first sort of the raw entry stream (the dominant half of the pair
    # reduce) vs the full two-sort reduce, to split sort1/sort2
    def sort1_only(a, b, c, d):
        valid = a < blocked._IMAX
        n4 = 4 * n
        packed = jnp.where(valid, a * n4 + b * 4 + c, blocked._IMAX)
        k, ct = jax.lax.sort((packed, d), num_keys=1)
        return k[0] + ct[0]

    s1j = jax.jit(sort1_only)
    t_sort1 = timeit(lambda: fence(s1j(los, his, tags, counts)))

    print(
        json.dumps(
            {
                "size": size,
                "labels": n,
                "entries_sorted": int(los.shape[0]),
                "slab_pass_s": round(t_slab, 4),
                "full_sweep_s": round(t_full, 4),
                "engine_s": round(t_engine, 4),
                "pair_sort_s": round(t_sort, 4),
                "pair_sort1_s": round(t_sort1, 4),
                "moment_combine_s": round(t_mom, 4),
                "prep_s": round(t_prep, 4),
                "grid_s": round(t_grid, 4),
                "roundtrip_s": round(t_rt, 4),
                "host_side_s": round(t_engine - t_full, 4),
                "graph_export_s": round(t_graph, 4),
                "readback_payload_mb": round(payload_mb, 2),
            }
        ),
        flush=True,
    )
