"""Bisect the Gvox-slab compile stall: time the COMPILE of (1) grid-only
(_pallas_main_pass) and (2) the full streaming slab program, at the shape
that hung the streamed proofs — on a synthetic slab so no base fixture is
needed. Each piece is compiled via .lower().compile() with timestamps;
run under the queue's ITEM_TIMEOUT so a never-returning compile is
bounded and the log shows exactly which piece stalled.

Usage: python scripts/tpu_slabcompile_probe.py [Z Y X [n]]
Default 128 1536 1536 62101.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import numpy as np


def stamp(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from tissue_analysis_tpu.ops import pallas_block
    from tissue_analysis_tpu.ops.blocked import _pad_to_blocks

    args = [int(a) for a in sys.argv[1:]]
    Z, Y, X = (args + [128, 1536, 1536])[:3]
    n = args[3] if len(args) > 3 else 62101
    cfg = pallas_block.PallasConfig()
    L = cfg.max_labels_per_block
    shape = (Z, Y, X)
    spec = jax.ShapeDtypeStruct(shape, jnp.uint16)

    def touch(tree):
        # defeat DCE: every leaf contributes to the fetched scalar —
        # fetching one element would let XLA prune the whole program
        # (the round-4 first probe's mistake)
        leaves = jax.tree_util.tree_leaves(tree)
        return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)

    def grid_only(dense):
        padded = _pad_to_blocks(dense, n, cfg.block)
        offs = jnp.asarray(
            pallas_block._block_offsets_np(padded.shape, cfg.block)
        )
        out = pallas_block._pallas_main_pass(
            padded, cfg.block, L, n, False, offs=offs
        )
        return touch(out)

    stamp(f"lowering grid-only {shape} n={n}")
    t0 = time.perf_counter()
    lowered = jax.jit(grid_only).lower(spec)
    stamp(f"lowered ({time.perf_counter()-t0:.1f}s); compiling grid-only")
    t0 = time.perf_counter()
    lowered.compile()
    stamp(f"grid-only COMPILED in {time.perf_counter()-t0:.1f}s")

    # padded GLOBAL shape (the streamed pipeline compiles slabs with the
    # global wide flag); slab itself is the full cross-section
    wide = pallas_block._check_static_pallas(shape, n, cfg)
    stamp(f"wide={wide}; building full slab fn")
    slab = pallas_block.build_pallas_slab_fn(shape, n, cfg, False, wide=wide)
    stamp("lowering full slab fn")
    t0 = time.perf_counter()
    # z_off traced (the streamed pipeline reuses ONE slab compile across
    # slabs with different offsets)
    lowered2 = jax.jit(lambda d, z: touch(slab(d, z))).lower(
        spec, jax.ShapeDtypeStruct((), jnp.int32)
    )
    stamp(f"lowered ({time.perf_counter()-t0:.1f}s); compiling full slab")
    t0 = time.perf_counter()
    lowered2.compile()
    stamp(f"full slab COMPILED in {time.perf_counter()-t0:.1f}s")

    if os.environ.get("PROBE_STAGES"):
        # isolate which added stage blows the streamed-program compile:
        # slab+seam, slab+combine, slab+sort — each with DCE defeated
        from tissue_analysis_tpu.ops import blocked as _blocked

        slab2 = pallas_block.build_pallas_slab_fn(
            shape, n, cfg, False, wide=wide
        )
        prev = jax.ShapeDtypeStruct((shape[1], shape[2]), jnp.int32)
        max_entries = 3 * cfg.derived_max_pairs(n)

        def with_seam(d, p):
            out = slab2(d, 0)
            first = d[0].astype(jnp.int32)
            tiles = _blocked.plane_seam_tiles(p, first, cfg.seam_tile, n)
            seam = _blocked.seam_tiles_entries(
                tiles, n, cfg.seam_max_labels,
                cfg.max_pairs_per_seam_tile, tiles.shape[0],
            )
            return touch(out) + touch(seam)

        def with_combine(d):
            out = slab2(d, 0)
            comb = _blocked._global_moment_combine(
                out[0], out[1], out[2], out[3], n
            )
            return touch(out) + touch(comb)

        def with_sort(d):
            out = slab2(d, 0)
            ids, cols, gmin_l, gmax_l, los, his, counts, tags = out[:8]
            red = _blocked._sorted_pair_reduce(
                los, his, tags, counts, max_entries, n_labels=n,
                unpack=False,
            )
            return touch(out) + touch(red)

        # sort ALONE on a synthetic stream of the same size: distinguishes
        # "the two-key reduce composition is slow to compile at 7M" from
        # "fusing it with the slab program is"
        kp = cfg.max_pairs_per_block
        kps = sum(kp) if isinstance(kp, tuple) else 3 * kp
        grid = [-(-s // b) for s, b in zip(shape, cfg.block)]
        stream = grid[0] * grid[1] * grid[2] * kps
        sspec = jax.ShapeDtypeStruct((stream,), jnp.int32)

        def sort_alone(a, b, c, d):
            return touch(
                _blocked._sorted_pair_reduce(
                    a, b, c, d, max_entries, n_labels=n, unpack=False
                )
            )

        for name, fn, specs in (
            ("sort-alone", sort_alone, (sspec, sspec, sspec, sspec)),
            ("slab+seam", with_seam, (spec, prev)),
            ("slab+combine", with_combine, (spec,)),
            ("slab+sort", with_sort, (spec,)),
        ):
            stamp(f"lowering {name}")
            t0 = time.perf_counter()
            lw = jax.jit(fn).lower(*specs)
            stamp(f"lowered ({time.perf_counter()-t0:.1f}s); compiling {name}")
            t0 = time.perf_counter()
            lw.compile()
            stamp(f"{name} COMPILED in {time.perf_counter()-t0:.1f}s")

    # the REAL streamed per-slab program (slab + seam + combine + sort)
    from tissue_analysis_tpu import streaming

    stamp("building streamed per-slab program")
    max_entries = 3 * cfg.derived_max_pairs(n)
    prog = streaming._build_program_pallas(shape, n, cfg, max_entries, False)
    prev = jax.ShapeDtypeStruct((shape[1], shape[2]), jnp.int32)
    t0 = time.perf_counter()
    lowered3 = jax.jit(lambda d, p: touch(prog(d, p))).lower(spec, prev)
    stamp(f"lowered ({time.perf_counter()-t0:.1f}s); compiling streamed program")
    t0 = time.perf_counter()
    lowered3.compile()
    stamp(f"streamed program COMPILED in {time.perf_counter()-t0:.1f}s")


if __name__ == "__main__":
    main()
