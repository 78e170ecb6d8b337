"""Kernel-v2 block-packing A/B on the real TPU.

Times the pallas grid (prep + kernel, no pair compaction) at
PallasConfig.pack ∈ {1, 2, 4, 8}, then runs a full-engine 512³ pass at the
best P and asserts bit-equality against the blocked engine ON DEVICE (the
Mosaic-exactness-trap discipline: interpret mode and small-n tests can pass
while hardware mis-lowers — see CLAUDE.md).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_pack_ab.py [size]
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import numpy as np


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    import jax
    import jax.numpy as jnp

    from tissue_analysis_tpu.core.stack import LabeledStack
    from tissue_analysis_tpu.ops import pallas_block
    from tissue_analysis_tpu.ops.blocked import _pad_to_blocks

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from _fixtures import load_voronoi

    img = load_voronoi(size)
    stack = LabeledStack.from_array(img, background=1)
    np.asarray(stack.dense[0, 0, 0])
    n = stack.n_labels
    cfg = pallas_block.PallasConfig()
    L = cfg.max_labels_per_block

    def fence(x):
        return np.asarray(jax.device_get(x))

    def timeit(f, reps=3):
        f()
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            f()
            best = min(best, time.perf_counter() - t0)
        return best

    for pack in (1, 2, 4, 8):

        def grid_only(dense, pack=pack):
            if dense.dtype != jnp.uint16 and n <= 65535:
                dense = dense.astype(jnp.uint16)
            padded = _pad_to_blocks(dense, n, cfg.block)
            offs = jnp.asarray(
                pallas_block._block_offsets_np(padded.shape, cfg.block)
            )
            out = pallas_block._pallas_main_pass(
                padded, cfg.block, L, n, False, offs=offs, pack=pack
            )
            return out[0][0, 0] + out[4][0, 0, 0].astype(jnp.int32)

        gj = jax.jit(grid_only)
        t = timeit(lambda: fence(gj(stack.dense)))
        print(json.dumps({"pack": pack, "grid_s": round(t, 4)}), flush=True)

    # full-engine bit-equality at pack=4 vs blocked, on silicon
    from tissue_analysis_tpu.engine import (
        analyze_stack_blocked,
        analyze_stack_pallas,
    )

    FIELDS = (
        "count", "s1", "s2", "cmin", "cmax",
        "pair_lo", "pair_hi", "wall_face_counts", "margin",
    )
    a = analyze_stack_pallas(stack, cfg=pallas_block.PallasConfig(pack=4))
    b = analyze_stack_blocked(stack)
    for f in FIELDS:
        np.testing.assert_array_equal(
            np.asarray(getattr(a, f)), np.asarray(getattr(b, f)), err_msg=f
        )
    print(json.dumps({"pack4_bit_equal_vs_blocked": True,
                      "labels": int(n)}), flush=True)


if __name__ == "__main__":
    main()
