"""Attribute the slab-minus-grid gap: packed-output slicing vs top_k math.

The compaction micro-bench showed top_k + one-hot select cost ~1.4 ms net
on realistic shapes, yet slab_pass - grid_only ≈ 28 ms. This times, on
the real 512^3 input:
  a) grid only (kernel + 2 tiny slices)           [baseline]
  b) grid + every downstream slice consumed by a cheap sum (no top_k)
  c) grid + real pair compaction (3x top_k + select)
  d) full slab_pass (c + moment/bbox reconstruction etc.)
If b ~= c, the slices themselves (strided reads of the packed [B, L,
outw] buffer), not the compaction math, are the stage's cost.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/tpu_slice_attrib.py
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tissue_analysis_tpu.core.stack import LabeledStack
    from tissue_analysis_tpu.engine import _GOOD_CFG, analyze_stack_pallas
    from tissue_analysis_tpu.ops import blocked, pallas_block
    from tissue_analysis_tpu.ops.blocked import _pad_to_blocks

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from _fixtures import load_voronoi

    img = load_voronoi(512)
    stack = LabeledStack.from_array(img, background=1)
    np.asarray(stack.dense[0, 0, 0])
    n = stack.n_labels

    analyze_stack_pallas(stack)
    analyze_stack_pallas(stack)
    cfg = _GOOD_CFG.get(("pallas", stack.shape, n)) or pallas_block.PallasConfig()
    L = cfg.max_labels_per_block
    kp = cfg.max_pairs_per_block
    kps = kp if isinstance(kp, tuple) else (kp, kp, kp)

    def fence(x):
        return np.asarray(jax.device_get(x))

    def timeit(f, reps=3):
        f()
        f()
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            f()
            best = min(best, time.perf_counter() - t0)
        return best

    def prepped(dense):
        if dense.dtype != jnp.uint16 and n <= 65535:
            dense = dense.astype(jnp.uint16)
        return _pad_to_blocks(dense, n, cfg.block)

    def offs_for(dense):
        shape = (dense.shape[0], dense.shape[1], dense.shape[2])
        return jnp.asarray(pallas_block._block_offsets_np(shape, cfg.block))

    def grid_only(dense):
        p = prepped(dense)
        out = pallas_block._pallas_main_pass(
            p, cfg.block, L, n, False, offs=offs_for(p)
        )
        return out[0][0, 0] + out[4][0, 0, 0].astype(jnp.int32)

    def grid_slices(dense):
        p = prepped(dense)
        ids, cols68, gmin, gmax, pz, py, px, dovf = pallas_block._pallas_main_pass(
            p, cfg.block, L, n, False, offs=offs_for(p)
        )
        acc = ids.sum() + cols68.sum() + gmin.sum() + gmax.sum() + dovf.sum()
        return acc + pz.sum() + py.sum() + px.sum()

    def grid_compact(dense):
        p = prepped(dense)
        ids, cols68, gmin, gmax, pz, py, px, dovf = pallas_block._pallas_main_pass(
            p, cfg.block, L, n, False, offs=offs_for(p)
        )
        acc = ids[0, 0] + cols68[0, 0, 0]
        for ax, mats in enumerate((pz, py, px)):
            lo, hi, ct, ov, nz = blocked._compact_pair_mats(mats, ids, ids, n, kps[ax])
            acc = acc + lo[0] + hi[0] + ct[0]
        return acc

    gz = stack.dense.shape[0] // cfg.block[0]
    gy = stack.dense.shape[1] // cfg.block[1]
    gx = stack.dense.shape[2] // cfg.block[2]
    ozz, oyy, oxx = np.meshgrid(
        np.arange(gz) * cfg.block[0],
        np.arange(gy) * cfg.block[1],
        np.arange(gx) * cfg.block[2],
        indexing="ij",
    )
    offs_np = np.stack(
        [ozz.reshape(-1), oyy.reshape(-1), oxx.reshape(-1)], axis=1
    ).astype(np.int32)

    def grid_recon(dense):
        # v2 reconstructs in-kernel now: identical to grid_slices
        p = prepped(dense)
        ids, cols68, gmin, gmax, pz, py, px, dovf = pallas_block._pallas_main_pass(
            p, cfg.block, L, n, False, offs=offs_for(p)
        )
        return cols68[0, 0, 0] + gmin[0, 0, 0] + gmax[0, 0, 0] + ids[0, 0]

    shape = tuple(stack.dense.shape)
    slab = pallas_block.build_pallas_slab_fn(shape, n, cfg, False)
    slab_j = jax.jit(lambda d: slab(d, 0))

    res = {}
    for name, f in (
        ("grid_s", jax.jit(grid_only)),
        ("grid_slices_s", jax.jit(grid_slices)),
        ("grid_compact_s", jax.jit(grid_compact)),
        ("grid_recon_s", jax.jit(grid_recon)),
    ):
        res[name] = round(timeit(lambda: fence(f(stack.dense))), 4)
    res["slab_s"] = round(timeit(lambda: fence(slab_j(stack.dense)[0][0, 0])), 4)
    trivj = jax.jit(lambda d: d[0, 0, 0] + 1)
    res["roundtrip_s"] = round(timeit(lambda: fence(trivj(stack.dense))), 4)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
