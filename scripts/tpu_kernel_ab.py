"""Kernel-grid A/B attribution on the real TPU.

Times the pallas grid (prep + kernel, no pair compaction) while capping the
dictionary-extraction chain via `pallas_block._DICT_STEPS` (timing-only
knob — results are garbage below L/4 steps, timings are valid). The delta
per step isolates the serial dictionary chain's share of the ~50 ms kernel.
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

    full = (L // pallas_block._DICT_GROUPS) // 2
    # NB: steps=0 crashes the Mosaic server-side compile (degenerate
    # kernel); extrapolate the zero-chain intercept from the fit instead
    for steps in (None, *range(full - 1, 0, -1)):
        pallas_block._DICT_STEPS = steps

        def grid_only(dense):
            if dense.dtype != jnp.uint16 and n <= 65535:
                dense = dense.astype(jnp.uint16)
            padded = _pad_to_blocks(dense, n, cfg.block)
            offs = jnp.asarray(
                pallas_block._block_offsets_np(padded.shape, cfg.block)
            )
            out = pallas_block._pallas_main_pass(
                padded, cfg.block, L, n, False, offs=offs
            )
            return out[0][0, 0] + out[4][0, 0, 0].astype(jnp.int32)

        gj = jax.jit(grid_only)
        t = timeit(lambda: fence(gj(stack.dense)))
        print(
            json.dumps({"dict_steps": steps if steps is not None else full,
                        "grid_s": round(t, 4)}),
            flush=True,
        )
    pallas_block._DICT_STEPS = None


if __name__ == "__main__":
    main()
