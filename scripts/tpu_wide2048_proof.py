"""Execution proof for 2048-wide streamed cross-sections (round 5):
stream a (192, 2048, 2048) = 0.8 Gvox stack (TiledSource 1x4x4 of a
z-slice of the 512^3 base — resident-sized AND inside the resident
pallas engine's B <= 2^16 blocks bound, so the WHOLE FeatureTable can be
bit-compared against the resident engine, not just the interior offset
law) and assert full-table equality on silicon.

(A first attempt at (512, 2048, 2048) = 2.1 Gvox streamed fine but has
no resident comparator on one chip: pallas exceeds the 2^16-block wide-
contract bound there and the blocked engine's int32 cast of a 2.1-Gvox
stack overflows HBM — the streamed path exists precisely for that
regime, where the >HBM proof's offset-law checks apply instead.)

Complements tpu_streamed_proof.py (>HBM, interior-law checks) and
tpu_slabcompile_probe.py (compile-only at 2048 width).

Usage: python -u scripts/tpu_wide2048_proof.py [base_cells [base_z]]
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("TA_STAGE_VERBOSE", "1")

import numpy as np


def main():
    import jax

    from tissue_analysis_tpu.core.stack import LabeledStack
    from tissue_analysis_tpu.core.synthetic import voronoi_stack
    from tissue_analysis_tpu.engine import analyze_stack
    from tissue_analysis_tpu.streaming import TiledSource, analyze_streamed

    base_cells = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    cache = f"/tmp/ta_bench_cache/voronoi_512_{base_cells}_1.npz"
    if os.path.exists(cache):
        with np.load(cache) as z:
            base = z["img"]
    else:
        base = np.asarray(voronoi_stack((512, 512, 512), base_cells, seed=1))
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        np.savez_compressed(cache, img=base)

    base_z = int(sys.argv[2]) if len(sys.argv) > 2 else 192
    src = TiledSource(np.ascontiguousarray(base[:base_z]), (1, 4, 4),
                      background=1)
    print(f"streaming {src.shape} ({np.prod(src.shape)/1e9:.2f} Gvox, "
          f"dtype {src.dtype})", flush=True)

    t0 = time.perf_counter()
    t_stream = analyze_streamed(src, background=1, slab_z=128)
    stream_s = time.perf_counter() - t0

    full = src.read(0, src.shape[0])
    stack = LabeledStack.from_array(full, background=1)
    del full
    t0 = time.perf_counter()
    t_res = analyze_stack(stack)
    resident_s = time.perf_counter() - t0

    for f in ("ids", "count", "s1", "s2", "cmin", "cmax",
              "pair_lo", "pair_hi", "wall_face_counts", "margin"):
        np.testing.assert_array_equal(
            getattr(t_stream, f), getattr(t_res, f), err_msg=f
        )
    print(
        json.dumps(
            {
                "case": f"2048-wide streamed vs resident {src.shape}, "
                f"{t_stream.n_labels} labels / {t_stream.n_pairs} walls",
                "backend": jax.default_backend(),
                "stream_s": round(stream_s, 1),
                "resident_s": round(resident_s, 1),
                "full_table_bit_equal": True,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
