"""Entry-cap compaction + kernel-v2 pack A/B on the real TPU at 512³.

1. Converge + steady-state the pallas engine (pack=1, entry_cap auto) —
   the post-compaction wall-clock.
2. Same with pack=4 (converged buffers reused) — the packed-grid candidate.
3. Blocked engine once; assert FULL FeatureTable bit-equality of all three
   (the Mosaic-exactness-trap discipline: hardware can mis-lower what
   interpret mode accepts — see CLAUDE.md).

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
       python scripts/_safe_run.py scripts/tpu_entrycap_pack_ab.py [size]
"""

import dataclasses
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import numpy as np

FIELDS = (
    "count", "s1", "s2", "cmin", "cmax",
    "pair_lo", "pair_hi", "wall_face_counts", "margin",
)


def steady(fn, reps=3):
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    from tissue_analysis_tpu import engine
    from tissue_analysis_tpu.core.stack import LabeledStack

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from _fixtures import load_voronoi

    img = load_voronoi(size)
    stack = LabeledStack.from_array(img, background=1)
    np.asarray(stack.dense[0, 0, 0])
    n = stack.n_labels
    key = ("pallas", stack.shape, n)

    # converge (run 1) + compile converged cfg (run 2), then steady state
    engine.analyze_stack_pallas(stack)
    engine.analyze_stack_pallas(stack)
    t1, tab1 = steady(lambda: engine.analyze_stack_pallas(stack))
    good = engine._GOOD_CFG.get(key)
    print("converged cfg:", good, flush=True)

    # pack=4 full-engine leg is OPT-IN (AB_PACK4=1): its Mosaic compile
    # through the tunnel hung >30 min on three separate attempts (the
    # grid-only pack A/B in tpu_pack_ab.py compiles fine — the hang is
    # specific to the full converged-buffer program at P=4), so the
    # default run measures pack=1 + blocked bit-equality only.
    t4, tab4 = None, tab1
    pack_p = int(os.environ.get("AB_PACK", "4" if os.environ.get("AB_PACK4")
                                else "0"))
    if pack_p > 1:
        cfg4 = dataclasses.replace(good, pack=pack_p)
        engine.analyze_stack_pallas(stack, cfg=cfg4)  # compile
        t4, tab4 = steady(
            lambda: engine.analyze_stack_pallas(stack, cfg=cfg4)
        )

    tb, tabb = steady(lambda: engine.analyze_stack_blocked(stack), reps=1)

    ok14 = all(
        np.array_equal(getattr(tab1, f), getattr(tab4, f)) for f in FIELDS
    )
    ok1b = all(
        np.array_equal(getattr(tab1, f), getattr(tabb, f)) for f in FIELDS
    )
    print(json.dumps({
        "size": size, "labels": n,
        "entry_cap": good.entry_cap if good else None,
        "pallas_pack1_s": round(t1, 4),
        "pack": pack_p or 1,
        "pallas_pack4_s": round(t4, 4) if t4 is not None else None,
        "blocked_s": round(tb, 4),
        "pack4_bit_equal": bool(ok14),
        "blocked_bit_equal": bool(ok1b),
    }), flush=True)
    assert ok14 and ok1b, "BIT-EQUALITY FAILED"


if __name__ == "__main__":
    main()
