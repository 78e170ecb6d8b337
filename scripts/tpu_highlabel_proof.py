"""Hardware proof for the >23,170-label pair paths (VERDICT r2 item 1).

The two-key (lo, hi*4+axis) sort path and the n >= 2^16 kernel-v1 fallback
had only interpret-mode evidence — exactly the Mosaic bug class (bf16
lowering, lane mis-lowering) that passes interpret mode and fails on
silicon (CLAUDE.md "exactness traps"). This script runs on the real TPU:

  A. grid_stack 512^3 / cell 16^3 -> 32,768 labels: two-key sort + kernel-v2
  B. grid_stack 512^3 / cell  8^3 -> 262,144 labels: kernel-v1 (n >= 2^16)
  C. voronoi 512^3 / ~35k seeds   -> irregular high-label stack

Each case asserts the pallas table BIT-EQUALS the blocked engine's, plus
closed-form checks on the grid cases (volumes, pair counts, wall counts).
Prints one JSON line per case.
"""

import dataclasses
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import numpy as np


def assert_equal(a, b):
    np.testing.assert_array_equal(a.ids, b.ids)
    np.testing.assert_array_equal(a.count, b.count)
    np.testing.assert_array_equal(a.s1, b.s1)
    np.testing.assert_array_equal(a.s2, b.s2)
    np.testing.assert_array_equal(a.cmin, b.cmin)
    np.testing.assert_array_equal(a.cmax, b.cmax)
    np.testing.assert_array_equal(a.pair_lo, b.pair_lo)
    np.testing.assert_array_equal(a.pair_hi, b.pair_hi)
    np.testing.assert_array_equal(a.wall_face_counts, b.wall_face_counts)
    np.testing.assert_array_equal(a.margin, b.margin)


def run_case(name, img, background, pallas_cfg=None, blocked_cfg=None):
    import jax

    from tissue_analysis_tpu.core.stack import LabeledStack
    from tissue_analysis_tpu.engine import (
        analyze_stack_blocked,
        analyze_stack_pallas,
    )

    stack = LabeledStack.from_array(np.asarray(img), background=background)
    np.asarray(stack.dense[0, 0, 0])  # fence transfer
    # timestamped stage print: a wedged worker hangs with zero output —
    # this says which case/stage a dead run died in
    print(f"[{time.strftime('%H:%M:%S')}] {name}: transfer fenced",
          flush=True)

    # TWO warmups (CLAUDE.md measurement discipline): run 1 converges the
    # buffer config, run 2 compiles the converged config; run 3 is honest
    t0 = time.perf_counter()
    tp = analyze_stack_pallas(stack, cfg=pallas_cfg)
    t_pallas_1 = time.perf_counter() - t0
    analyze_stack_pallas(stack, cfg=pallas_cfg)
    t0 = time.perf_counter()
    tp = analyze_stack_pallas(stack, cfg=pallas_cfg)
    t_pallas = time.perf_counter() - t0

    t0 = time.perf_counter()
    tb = analyze_stack_blocked(stack, cfg=blocked_cfg)
    t_blocked_1 = time.perf_counter() - t0
    analyze_stack_blocked(stack, cfg=blocked_cfg)
    t0 = time.perf_counter()
    tb = analyze_stack_blocked(stack, cfg=blocked_cfg)
    t_blocked = time.perf_counter() - t0

    assert_equal(tp, tb)
    print(
        json.dumps(
            {
                "case": name,
                "backend": jax.default_backend(),
                "labels": tp.n_labels,
                "pairs": tp.n_pairs,
                "pallas_s": round(t_pallas, 3),
                "blocked_s": round(t_blocked, 3),
                "first_run_s": [round(t_pallas_1, 1), round(t_blocked_1, 1)],
                "bit_equal": True,
            }
        ),
        flush=True,
    )
    return tp


def main():
    which = set(sys.argv[1:]) or {"A", "B", "C"}
    from tissue_analysis_tpu.core.synthetic import grid_stack, voronoi_stack
    from tissue_analysis_tpu.ops import blocked, pallas_block

    if "A" in which:
        img = grid_stack((512, 512, 512), (16, 16, 16))
        t = run_case("grid 512^3 cell16 (two-key, kernel-v2)", img, None)
        g = 32
        assert t.n_labels == g**3
        assert np.all(t.count == 16**3)
        assert t.n_pairs == 3 * g * g * (g - 1), t.n_pairs
        assert np.all(t.wall_face_counts.sum(1) == 16 * 16)

    if "B" in which:
        img = grid_stack((512, 512, 512), (8, 8, 8))
        # per-block distinct labels hit exactly the default caps; preset
        # bigger dictionaries so the proof run needs no rerun-larger cycle
        pcfg = pallas_block.PallasConfig(
            max_labels_per_block=64,
            seam_max_labels=128,
            max_pairs=300_000,
        )
        bcfg = blocked.BlockConfig(
            max_labels_per_block=128, max_pairs=300_000
        )
        t = run_case(
            "grid 512^3 cell8 (kernel-v1, n>=2^16)", img, None, pcfg, bcfg
        )
        g = 64
        assert t.n_labels == g**3
        assert np.all(t.count == 8**3)
        assert t.n_pairs == 3 * g * g * (g - 1), t.n_pairs

    if "C" in which:
        cache = "/tmp/ta_bench_cache/voronoi_512_35000_7.npz"
        if os.path.exists(cache):
            with np.load(cache) as z:
                img = z["img"]
        else:
            img = np.asarray(voronoi_stack((512, 512, 512), 35000, seed=7))
            os.makedirs(os.path.dirname(cache), exist_ok=True)
            np.savez_compressed(cache, img=img)
        run_case("voronoi 512^3 ~35k cells (two-key)", img, 1)


if __name__ == "__main__":
    main()
