"""On-silicon cross-engine bit-equality at 512^3 (Mosaic exactness
discipline, CLAUDE.md): pallas vs blocked FeatureTables must match EXACTLY
— bugs in the bf16/lowering class pass interpret mode and only fail on
hardware at n > 256 labels. Prints one JSON line."""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import numpy as np


def main():
    import jax

    from tissue_analysis_tpu.core.stack import LabeledStack
    from tissue_analysis_tpu.engine import (
        analyze_stack_blocked,
        analyze_stack_pallas,
    )

    n = int(os.environ.get("VERIFY_SIZE", "512"))
    cells = int(os.environ.get("VERIFY_CELLS", "3500"))
    cache = f"/tmp/ta_bench_cache/voronoi_{n}_{cells}_1.npz"
    if os.path.exists(cache):
        with np.load(cache) as z:
            img = z["img"]
    else:
        from tissue_analysis_tpu.core.synthetic import voronoi_stack

        img = np.asarray(voronoi_stack((n, n, n), cells, seed=1))
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        np.savez_compressed(cache, img=img)

    stack = LabeledStack.from_array(img, background=1)
    np.asarray(stack.dense[0, 0])
    # stage prints: a wedged worker hangs device calls with zero output —
    # these timestamps say WHICH stage a dead run died in
    print(f"[{time.strftime('%H:%M:%S')}] transfer fenced; pallas...",
          flush=True)

    t0 = time.perf_counter()
    tp = analyze_stack_pallas(stack)
    tpal = time.perf_counter() - t0
    print(f"[{time.strftime('%H:%M:%S')}] pallas done {tpal:.3f}s; blocked...",
          flush=True)
    t0 = time.perf_counter()
    tb = analyze_stack_blocked(stack)
    tblk = time.perf_counter() - t0
    print(f"[{time.strftime('%H:%M:%S')}] blocked done {tblk:.3f}s",
          flush=True)

    fields = (
        "count", "s1", "s2", "cmin", "cmax", "pair_lo", "pair_hi",
        "wall_face_counts", "margin",
    )
    for f in fields:
        a, b = getattr(tp, f), getattr(tb, f)
        if not np.array_equal(np.asarray(a), np.asarray(b)):
            print(json.dumps({"case": f"{n}^3 cross-engine", "ok": False,
                              "field": f}), flush=True)
            return
    print(
        json.dumps(
            {
                "case": f"{n}^3 cross-engine bit-equality",
                "ok": True,
                "backend": jax.default_backend(),
                "labels": int(tp.n_labels),
                "pairs": int(tp.n_pairs),
                "pallas_s_incl_convergence": round(tpal, 3),
                "blocked_s_incl_convergence": round(tblk, 3),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
