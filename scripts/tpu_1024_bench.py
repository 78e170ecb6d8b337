"""1024^3 scale-up bench: 2x2x2 relabeled tiling of the 512^3 Voronoi
fixture (16,241 labels incl. background) through the pallas engine on the
real chip, timed incl. graph export. Prints one JSON line.

Matches the BASELINE.md scale-up construction: octant k holds the 512^3
cells offset by k*(n_cells); background (1) is shared, so per-octant cell
volumes bit-match their 512^3 values.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from _fixtures import load_tiled  # noqa: E402


def main():
    import jax

    from tissue_analysis_tpu.core.stack import LabeledStack
    from tissue_analysis_tpu.engine import analyze_stack_pallas
    from tissue_analysis_tpu.graph.from_image import graph_from_table

    big = load_tiled(1024)
    stack = LabeledStack.from_array(big, background=1)
    np.asarray(stack.dense[0, 0, 0])  # fence the H2D transfer

    analyze_stack_pallas(stack)  # warmup 1: converge buffer config
    analyze_stack_pallas(stack)  # warmup 2: compile the converged config
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        t = analyze_stack_pallas(stack)
        graph_from_table(t)
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(
        json.dumps(
            {
                "case": f"1024^3 pallas, {t.n_labels} labels / {t.n_pairs} walls",
                "backend": jax.default_backend(),
                "wall_s": round(best, 3),
                "mvox_s": round(big.size / best / 1e6, 1),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
