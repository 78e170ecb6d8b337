"""Shared bench-fixture loader: load-or-generate the cached Voronoi stacks.

/tmp is wiped on every host reboot; scripts that hard-required the cache
crashed the whole recovery sequence (round 3). Generation costs ~80 s at
512³ on this 1-core host — always worth it over a dead run.
"""

import os

import numpy as np

CACHE_DIR = os.environ.get("BENCH_CACHE", "/tmp/ta_bench_cache")


def load_voronoi(size: int, cells: int = 3500, seed: int = 1) -> np.ndarray:
    os.makedirs(CACHE_DIR, exist_ok=True)
    path = os.path.join(CACHE_DIR, f"voronoi_{size}_{cells}_{seed}.npz")
    if os.path.exists(path):
        with np.load(path) as z:
            return z["img"]
    from tissue_analysis_tpu.core.synthetic import voronoi_stack

    img = np.asarray(voronoi_stack((size,) * 3, cells, seed=seed))
    np.savez_compressed(path, img=img)
    return img
