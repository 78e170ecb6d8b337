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


def load_tiled(size: int, base_size: int = 512, cells: int = 3500,
               seed: int = 1) -> np.ndarray:
    """t^3 relabeled tiling of the base Voronoi fixture (t = size/base_size).

    Matches BASELINE.md's scale-up construction (e.g. 1024^3 = 2x2x2 tiles
    of the 512^3 stack): octant k holds the base cells offset by k*ncells,
    background (1) shared — so per-octant cell features bit-match the base
    stack's. ~2 s of numpy copies vs ~10 min of 1-core EDT for a fresh
    Voronoi at 1024^3.
    """
    t, rem = divmod(size, base_size)
    assert rem == 0 and t >= 1
    base = load_voronoi(base_size, cells, seed)
    ncells = int(base.max()) - 1  # labels 2..max, background 1
    assert 1 + t * t * t * ncells < 2 ** 16, "tiled labels must fit uint16"
    big = np.empty((size,) * 3, np.uint16)
    k = 0
    for z in range(0, size, base_size):
        for y in range(0, size, base_size):
            for x in range(0, size, base_size):
                oct_ = base.astype(np.uint16).copy()
                cells_m = oct_ > 1
                oct_[cells_m] += np.uint16(k * ncells)
                big[z:z + base_size, y:y + base_size,
                    x:x + base_size] = oct_
                k += 1
    return big
