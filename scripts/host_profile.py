"""Attribute the host-side milliseconds of the 512^3 pass (no device).

The bench pass is ~197 ms of which ~45 ms is host assemble + graph export
(CLAUDE.md round-3 notes). The device-side stages are measured by
scripts/tpu_stage_times.py; this script times the HOST stages alone on
synthetic-but-shape-exact inputs (pure numpy — runs anywhere):

  - blocked.assemble_pairs           (k1/k2/total run buffers -> pair COO)
  - pallas_block.assemble_moments_pallas  ([n, 68] split cols -> int64)
  - FeatureTable construction + _margin_from_bbox
  - graph_from_table (full property-graph export), plus a per-property split

Usage: python scripts/host_profile.py [n_labels] [n_pairs]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from tissue_analysis_tpu.engine import _margin_from_bbox
from tissue_analysis_tpu.features.table import FeatureTable
from tissue_analysis_tpu.graph.from_image import graph_from_table
from tissue_analysis_tpu.ops import blocked, pallas_block


def t(label, fn, reps=5):
    best = float("inf")
    out = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:<46s} {best * 1e3:8.2f} ms")
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3502
    n_pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 23000
    rng = np.random.default_rng(0)
    shape = (512, 512, 512)

    # ---- synthetic sweep outputs, shape-exact vs the 512^3 bench pass ----
    # split cols: values irrelevant for timing, keep them small/valid
    cols68 = rng.integers(0, 1 << 15, size=(n, 68), dtype=np.int32)
    gmin = rng.integers(0, 256, size=(n, 3)).astype(np.int32)
    gmax = gmin + rng.integers(1, 64, size=(n, 3)).astype(np.int32)

    # pair run buffers: n_runs live entries (sorted packed keys), IMAX tail
    max_entries = int(1.2 * 3 * n_pairs) + 64
    lo = np.sort(rng.integers(0, n - 1, size=3 * n_pairs).astype(np.int64))
    hi = rng.integers(0, n, size=3 * n_pairs).astype(np.int64)
    hi = np.minimum(np.maximum(lo + 1, hi), n - 1)
    ax = rng.integers(0, 3, size=3 * n_pairs).astype(np.int64)
    k1 = np.full(max_entries, 2**31 - 1, np.int32)
    k2 = np.full(max_entries, 2**31 - 1, np.int32)
    tot = np.zeros(max_entries, np.int32)
    # the device reduce emits UNIQUE sorted (lo, hi, axis) rows — dedupe the
    # random triples so assemble_pairs takes its real (sorted-unique) branch
    trip = np.unique(lo * (4 * n) + hi * 4 + ax)
    n_live = trip.shape[0]
    k1[:n_live] = trip // (4 * n)
    k2[:n_live] = trip % (4 * n)
    tot[:n_live] = rng.integers(1, 500, size=n_live)

    moments = t(
        "assemble_moments_pallas",
        lambda: pallas_block.assemble_moments_pallas(cols68, gmin, gmax),
    )
    pair_lo, pair_hi, counts3 = t(
        "assemble_pairs", lambda: blocked.assemble_pairs(k1, k2, tot)
    )
    margin = t(
        "_margin_from_bbox",
        lambda: _margin_from_bbox(
            moments["count"], moments["cmin"], moments["cmax"], shape
        ),
    )

    ids = np.arange(n, dtype=np.int64)

    def build_table():
        return FeatureTable(
            ids=ids.copy(),
            shape=shape,
            voxelsize=(1.0, 1.0, 1.0),
            background_segment=0,
            count=moments["count"],
            s1=moments["s1"],
            s2=moments["s2"],
            cmin=moments["cmin"],
            cmax=moments["cmax"],
            pair_lo=pair_lo,
            pair_hi=pair_hi,
            wall_face_counts=counts3,
            margin=margin,
        )

    table = t("FeatureTable construction", build_table)
    print(f"{'':<46s}  n_pairs={table.n_pairs}")

    t("graph_from_table (cold cache each rep)",
      lambda: graph_from_table(build_table()))
    t("graph_from_table (warm table caches)",
      lambda: graph_from_table(table))

    # per-property split on a fresh table (cold) then warm
    from tissue_analysis_tpu.graph import from_image as fi

    for prop in fi.DEFAULT_PROPERTIES:
        tb = build_table()
        graph_from_table(tb, default_properties=())  # warm topology inputs
        t(f"  property: {prop}",
          lambda p=prop, tb=tb: graph_from_table(tb, default_properties=(p,)))
    t("  topology only (no properties)",
      lambda: graph_from_table(table, default_properties=()))


if __name__ == "__main__":
    main()
