"""Benchmark: full per-cell feature table + adjacency graph on a 512³ stack.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "Mvoxels/s/chip", "vs_baseline": N}

Baseline: the reference-semantics scipy pass measured at 0.63 Mvox/s on the
512³/2037-cell stack (SURVEY.md §6 / BASELINE.md — host CPU, 213.1 s total).

Timing is honest by construction: `analyze_stack` ends with host readback of
every result table (`np.asarray`), so the wall-clock includes all device work
and transfers (SURVEY.md §0.1: `block_until_ready` is unreliable on this
platform; host readback is the only trustworthy fence).

Env knobs: BENCH_SIZE (default 512), BENCH_CELLS (default 3500),
BENCH_REPS (default 3), BENCH_CACHE (default /tmp/ta_bench_cache).
"""

from __future__ import annotations

import json
import os
import sys
import time

# persistent compilation cache: first Mosaic/XLA compile through the axon
# tunnel costs minutes; cache it across processes (must precede jax import)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import numpy as np


def _get_stack(n: int, ncells: int, seed: int):
    cache_dir = os.environ.get("BENCH_CACHE", "/tmp/ta_bench_cache")
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, f"voronoi_{n}_{ncells}_{seed}.npz")
    if os.path.exists(path):
        with np.load(path) as z:
            return z["img"]
    from tissue_analysis_tpu.core.synthetic import voronoi_stack

    img = np.asarray(voronoi_stack((n, n, n), ncells, seed=seed))
    np.savez_compressed(path, img=img)
    return img


def _tpu_alive(timeout_s: int = 150) -> bool:
    """Probe TPU liveness in a subprocess with a hard timeout.

    A wedged remote TPU worker makes `jax.devices()` hang FOREVER in-process
    (observed: hours — CLAUDE.md platform gotchas), which would turn this
    bench into a silent driver timeout. The subprocess watchdog turns that
    into a recoverable False.
    """
    import subprocess

    code = "import jax; assert jax.default_backend() != 'cpu', 'cpu'"
    try:
        return (
            subprocess.run(
                [sys.executable, "-c", code],
                timeout=timeout_s,
                stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL,
            ).returncode
            == 0
        )
    except subprocess.TimeoutExpired:
        return False


def main() -> None:
    n = int(os.environ.get("BENCH_SIZE", "512"))
    ncells = int(os.environ.get("BENCH_CELLS", "3500"))
    # 5 reps (VERDICT r4 weak #1): the pass is ~0.12 s while the axon-relay
    # jitter per fenced readback is ±20 ms — best-of-3 did not absorb it
    # and round-over-round headline numbers regressed with zero code cause
    reps = int(os.environ.get("BENCH_REPS", "5"))
    baseline_mvox_s = 0.63  # reference semantics, 512³ (BASELINE.md)

    img = _get_stack(n, ncells, seed=1)

    # TPU-liveness gate: a wedged worker hangs jax.devices() in-process.
    # Retry the subprocess probe for up to BENCH_TPU_WAIT_S (default 30 min),
    # then fall back to the CPU backend with an explicit marker so the
    # recorded number is never silently a hang OR silently a CPU number.
    backend_note = ""
    wait_s = int(os.environ.get("BENCH_TPU_WAIT_S", "1800"))
    deadline = time.time() + wait_s
    alive = _tpu_alive()
    while not alive and time.time() < deadline:
        time.sleep(60)
        alive = _tpu_alive()
    if not alive:
        import jax

        jax.config.update("jax_platforms", "cpu")
        backend_note = (
            " [TPU worker unreachable after probe retries; CPU fallback — "
            "NOT comparable to TPU rounds]"
        )

    from tissue_analysis_tpu.core.stack import LabeledStack
    from tissue_analysis_tpu.engine import analyze_raw, analyze_stack
    from tissue_analysis_tpu.graph.from_image import graph_from_table

    stack = LabeledStack.from_array(img, background=1)
    voxels = float(np.prod(stack.shape))

    # TWO warmups (CLAUDE.md measurement discipline): the first run converges
    # the buffer config (rerun-larger sweeps), the second compiles the
    # converged config — so even BENCH_REPS=1 is not compile-contaminated
    table = analyze_stack(stack)
    table = analyze_stack(stack)

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        table = analyze_stack(stack)
        graph_from_table(table)  # property-graph export is part of the pass
        times.append(time.perf_counter() - t0)

    # measured relay round-trip: a fresh tiny device computation fenced by
    # host readback (fresh each rep — jax.Array caches its host copy). The
    # stage scripts subtract this per fenced call; here it feeds value_net.
    import jax.numpy as jnp

    rts = []
    for i in range(7):
        t0 = time.perf_counter()
        np.asarray(jnp.zeros((8,), jnp.int32) + i)
        rts.append(time.perf_counter() - t0)
    relay_rt = sorted(rts)[len(rts) // 2]

    # honest end-to-end: ingest (native relabel + host->device transfer,
    # forced by a device readback of one dense voxel) + pass + graph export.
    # Per-stage split makes the axon-relay transfer artifact visible instead
    # of poisoning end_to_end_s (VERDICT r2 weak #3): on this tunneled host
    # transfer_s varies 2.6-24 s run to run; a direct-attached host moves
    # the same bytes in ~30 ms.
    e2e = []
    for _ in range(reps):
        t0 = time.perf_counter()
        st = LabeledStack.from_array(img, background=1)  # relabel + enqueue
        t1 = time.perf_counter()
        np.asarray(st.dense[0, 0, 0])  # fence the transfer
        t2 = time.perf_counter()
        tb = analyze_stack(st)
        graph_from_table(tb)
        t3 = time.perf_counter()
        e2e.append((t3 - t0, t1 - t0, t2 - t1, t3 - t2))
    e2e_best, relabel_s, transfer_s, pass_s = min(e2e)
    # headline from the best across BOTH timed loops (identical work:
    # device-resident pass + graph export) — VERDICT r4 weak #1
    best = min(times + [e[3] for e in e2e])

    # raw-mode end-to-end (on-device ingest, VERDICT r2 item 2): H2D of the
    # RAW uint16 labels + device pass; no host relabel stage exists at all.
    # Bit-identical to the relabel path by construction (tests/test_raw_ingest).
    analyze_raw(img, background=1)  # warmup 1: converge buffer config
    analyze_raw(img, background=1)  # warmup 2: compile the converged config
    from tissue_analysis_tpu.utils import timing

    e2e_raw = []
    for _ in range(reps):
        t0 = time.perf_counter()
        with timing.collect() as tc:
            tr = analyze_raw(img, background=1)
            graph_from_table(tr)
        stages = tc.as_dict()
        # the H2D enqueue is async; the id-range scan's device_get fences
        # it — their sum is the real transfer wall-clock (VERDICT r4
        # weak #2: the raw loop recorded no split, so a 2.5x relay
        # variance swing was unexplainable from the committed data)
        xfer = sum(
            v["seconds"]
            for k, v in stages.items()
            if k.startswith("ingest:")
        )
        e2e_raw.append((time.perf_counter() - t0, xfer))
    e2e_raw_best, raw_transfer_s = min(e2e_raw)
    raw_pass_s = e2e_raw_best - raw_transfer_s

    mvox_s = voxels / best / 1e6
    # net-of-relay companion number: the pass ends in ONE fenced readback,
    # so one measured round-trip of pure relay latency rides on wall_s —
    # ~2 ms on a directly-attached host, 20-30 ms (and noisy) through the
    # axon loopback relay. value stays the honest gross number.
    net = max(best - relay_rt, 1e-9)
    e2e_min = min(e2e_best, e2e_raw_best)
    print(
        json.dumps(
            {
                "metric": (
                    f"full feature table + adjacency graph, {n}^3 stack, "
                    f"{table.n_labels} labels / {table.n_pairs} walls"
                    + backend_note
                ),
                "value": round(mvox_s, 2),
                "unit": "Mvoxels/s/chip",
                "vs_baseline": round(mvox_s / baseline_mvox_s, 1),
                "wall_s": round(best, 3),
                "wall_net_of_relay_s": round(net, 3),
                "value_net_of_relay": round(voxels / net / 1e6, 2),
                "relay_roundtrip_s": round(relay_rt, 4),
                "end_to_end_s": round(e2e_best, 3),
                "end_to_end_raw_s": round(e2e_raw_best, 3),
                "raw_transfer_s": round(raw_transfer_s, 3),
                "raw_pass_s": round(raw_pass_s, 3),
                "end_to_end_mvox_s": round(voxels / e2e_min / 1e6, 1),
                "relabel_s": round(relabel_s, 3),
                "transfer_s": round(transfer_s, 3),
                "pass_s": round(pass_s, 3),
                "reps": reps,
                "backend": __import__("jax").default_backend(),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
