"""Attribute the 262,144-label blocked-engine time (VERDICT r4 weak #3 /
next #4): split the ~4 s steady-state into device compute, device->host
readback payload, and host assemble — so the fix (if any) targets the
measured dominant term instead of the guessed one.

Usage: PYTHONPATH=... python -u scripts/tpu_highlabel_attrib.py [cell]
(cell=8 -> 262,144 labels; cell=16 -> 32,768.)
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import numpy as np


def timeit(fn, reps=3):
    fn()
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax

    from tissue_analysis_tpu.core.stack import LabeledStack
    from tissue_analysis_tpu.core.synthetic import grid_stack
    from tissue_analysis_tpu.engine import analyze_stack_blocked
    from tissue_analysis_tpu.ops import blocked

    cell = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    img = grid_stack((512, 512, 512), (cell,) * 3)
    stack = LabeledStack.from_array(np.asarray(img), background=None)
    np.asarray(stack.dense[0, 0, 0])
    n = stack.n_labels
    print(f"[{time.strftime('%H:%M:%S')}] n={n}; warmups...", flush=True)

    from tissue_analysis_tpu.utils import timing

    cfg = blocked.BlockConfig(max_labels_per_block=128, max_pairs=300_000)
    analyze_stack_blocked(stack, cfg=cfg)
    t_engine = timeit(lambda: analyze_stack_blocked(stack, cfg=cfg))
    with timing.collect() as tc:
        analyze_stack_blocked(stack, cfg=cfg)
    print("engine stages:", {k: round(v["seconds"], 3)
                             for k, v in tc.as_dict().items()}, flush=True)

    out, wshift = blocked.blocked_sweep(stack.dense, n, cfg)
    # device compute only: fence ONE scalar output (n_runs) — the sweep
    # re-executes per call (jit cached in _SWEEP_CACHE), payload stays on
    # device
    t_compute = timeit(
        lambda: np.asarray(
            jax.device_get(blocked.blocked_sweep(stack.dense, n, cfg)[0][4])
        )
    )
    # compute + FULL readback (fresh arrays each rep — jax.Array caches
    # its host copy, so re-getting the same buffers measures nothing)
    t_comp_read = timeit(
        lambda: jax.device_get(blocked.blocked_sweep(stack.dense, n, cfg)[0])
    )
    t_readback = t_comp_read - t_compute
    payload_mb = sum(np.asarray(o).nbytes for o in out) / 1e6

    host = jax.device_get(out)
    mom, k1, k2, total = host[0], host[1], host[2], host[3]
    t_assemble = timeit(
        lambda: (
            blocked.assemble_moments_packed_blocked(mom),
            blocked.assemble_pairs(k1, k2, total),
        )
    )
    print(
        json.dumps(
            {
                "labels": n,
                "engine_s": round(t_engine, 3),
                "device_compute_s": round(t_compute, 3),
                "readback_s": round(t_readback, 3),
                "readback_payload_mb": round(payload_mb, 1),
                "host_assemble_s": round(t_assemble, 3),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
