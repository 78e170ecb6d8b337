"""A/B of the two-phase per-x-row dictionary extraction (cfg.dict_rows,
`pallas_block._dict_extract_rows`) vs the serial chain, on the real TPU.

Stage 1 (always): grid-only timing + ids bit-compare at 512^3 for
dict_rows in (0, 7). Stage 2 (AB_FULL=1): full engine bit-equality +
wall-clock with the converged cfg. Timestamped prints so a Mosaic compile
hang is diagnosable from the log (CLAUDE.md: two prior restructurings hung
full-engine compiles; grid-only compiled fine).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import numpy as np


def stamp(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    import jax
    import jax.numpy as jnp

    from tissue_analysis_tpu.core.stack import LabeledStack
    from tissue_analysis_tpu.ops import pallas_block
    from tissue_analysis_tpu.ops.blocked import _pad_to_blocks

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from _fixtures import load_voronoi

    img = load_voronoi(size)
    stack = LabeledStack.from_array(img, background=1)
    np.asarray(stack.dense[0, 0, 0])
    n = stack.n_labels
    L = pallas_block.PallasConfig().max_labels_per_block

    def fence(x):
        return np.asarray(jax.device_get(x))

    def timeit(f, reps=3):
        f()
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            f()
            best = min(best, time.perf_counter() - t0)
        return best

    variants = [
        ("chain", 0, False, True, False),
        ("chain_vec", 0, False, True, True),  # vectorized band-collapse
        ("rows7", 7, False, True, False),
        ("rows7_sep", 7, True, True, False),
        ("rows1_p1only", 1, False, False, False),  # restack + 1 step + fixed
        ("rows7_p1only", 7, False, False, False),  # phase-1 alone
    ]
    ids_ab = {}
    for name, dr, sep, p2, vec in variants:
        pallas_block._ROWS_SEP = sep
        pallas_block._ROWS_PHASE2 = p2
        pallas_block._CHAIN_VEC = vec
        cfg = pallas_block.PallasConfig(dict_rows=dr)

        def grid_only(dense):
            if dense.dtype != jnp.uint16 and n <= 65535:
                dense = dense.astype(jnp.uint16)
            padded = _pad_to_blocks(dense, n, cfg.block)
            offs = jnp.asarray(
                pallas_block._block_offsets_np(padded.shape, cfg.block)
            )
            return pallas_block._pallas_main_pass(
                padded, cfg.block, L, n, False, offs=offs,
                dict_rows=cfg.dict_rows,
            )

        gj = jax.jit(lambda d: grid_only(d)[0][0, 0])
        stamp(f"compiling grid {name}")
        t = timeit(lambda: fence(gj(stack.dense)))
        stamp(f"grid {name}: {t:.4f}s")
        print(json.dumps({"variant": name, "grid_s": round(t, 4)}),
              flush=True)
        if p2:
            idsj = jax.jit(lambda d: grid_only(d)[0])
            ids_ab[name] = fence(idsj(stack.dense))
            dovf = bool(fence(jax.jit(lambda d: grid_only(d)[7].any())(
                stack.dense)))
            stamp(f"{name} dovf={dovf}")
    pallas_block._ROWS_SEP = False
    pallas_block._ROWS_PHASE2 = True
    pallas_block._CHAIN_VEC = False

    eq = all(
        np.array_equal(ids_ab["chain"], v)
        for k, v in ids_ab.items() if k != "chain"
    )
    print(json.dumps({"ids_bit_equal": bool(eq)}), flush=True)
    if not eq:
        return

    if os.environ.get("AB_FULL"):
        import dataclasses

        from tissue_analysis_tpu.engine import _GOOD_CFG, analyze_stack_pallas

        stamp("full engine dict_rows=0 (2 warmups)")
        t0 = analyze_stack_pallas(stack)
        t0 = analyze_stack_pallas(stack)
        tt0 = timeit(lambda: analyze_stack_pallas(stack))
        # seed the rows-mode cfg from the CONVERGED default cfg so both
        # legs run the same tightened buffers (a raw PallasConfig would
        # re-pay discovery and sort an untightened stream)
        good = _GOOD_CFG.get(("pallas", stack.shape, n))
        cfg7 = dataclasses.replace(
            good or pallas_block.PallasConfig(), dict_rows=7
        )
        stamp("full engine dict_rows=7 compile")
        t7 = analyze_stack_pallas(stack, cfg=cfg7)
        stamp("full engine dict_rows=7 run 2")
        t7 = analyze_stack_pallas(stack, cfg=cfg7)
        tt7 = timeit(lambda: analyze_stack_pallas(stack, cfg=cfg7))
        ok = all(
            np.array_equal(getattr(t0, f), getattr(t7, f))
            for f in ("count", "s1", "s2", "cmin", "cmax", "pair_lo",
                      "pair_hi", "wall_face_counts", "margin")
        )
        print(
            json.dumps(
                {"engine_s_chain": round(tt0, 4),
                 "engine_s_rows": round(tt7, 4),
                 "table_bit_equal": bool(ok)}
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
