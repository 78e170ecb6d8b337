"""Micro-probe: does Mosaic run uint16/int16 vector compares faster than
int32 (2-per-lane packing), and is the result exact?

The kernel's one-hot builds (16 full [L, K8] compares per block) are the
largest VPU cost after the dictionary chain; if i16 compares run at 2x lane
throughput the grid loses several ms at 512^3. Each probe times a tiny
pallas kernel doing ONLY the compare loop over a [B, 8, 2048] input.

One JSON line per probe so partial results survive interruptions.
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L, K8, B, REPS = 32, 2048, 8192, 40

    rng = np.random.default_rng(0)
    v_np = rng.integers(0, 2000, size=(B, 8, K8), dtype=np.int32)
    ids_np = rng.integers(0, 2000, size=(L, 1), dtype=np.int32)

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

    def make(dtype, via_bf16_sum=True):
        # kernel: REPS one-hot builds + accumulate so nothing is DCE'd
        def kernel(v_ref, ids_ref, out_ref):
            v = v_ref[0]
            ids = ids_ref[:, :]
            acc = jnp.zeros((L, K8), jnp.float32)
            for r in range(REPS):
                for s in range(8):
                    oh = (v[s:s + 1, :] == ids).astype(jnp.bfloat16)
                    acc = acc + oh.astype(jnp.float32) * jnp.float32(r + 1)
            out_ref[0] = acc

        mat = lambda i: (i, 0, 0)  # noqa: E731
        def run(v, ids):
            return pl.pallas_call(
                kernel,
                grid=(v.shape[0],),
                in_specs=[
                    pl.BlockSpec((1, 8, K8), mat, memory_space=pltpu.VMEM),
                    pl.BlockSpec((L, 1), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, L, K8), mat,
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((v.shape[0], L, K8),
                                               jnp.float32),
            )(v, ids)
        return jax.jit(run)

    Bsmall = 512  # enough work to time, small enough to compile fast
    for name, dt in (("i32", jnp.int32), ("u16", jnp.uint16),
                     ("i16", jnp.int16)):
        try:
            v = jnp.asarray(v_np[:Bsmall].astype(dt))
            ids = jnp.asarray(ids_np.astype(dt))
            f = make(dt)
            out = fence(f(v, ids))
            # exactness: compare against numpy
            w = np.arange(1, REPS + 1).sum()
            expect = (
                (v_np[:Bsmall, :, None, :] == ids_np[None, None, :, 0, None])
                .astype(np.float32).sum(axis=1) * w
            )
            ok = bool(np.array_equal(out, expect))
            t = timeit(lambda: fence(f(v, ids)[0, 0, 0]))
            print(json.dumps({"probe": name, "exact": ok,
                              "s": round(t, 4)}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"probe": name,
                              "failed": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
