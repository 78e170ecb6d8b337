"""Measure relay readback cost vs BUFFER COUNT and payload on the real TPU.

The 512^3 collect does one jax.device_get over 12 arrays (1 big moment
table, 2 pair arrays, 9 scalar/tiny stats). If the tunneled relay charges
per-buffer latency, merging the small outputs into one stats vector (and
k1+total into one [2, E] array) is free wall-clock. One JSON line per
probe so partial results survive interruptions.
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    N, C = 2031, 68
    E = 48837

    def timeit(f, reps=5):
        f()
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            f()
            best = min(best, time.perf_counter() - t0)
        return round(best, 4)

    def emit(name, fn):
        t = timeit(fn)
        print(json.dumps({name: t}), flush=True)
        return t

    rng = np.random.default_rng(0)

    @jax.jit
    def make(x):
        mom = (x[:N * C] + 1).reshape(N, C)
        k1 = x[:E] * 3
        k2 = x[:1]
        total = x[E:2 * E] + 7
        scal = [x[i] + i for i in range(9)]
        return (mom, k1, k2, total) + tuple(scal)

    @jax.jit
    def make3(x):
        mom = (x[:N * C] + 1).reshape(N, C)
        pairs = jnp.stack([x[:E] * 3, x[E:2 * E] + 7])
        stats = x[:12] + 5
        return mom, pairs, stats

    @jax.jit
    def make1(x):
        # everything in ONE flat buffer
        mom = x[:N * C] + 1
        pairs = jnp.concatenate([x[:E] * 3, x[E:2 * E] + 7])
        stats = x[:12] + 5
        return jnp.concatenate([mom, pairs, stats])

    x = jnp.asarray(rng.integers(0, 1000, size=N * C + 2 * E, dtype=np.int32))

    out12 = make(x)
    out3 = make3(x)
    out1 = make1(x)
    emit("get_12_buffers", lambda: jax.device_get(out12))
    emit("get_3_buffers", lambda: jax.device_get(out3))
    emit("get_1_buffer", lambda: jax.device_get(out1))
    emit("get_1_scalar", lambda: jax.device_get(out12[4]))
    emit("get_mom_only", lambda: jax.device_get(out12[0]))
    emit("get_9_scalars", lambda: jax.device_get(out12[4:]))
    # np.asarray single-array path (what timing uses)
    emit("np_asarray_mom", lambda: np.asarray(out12[0]))


if __name__ == "__main__":
    main()
