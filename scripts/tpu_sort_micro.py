"""Micro-attribution of the sorted pair reduce on the real TPU.

Times each piece on a synthetic 1.97M-entry stream (the 512^3 workload):
sort1, chunked vs flat scans, gather, sort2 — one JSON line per probe so
partial results survive interruptions.
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tissue_analysis_tpu.ops import blocked

    M = 1966080
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.integers(0, 4 * 2031 * 2031, size=M, dtype=np.int32))
    ct = jnp.asarray(rng.integers(1, 100, size=M, dtype=np.int32))

    def fence(x):
        return np.asarray(jax.device_get(x))

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

    triv = jax.jit(lambda a: a[12345] + 1)
    emit("roundtrip", lambda: fence(triv(k)))

    s1 = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=1))
    emit("sort_2op", lambda: fence(s1(k, ct)[0][12345]))

    s1a = jax.jit(lambda a: jax.lax.sort((a,), num_keys=1)[0])
    emit("sort_1op", lambda: fence(s1a(k)[12345]))

    s3 = jax.jit(lambda a, b, c: jax.lax.sort((a, b, c), num_keys=2))
    emit("sort_3op_2key", lambda: fence(s3(k, ct, ct)[0][12345]))

    csj = jax.jit(lambda b: blocked._chunked_scan(b, jnp.add, 0))
    emit("chunked_cumsum", lambda: fence(csj(ct)[12345]))

    cmj = jax.jit(lambda b: blocked._chunked_scan(b, jnp.maximum, -1))
    emit("chunked_cummax", lambda: fence(cmj(ct)[12345]))

    npc = jax.jit(lambda b: jnp.cumsum(b))
    emit("flat_cumsum", lambda: fence(npc(ct)[12345]))

    gj = jax.jit(lambda a, b: jnp.take(a, jnp.clip(b, 0, M - 1)))
    emit("gather_full", lambda: fence(gj(ct, k)[12345]))

    full = jax.jit(
        lambda a, b: blocked._sorted_run_reduce_single(a, b, 48837)
    )
    emit("full_reduce", lambda: fence(full(k, ct)[2]))


if __name__ == "__main__":
    main()
