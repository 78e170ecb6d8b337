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

    csj = jax.jit(
        lambda b: blocked._chunked_segsum(b, jnp.zeros_like(b).at[::64].set(1))
    )
    emit("chunked_segsum", lambda: fence(csj(ct)[12345]))

    npc = jax.jit(lambda b: jnp.cumsum(b))
    emit("flat_cumsum", lambda: fence(npc(ct)[12345]))

    gj = jax.jit(lambda a, b: jnp.take(a, jnp.clip(b, 0, M - 1)))
    emit("gather_full", lambda: fence(gj(ct, k)[12345]))

    full = jax.jit(
        lambda a, b: blocked._sorted_run_reduce_single(a, b, 48837)
    )
    emit("full_reduce", lambda: fence(full(k, ct)[2]))

    # ---- the REAL 512^3 workload shape: ~12% live entries (converged
    # per-axis kp leaves ~85-90% IMAX padding), ~17 copies per distinct
    # pair, converged entry_cap slice — each pipeline piece fenced
    # separately to locate the ~23 ms stage (VERDICT r3 next #6)
    n = 2031
    n4 = 4 * n
    n_pairs = 14176
    live = 240 * 1024
    cap = 300 * 1024
    IMAX = blocked._IMAX
    los = np.full(M, IMAX, np.int32)
    his = np.full(M, IMAX, np.int32)
    tags = np.zeros(M, np.int32)
    pos = rng.choice(M, size=live, replace=False)
    pair_ids = rng.integers(0, n_pairs, size=live)
    plo = (pair_ids % n).astype(np.int32)
    phi = ((pair_ids * 7) % n).astype(np.int32)
    los[pos] = np.minimum(plo, phi)
    his[pos] = np.maximum(plo, phi) + 1
    tags[pos] = (pair_ids % 3).astype(np.int32)
    cts = np.zeros(M, np.int32)
    cts[pos] = rng.integers(1, 100, size=live)
    los_d, his_d, tags_d, cts_d = (
        jnp.asarray(los), jnp.asarray(his), jnp.asarray(tags),
        jnp.asarray(cts),
    )

    def keybuild(a, b, c, d):
        valid = a < IMAX
        packed = jnp.where(valid, a * n4 + b * 4 + c, IMAX)
        n_live = jnp.sum(valid.astype(jnp.int32))
        return packed, d, n_live

    kb = jax.jit(lambda a, b, c, d: keybuild(a, b, c, d)[0][0])
    emit("real_keybuild", lambda: fence(kb(los_d, his_d, tags_d, cts_d)))

    s1r = jax.jit(
        lambda a, b, c, d: jax.lax.sort(
            (keybuild(a, b, c, d)[0], d), num_keys=1
        )[0][0]
    )
    emit("real_keybuild_sort1", lambda: fence(s1r(los_d, his_d, tags_d, cts_d)))

    def through_segsum(a, b, c, d):
        packed, ct2, n_live = keybuild(a, b, c, d)
        key, ct3 = jax.lax.sort((packed, ct2), num_keys=1)
        key = key[:cap]
        ct3 = ct3[:cap]
        is_start = jnp.concatenate(
            [jnp.ones((1,), jnp.int32),
             (key[1:] != key[:-1]).astype(jnp.int32)]
        )
        seg = blocked._chunked_segsum(ct3, is_start)
        return seg[0] + n_live

    ss = jax.jit(through_segsum)
    emit("real_through_segsum", lambda: fence(ss(los_d, his_d, tags_d, cts_d)))

    fullr = jax.jit(
        lambda a, b, c, d: blocked._sorted_pair_reduce(
            a, b, c, d, 3 * 24 * n, n_labels=n, unpack=False,
            entry_cap=cap, return_live=True,
        )
    )
    emit("real_full_capped", lambda: fence(fullr(los_d, his_d, tags_d, cts_d)[2][0]))

    fullnc = jax.jit(
        lambda a, b, c, d: blocked._sorted_pair_reduce(
            a, b, c, d, 3 * 24 * n, n_labels=n, unpack=False,
            entry_cap=0, return_live=True,
        )
    )
    emit("real_full_uncapped", lambda: fence(fullnc(los_d, his_d, tags_d, cts_d)[2][0]))


if __name__ == "__main__":
    main()
