"""Micro-attribution of the CAPPED pair reduce on the real TPU.

The 512^3 real path (converged cfg) is:
  stream 1,966,080 slots (~12% live) -> full 2-op sort + [:300,800] slice
  -> _sorted_run_reduce_single(presorted=True, max_entries 48,837).
Times every piece on a synthetic stream with the real liveness profile —
one JSON line per probe so partial results survive interruptions.

History (r3): the previous gather-based _compact_live_entries measured
~27 ms NET at this size vs ~3.5 ms for the full 2M sort — TPU gathers are
near-serial, sorts are cheap — so the capped path now sorts and slices.
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
    CAP = 300800
    LIVE = 240000
    MAXE = 48837
    rng = np.random.default_rng(0)
    kh = np.full(M, 2**31 - 1, np.int32)
    pos = rng.choice(M, size=LIVE, replace=False)
    # ~48k distinct pairs, each appearing in several blocks (the real
    # profile: per-(pair,axis) runs of ~5 entries)
    kh[pos] = rng.integers(0, 4 * 2031 * 2031, size=LIVE) // 337 * 337
    k = jnp.asarray(kh)
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

    # piece 1: the full 2-operand sort of the raw 2M stream + cap slice
    srt = jax.jit(
        lambda a, b: tuple(
            v[:CAP] for v in jax.lax.sort((a, b), num_keys=1)
        )
    )
    emit("sort2M_slice", lambda: fence(srt(k, ct)[0][123]))

    kc, cc = srt(k, ct)

    # piece 2: the presorted run reduce on the CAPPED stream (300,800)
    rr = jax.jit(
        lambda a, b: blocked._sorted_run_reduce_single(
            a, b, MAXE, presorted=True
        )
    )
    emit("run_reduce_300k_presorted", lambda: fence(rr(kc, cc)[1]))

    # run-reduce sub-pieces on the capped stream
    s2 = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=1))
    emit("sort_2op_300k", lambda: fence(s2(kc, cc)[0][123]))

    ks, cs_ = s2(kc, cc)
    csj = jax.jit(lambda b: blocked._chunked_scan(b, jnp.add, 0))
    emit("chunked_cumsum_300k", lambda: fence(csj(cs_)[123]))
    cmj = jax.jit(lambda b: blocked._chunked_scan(b, jnp.maximum, -1))
    emit("chunked_cummax_300k", lambda: fence(cmj(cs_)[123]))
    gj = jax.jit(lambda a, b: jnp.take(a, jnp.clip(b, 0, CAP - 1)))
    emit("gather_300k", lambda: fence(gj(cs_, ks)[123]))

    # build (lo, hi, tag) views whose packed key reproduces k where live
    lo = jnp.where(k < 2**31 - 1, k // (4 * 2031), 2**31 - 1)
    hi = jnp.where(k < 2**31 - 1, (k % (4 * 2031)) // 4, 2**31 - 1)
    tg = jnp.where(k < 2**31 - 1, k % 4, 0)
    fullj = jax.jit(
        lambda a, b, c, d: blocked._sorted_pair_reduce(
            a, b, c, d, MAXE, n_labels=2031, unpack=False,
            entry_cap=CAP, return_live=True,
        )
    )
    emit("full_capped_path", lambda: fence(fullj(lo, hi, tg, ct)[2][123]))

    # uncapped comparison
    unc = jax.jit(
        lambda a, b, c, d: blocked._sorted_pair_reduce(
            a, b, c, d, MAXE, n_labels=2031, unpack=False,
            entry_cap=0, return_live=True,
        )
    )
    emit("full_uncapped_path", lambda: fence(unc(lo, hi, tg, ct)[2][123]))


if __name__ == "__main__":
    main()
