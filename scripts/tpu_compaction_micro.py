"""Split the pair-compaction stage cost on the real TPU.

At 512^3 the compaction (top_k + id lookup) measures ~28 ms. This times
each piece on realistic shapes ([B, L, L] count mats, B = 8192, L = 32,
kp = 80) to direct the optimization:
  1. top_k alone
  2. one-hot select id lookup alone (the current exact-gather)
  3. take_along_axis gather (the generic alternative)
  4. full current _compact_pair_mats (all three axes)
  5. sort-based compaction: variadic sort of (neg count, lo, hi) rows —
     no post-hoc id lookup at all (lo/hi broadcast-built, 1 sort)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/tpu_compaction_micro.py
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

    B, L, kp, n = 8192, 32, 80, 2031
    rng = np.random.default_rng(0)
    # ~22 nonzero entries per [L, L] matrix, realistic counts
    mats = np.zeros((B, L * L), np.int32)
    for b in range(0, B, 64):  # sparse fill, cheap to generate
        idx = rng.choice(L * L, size=22, replace=False)
        mats[b : b + 64, idx] = rng.integers(1, 2000, size=22)
    mats = mats.reshape(B, L, L)
    ids_np = np.sort(rng.integers(0, n, size=(B, L)).astype(np.int32), axis=1)

    mats_d = jax.device_put(mats)
    ids_d = jax.device_put(ids_np)

    def fence(x):
        return np.asarray(jax.device_get(x))

    def timeit(f, reps=5):
        f()
        f()
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            f()
            best = min(best, time.perf_counter() - t0)
        return best

    flat = lambda m: m.reshape(B, L * L)  # noqa: E731

    # 1. top_k alone
    topk_j = jax.jit(lambda m: jax.lax.top_k(flat(m), kp)[0][0, 0])
    t_topk = timeit(lambda: fence(topk_j(mats_d)))

    # 1b. top_k of int16 counts (counts < 2^15 at block size 16K)
    topk16_j = jax.jit(
        lambda m: jax.lax.top_k(flat(m).astype(jnp.int16), kp)[0][0, 0]
    )
    t_topk16 = timeit(lambda: fence(topk16_j(mats_d)))

    # 2. one-hot select lookup alone (lk precomputed on device)
    lk_d = jax.jit(lambda m: jax.lax.top_k(flat(m), kp)[1])(mats_d)
    lk_d.block_until_ready()

    def select(sel_idx, idsf):
        lane = jnp.arange(L, dtype=jnp.int32)
        sel = (sel_idx[..., None] == lane).astype(jnp.float32)
        return jax.lax.dot_general(
            sel, idsf, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)

    sel_j = jax.jit(
        lambda lk, ids: select(lk // L, ids.astype(jnp.float32))[0, 0]
        + select(lk % L, ids.astype(jnp.float32))[0, 0]
    )
    t_select = timeit(lambda: fence(sel_j(lk_d, ids_d)))

    # 2b. int8 one-hot + 8-bit-split ids: s8 MXU dot, 1/4 the sel bytes
    def select8(sel_idx, ids):
        lane = jnp.arange(L, dtype=jnp.int32)
        sel = (sel_idx[..., None] == lane).astype(jnp.int8)
        d = lambda v: jax.lax.dot_general(  # noqa: E731
            sel, v.astype(jnp.int8), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )
        return d(ids & 127) + (d((ids >> 7) & 127) << 7) + (d(ids >> 14) << 14)

    sel8_j = jax.jit(
        lambda lk, ids: select8(lk // L, ids)[0, 0] + select8(lk % L, ids)[0, 0]
    )
    t_select8 = timeit(lambda: fence(sel8_j(lk_d, ids_d)))

    # 3. generic gather
    gat_j = jax.jit(
        lambda lk, ids: jnp.take_along_axis(ids, lk // L, axis=1)[0, 0]
        + jnp.take_along_axis(ids, lk % L, axis=1)[0, 0]
    )
    t_gather = timeit(lambda: fence(gat_j(lk_d, ids_d)))

    # 4. full current compaction, 3 axes
    def full3(m, ids):
        acc = jnp.zeros((), jnp.int32)
        for _ in range(3):
            lo, hi, ct, ov, nz = blocked._compact_pair_mats(m, ids, ids, n, kp)
            acc = acc + lo[0] + hi[0] + ct[0]
        return acc

    full_j = jax.jit(full3)
    t_full3 = timeit(lambda: fence(full_j(mats_d, ids_d)))

    # 5. sort-based: build lo/hi by broadcast, variadic-sort rows by
    # -count, slice kp — no id lookup
    def sortc(m, ids):
        f = flat(m)
        lo_b = jnp.broadcast_to(ids[:, :, None], (B, L, L)).reshape(B, L * L)
        hi_b = jnp.broadcast_to(ids[:, None, :], (B, L, L)).reshape(B, L * L)
        key = jnp.where(f > 0, -f, 2**31 - 1)
        k, lo, hi = jax.lax.sort((key, lo_b, hi_b), dimension=1, num_keys=1)
        return (-k[:, :kp])[0, 0] + lo[:, :kp][0, 0] + hi[:, :kp][0, 0]

    sortc_j = jax.jit(sortc)
    t_sortc = timeit(lambda: fence(sortc_j(mats_d, ids_d)))

    # relay round-trip floor
    triv_j = jax.jit(lambda m: m[0, 0, 0] + 1)
    t_rt = timeit(lambda: fence(triv_j(mats_d)))

    print(
        json.dumps(
            {
                "topk_s": round(t_topk, 4),
                "topk_i16_s": round(t_topk16, 4),
                "select_s": round(t_select, 4),
                "select_i8_s": round(t_select8, 4),
                "gather_s": round(t_gather, 4),
                "full3_s": round(t_full3, 4),
                "sort_compact_s": round(t_sortc, 4),
                "roundtrip_s": round(t_rt, 4),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
