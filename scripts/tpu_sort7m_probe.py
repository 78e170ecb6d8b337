"""Compile-time bisect of the two-key pair reduce at the 7M-entry scale
that stalls the Gvox-wide streamed compile (BASELINE.md round 4): lower +
compile each sub-piece separately, timestamped. Execution is NOT timed —
this is purely about which composition the compiler chokes on.

Round 5 adds the fix-candidate pieces (two-pass stable single-key
lexicographic sort — `blocked._lex_sort2`) and per-piece selection so each
piece can run in its own subprocess with a hard timeout (a piece that
stalls >20 min must not block the rest, and killing one subprocess
mid-compile wedges only that probe, after which the queue waits it out).

Usage: python scripts/tpu_sort7m_probe.py [M [max_entries [n]]] \
           [--pieces name1,name2,...]
Piece names: see PIECES below; default runs the benign set (everything
except the known-stall suspects sort_3op_2key_7M / legacy variants).
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")


def stamp(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from tissue_analysis_tpu.ops import blocked

    argv = sys.argv[1:]
    pieces_sel = None
    if "--pieces" in argv:
        i = argv.index("--pieces")
        pieces_sel = argv[i + 1].split(",")
        argv = argv[:i] + argv[i + 2:]
    args = [int(a) for a in argv]
    M = args[0] if len(args) > 0 else 7077888
    max_entries = args[1] if len(args) > 1 else 4471272
    n = args[2] if len(args) > 2 else 62101
    s = jax.ShapeDtypeStruct((M,), jnp.int32)
    sc = jax.ShapeDtypeStruct((max_entries,), jnp.int32)

    def touch(tree):
        leaves = jax.tree_util.tree_leaves(tree)
        return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)

    def with_mode(mode, fn, total_mode=None):
        def wrapped(*xs):
            old = blocked._TWO_KEY_SORT_MODE
            old_t = blocked._RUN_TOTAL_MODE
            blocked._TWO_KEY_SORT_MODE = mode
            if total_mode:
                blocked._RUN_TOTAL_MODE = total_mode
            try:
                return fn(*xs)
            finally:
                blocked._TWO_KEY_SORT_MODE = old
                blocked._RUN_TOTAL_MODE = old_t
        return wrapped

    PIECES = {
        "sort_2op_7M": (
            lambda a, b: touch(jax.lax.sort((a, b), num_keys=1)), (s, s)),
        "sort_3op_1key_7M": (
            lambda a, b, c: touch(
                jax.lax.sort((a, b, c), num_keys=1, is_stable=True)
            ),
            (s, s, s)),
        "lexsort_twopass_7M": (
            with_mode("twopass", lambda a, b, c: touch(
                blocked._lex_sort2(a, b, c))),
            (s, s, s)),
        "sort_3op_2key_7M": (
            lambda a, b, c: touch(jax.lax.sort((a, b, c), num_keys=2)),
            (s, s, s)),
        "segsum_cap": (
            lambda a, b: touch(blocked._chunked_segsum(a, b)), (sc, sc)),
        "segsum_7M": (
            lambda a, b: touch(blocked._chunked_segsum(a, b)), (s, s)),
        "cumsum_7M": (
            lambda a: touch(jnp.cumsum(a)), (s,)),
        "runreduce_keys_7M": (
            with_mode("twopass", lambda a, b, c: touch(
                blocked._sorted_pair_reduce_keys(a, b, c, max_entries))),
            (s, s, s)),
        "runreduce_keys_segscan_7M": (
            with_mode("twopass", lambda a, b, c: touch(
                blocked._sorted_pair_reduce_keys(a, b, c, max_entries)),
                total_mode="segscan"),
            (s, s, s)),
        "runreduce_keys_legacy_7M": (
            with_mode("legacy", lambda a, b, c: touch(
                blocked._sorted_pair_reduce_keys(a, b, c, max_entries))),
            (s, s, s)),
        "full_two_key_7M": (
            with_mode("twopass", lambda a, b, c, d: touch(
                blocked._sorted_pair_reduce(
                    a, b, c, d, max_entries, n_labels=n, unpack=False
                ))),
            (s, s, s, s)),
        "full_two_key_legacy_7M": (
            with_mode("legacy", lambda a, b, c, d: touch(
                blocked._sorted_pair_reduce(
                    a, b, c, d, max_entries, n_labels=n, unpack=False
                ))),
            (s, s, s, s)),
    }
    default = [
        "sort_2op_7M", "sort_3op_1key_7M", "lexsort_twopass_7M",
        "cumsum_7M", "runreduce_keys_7M", "full_two_key_7M",
    ]
    for name in pieces_sel or default:
        fn, specs = PIECES[name]
        stamp(f"lowering {name}")
        t0 = time.perf_counter()
        lw = jax.jit(fn).lower(*specs)
        stamp(f"lowered ({time.perf_counter()-t0:.1f}s); compiling {name}")
        t0 = time.perf_counter()
        lw.compile()
        stamp(f"{name} COMPILED in {time.perf_counter()-t0:.1f}s")


if __name__ == "__main__":
    main()
