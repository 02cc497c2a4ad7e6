"""Microbenchmark of group_by_bin internals (loop-timed on TPU)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

N = 100


def timed(label, body_builder, carry0, n=N, reps=3):
    @jax.jit
    def run(c):
        return jax.lax.fori_loop(0, n, body_builder(), c)
    jax.block_until_ready(run(carry0))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(carry0))
        ts.append(time.perf_counter() - t0)
    print(f"{label:56s} {min(ts)*1e3/n:8.4f} ms/op")


def main():
    m, n_bins, cap = 16384, 256, 128
    rng = np.random.default_rng(0)
    ids0 = jnp.asarray(rng.integers(0, n_bins, m, dtype=np.int32))
    static_offsets = jnp.asarray(
        (np.arange(n_bins) * (m // n_bins)).astype(np.int32))

    def v_baseline():
        def body(i, ids):
            return (ids + 1) % n_bins
        return body

    def v_argsort():
        def body(i, ids):
            o = jnp.argsort(ids, stable=True).astype(jnp.int32)
            return (ids + o) % n_bins
        return body

    def v_eq_counts():
        def body(i, ids):
            counts = jnp.sum(
                (ids[None, :] == jnp.arange(n_bins, dtype=ids.dtype)[:, None])
                .astype(jnp.int32), axis=1)
            return (ids + counts[ids]) % n_bins
        return body

    def v_eq_counts_dot():
        # one-hot matmul formulation: counts = 1^T . onehot
        def body(i, ids):
            oh = (ids[:, None] == jnp.arange(n_bins, dtype=ids.dtype)[None, :])
            counts = jnp.sum(oh, axis=0, dtype=jnp.int32)
            return (ids + counts[ids]) % n_bins
        return body

    def v_member_static():
        # member build with precomputed offsets (isolates the gather)
        def body(i, ids):
            o = jnp.argsort(ids, stable=True).astype(jnp.int32)
            slot = static_offsets[:, None] + jnp.arange(cap, dtype=jnp.int32)[None, :]
            member = o[jnp.clip(slot, 0, m - 1)]
            return (ids + member[0, 0]) % n_bins
        return body

    def v_full():
        from icp_tpu.rbc.grouping import group_by_bin

        def body(i, ids):
            g = group_by_bin(ids, n_bins, cap)
            return (ids + g.member[0, 0] + g.counts[0]) % n_bins
        return body

    def v_sort_pairs():
        # single sort of (key, payload) pairs via lax.sort — avoids the
        # separate argsort-then-gather
        def body(i, ids):
            pos = jnp.arange(m, dtype=jnp.int32)
            sk, so = jax.lax.sort((ids, pos), num_keys=1)
            return (ids + so[0] + sk[0]) % n_bins
        return body

    timed("baseline", v_baseline, ids0)
    timed("argsort only", v_argsort, ids0)
    timed("eq counts (bins, m) reduce", v_eq_counts, ids0)
    timed("eq counts (m, bins) reduce", v_eq_counts_dot, ids0)
    timed("argsort + member gather (static offsets)", v_member_static, ids0)
    timed("lax.sort pairs", v_sort_pairs, ids0)
    timed("full group_by_bin", v_full, ids0)


if __name__ == "__main__":
    main()
