"""Per-component timing on the current backend (run on TPU to find hotspots).

The axon tunnel adds ~25 ms per dispatch, so single-call timing is useless.
Each component is iterated N times INSIDE one jitted ``lax.fori_loop`` with a
data dependency between iterations; per-op time = (loop_time - empty_loop) / N.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

N_LOOP = 100


def timed(label, make_body, carry_init, n=N_LOOP, reps=3):
    """make_body() -> body(i, carry) for lax.fori_loop."""

    @jax.jit
    def run(carry):
        return jax.lax.fori_loop(0, n, make_body(), carry)

    out = jax.block_until_ready(run(carry_init))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(carry_init))
        ts.append(time.perf_counter() - t0)
    total = min(ts)
    print(f"{label:44s} {total*1e3/n:9.4f} ms/op   (loop {total*1e3:7.1f} ms)")
    return out


def main():
    from icp_tpu import ICPConfig, ICPParams
    from icp_tpu.icp.run import build_index
    from icp_tpu.icp.state import identity_state
    from icp_tpu.icp.step import icp_step
    from icp_tpu.ops.distance import pairwise_sq_dists, metric_weights
    from icp_tpu.rbc.grouping import group_by_bin
    from icp_tpu.rbc.search import rbc_search
    from __graft_entry__ import _synthetic_pair

    config = ICPConfig()
    params = ICPParams(alpha=2e2).as_f32()
    fixed_np, moving_np = _synthetic_pair(config.m)
    fixed = jnp.asarray(fixed_np)
    moving = jnp.asarray(moving_np)
    index = jax.block_until_ready(
        jax.jit(lambda f: build_index(f, params, config))(fixed))

    # Baseline: empty loop (dispatch + loop overhead).
    timed("empty loop (overhead baseline)",
          lambda: (lambda i, c: c + 1.0), jnp.float32(0))

    # Full icp_step chained through the state.
    def step_body():
        def body(i, st):
            return icp_step(st, moving, index, params, config)
        return body
    timed("icp_step (full iteration)", step_body, identity_state())

    # rbc_search chained by perturbing queries with the result.
    def search_body():
        def body(i, q):
            res = rbc_search(index, q, params.alpha, config.query_capacity)
            return q + (res.nn_dist[:, None] * 1e-20)
        return body
    timed("rbc_search", search_body, moving)

    # Phase 1 only.
    def phase1_body():
        def body(i, q):
            d2 = pairwise_sq_dists(q, index.reps, params.alpha)
            rid = jnp.argmin(d2, 1)
            return q + (rid[:, None] * 1e-20).astype(q.dtype)
        return body
    timed("phase1 d2(16384,256)+argmin", phase1_body, moving)

    # argsort 16k int32.
    rep_ids = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, 16384, dtype=np.int32))
    def argsort_body():
        def body(i, r):
            o = jnp.argsort(r, stable=True).astype(jnp.int32)
            return (r + o) % 256
        return body
    timed("argsort(16384) stable", argsort_body, rep_ids)

    # full group_by_bin.
    def group_body():
        def body(i, r):
            g = group_by_bin(r, 256, config.query_capacity)
            return (r + g.counts[r]) % 256
        return body
    timed("group_by_bin(16384->256bins)", group_body, rep_ids)

    # batched einsum.
    qg0 = jnp.ones((256, config.query_capacity, 8), jnp.float32)
    def einsum_body():
        def body(i, qg):
            c = jnp.einsum("rqd,rcd->rqc", qg, index.bins,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
            return qg + jnp.mean(c) * 1e-20
        return body
    timed(f"einsum (256,{config.query_capacity},{index.bins.shape[1]})x8",
          einsum_body, qg0)

    # argmin over the (256, cq, cb) distance tensor.
    d0 = jnp.ones((256, config.query_capacity, index.bins.shape[1]), jnp.float32)
    def argmin3_body():
        def body(i, d):
            a = jnp.argmin(d, -1)
            m_ = jnp.min(d, -1)
            return d + (m_ + a.astype(jnp.float32))[..., None] * 1e-20
        return body
    timed("argmin+min over (256,cq,cb)", argmin3_body, d0)

    # gather queries[member].
    member = jnp.asarray(
        np.random.default_rng(1).integers(0, 16384, (256, config.query_capacity),
                                          dtype=np.int32))
    def gather_body():
        def body(i, q):
            g = q[member]
            return q + jnp.mean(g) * 1e-20
        return body
    timed("gather (256,cq,8) from (16384,8)", gather_body, moving)

    # scatter .at[].set of grouped results.
    vals = jnp.ones((256 * config.query_capacity,), jnp.float32)
    def scatter_body():
        def body(i, base):
            out = base.at[member.reshape(-1)].set(vals, mode="drop")
            return out * (1.0 - 1e-20)
        return body
    timed("scatter 256*cq -> 16384", scatter_body, jnp.zeros((16384,), jnp.float32))

    # moments chain.
    from icp_tpu.ops import moments
    w = jnp.ones((16384,), jnp.float32)
    def moments_body():
        def body(i, mv):
            mf, mm = moments.centroids(fixed, mv, w, jnp.float32(16384.0))
            df = moments.deviations(fixed, mf)
            dm = moments.deviations(mv, mm)
            S = moments.s_matrix(dm, df, params.c, w)
            return mv + S[0] * 1e-20
        return body
    timed("weights+centroids+devs+S11", moments_body, moving)

    # power solve.
    from icp_tpu.icp import horn
    S9 = jnp.asarray(
        np.random.default_rng(1).normal(size=9).astype(np.float32) * 1e-3)
    def power_body():
        def body(i, s):
            q = horn.solve_rotation_power(s)
            return s + q[0] * 1e-20
        return body
    timed("power solve", power_body, S9)

    # transform.
    from icp_tpu.icp.quaternion import transform_points, qidentity
    def tf_body():
        def body(i, mv):
            t = transform_points(mv, qidentity(), jnp.zeros(3), jnp.float32(1.0))
            return t
        return body
    timed("transform 16384x8", tf_body, moving)

    # brute-force NN via half-expansion matmul + argmin (the Pallas target).
    w8 = metric_weights(jnp.float32(2e2))
    sq_db = jnp.sum(fixed * w8 * fixed, axis=-1)
    def brute_body():
        def body(i, q):
            score = jnp.dot(q * w8, fixed.T,
                            precision=jax.lax.Precision.HIGHEST)
            nn = jnp.argmin(sq_db[None, :] - 2 * score, axis=1)
            return q + (nn[:, None] * 1e-20).astype(q.dtype)
        return body
    timed("brute 16384x16384 matmul+argmin", brute_body, moving, n=20)


if __name__ == "__main__":
    main()
