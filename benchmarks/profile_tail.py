"""Isolate the post-search cost of icp_step (loop-timed on TPU)."""

import time

import jax
import jax.numpy as jnp

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
    from icp_tpu import ICPConfig, ICPParams
    from icp_tpu.icp.horn import solve_step_transform
    from icp_tpu.icp.quaternion import qmul, qnormalize, qrotate, transform_points
    from icp_tpu.icp.run import build_index
    from icp_tpu.icp.state import ICPState, identity_state
    from icp_tpu.icp.step import icp_step, _find_correspondences
    from icp_tpu.ops.moments import (centroids, compute_weights, deviations,
                                     masked_weight_sum, s_matrix)
    from __graft_entry__ import _synthetic_pair

    config = ICPConfig()
    params = ICPParams(alpha=2e2).as_f32()
    fixed_np, moving_np = _synthetic_pair(config.m)
    moving = jnp.asarray(moving_np)
    index = jax.block_until_ready(jax.jit(
        lambda f: build_index(f, params, config))(jnp.asarray(fixed_np)))

    def search_only():
        def body(i, st):
            tm = transform_points(moving, st.q, st.t, st.s)
            mv, mf, nd, mask, mn, _ = _find_correspondences(tm, index, params,
                                                         config)
            # Minimal consumption: tiny reductions only.
            delta = jnp.mean(nd) * 1e-20
            return st._replace(t=st.t + delta)
        return body

    def search_weights():
        def body(i, st):
            tm = transform_points(moving, st.q, st.t, st.s)
            mv, mf, nd, mask, mn, _ = _find_correspondences(tm, index, params,
                                                         config)
            pv = jnp.logical_and(jnp.sum(jnp.abs(mv[..., :3]), -1) > 0,
                                 jnp.sum(jnp.abs(mf[..., :3]), -1) > 0)
            mask2 = jnp.logical_and(mask, pv)
            w = jnp.where(mask2, compute_weights(nd), 0.0)
            sw = masked_weight_sum(w)
            return st._replace(t=st.t + jnp.stack([sw, sw, sw]) * 1e-20)
        return body

    def search_moments():
        def body(i, st):
            tm = transform_points(moving, st.q, st.t, st.s)
            mv, mf, nd, mask, mn, _ = _find_correspondences(tm, index, params,
                                                         config)
            pv = jnp.logical_and(jnp.sum(jnp.abs(mv[..., :3]), -1) > 0,
                                 jnp.sum(jnp.abs(mf[..., :3]), -1) > 0)
            mask2 = jnp.logical_and(mask, pv)
            w = jnp.where(mask2, compute_weights(nd), 0.0)
            sw = masked_weight_sum(w)
            meanf, meanm = centroids(mf, mv, w, sw, mask2)
            S11 = s_matrix(deviations(mv, meanm), deviations(mf, meanf),
                           params.c, w, mask2)
            return st._replace(t=st.t + S11[:3] * 1e-20)
        return body

    def full():
        def body(i, st):
            return icp_step(st, moving, index, params, config)
        return body

    timed("S search only (transform+find)", search_only, identity_state())
    timed("S +weights", search_weights, identity_state())
    timed("S +moments (centroids+S11)", search_moments, identity_state())
    timed("S full step (+solve+accumulate)", full, identity_state())


if __name__ == "__main__":
    main()
