"""Bin-search kernel variant sweep (honest timing: host read + marginal
differencing, loop-varying inputs)."""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_HI, N_LO = 200, 40


def timed(label, body_builder, carry0, reps=3):
    @partial(jax.jit, static_argnames=("n",))
    def run(c, n):
        return jax.lax.fori_loop(0, n, body_builder(), c)

    def t_of(n):
        def once():
            out = run(carry0, n)
            first = jax.tree_util.tree_leaves(out)[0]
            float(np.asarray(first).ravel()[0])
        once()
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            once()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    per_op = (t_of(N_HI) - t_of(N_LO)) / (N_HI - N_LO)
    print(f"{label:56s} {per_op*1e3:8.4f} ms/op")


def _kernel_vpu(qg_w_ref, bins_c_ref, sq_b_ref, vals_ref,
                score_ref, matched_ref):
    """Scores via 8 unrolled VPU broadcast-FMAs instead of a K=8 MXU
    matmul (K=8 uses 8/128 of the systolic array; HIGHEST f32 multiplies
    the passes)."""
    qg_w = qg_w_ref[:]
    bins_c = bins_c_ref[:]
    acc = sq_b_ref[:][:, None, :]  # (BB, 1, cb) broadcasts over cq
    cross = None
    for d in range(qg_w.shape[-1]):
        term = qg_w[:, :, None, d] * bins_c[:, None, :, d]
        cross = term if cross is None else cross + term
    scores = acc - 2.0 * cross
    best_slot = jnp.argmin(scores, axis=-1)
    score_ref[:] = jnp.min(scores, axis=-1)
    cb = bins_c.shape[1]
    slot_ids = jax.lax.broadcasted_iota(jnp.int32, best_slot.shape + (cb,), 2)
    one_hot = (slot_ids == best_slot[..., None]).astype(jnp.float32)
    matched_ref[:] = jax.lax.dot_general(
        one_hot, vals_ref[:],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


@partial(jax.jit, static_argnames=("bin_batch",))
def bin_search_vpu(qg_w, bins_c, sq_b_masked, vals, *, bin_batch=32):
    n_r, cq, d = qg_w.shape
    cb = bins_c.shape[1]
    v = vals.shape[2]
    grid = (n_r // bin_batch,)
    idx = lambda i: (i, 0, 0)
    idx2 = lambda i: (i, 0)
    return pl.pallas_call(
        _kernel_vpu,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bin_batch, cq, d), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((bin_batch, cb, d), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((bin_batch, cb), idx2, memory_space=pltpu.VMEM),
            pl.BlockSpec((bin_batch, cb, v), idx, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bin_batch, cq), idx2, memory_space=pltpu.VMEM),
            pl.BlockSpec((bin_batch, cq, v), idx, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_r, cq), jnp.float32),
            jax.ShapeDtypeStruct((n_r, cq, v), jnp.float32),
        ],
    )(qg_w, bins_c, sq_b_masked, vals)


def main():
    from icp_tpu.kernels.bin_search import bin_search_pallas

    n_r, cq, cb, d = 256, 128, 128, 8
    rng = np.random.default_rng(0)
    qg0 = jnp.asarray(rng.normal(size=(n_r, cq, d)).astype(np.float32))
    bins_c = jnp.asarray(rng.normal(size=(n_r, cb, d)).astype(np.float32))
    sq_b = jnp.asarray(rng.normal(size=(n_r, cb)).astype(np.float32) ** 2)
    vals = bins_c  # V = 8

    def touch(qg, x):
        return qg + (x * 1e-20).astype(qg.dtype)

    def v_mxu(bb):
        def build():
            def body(i, qg):
                s, m = bin_search_pallas(qg, bins_c, sq_b, vals,
                                         bin_batch=bb)
                return touch(qg, s[0, 0] + m[0, 0, 0])
            return body
        return build

    def v_vpu(bb):
        def build():
            def body(i, qg):
                s, m = bin_search_vpu(qg, bins_c, sq_b, vals, bin_batch=bb)
                return touch(qg, s[0, 0] + m[0, 0, 0])
            return build_body(body)
        def build_body(b):
            return b
        return build

    for bb in (32, 64, 128):  # 256 OOMs the 16M VMEM scoped limit
        timed(f"MXU kernel bin_batch={bb}", v_mxu(bb), qg0)
    for bb in (32, 128):
        timed(f"VPU-unrolled kernel bin_batch={bb}", v_vpu(bb), qg0)

    # Parity check of the VPU variant (CPU interpret not needed — compare
    # on-device against the MXU kernel).
    s1, m1 = bin_search_pallas(qg0, bins_c, sq_b, vals, bin_batch=32)
    s2, m2 = bin_search_vpu(qg0, bins_c, sq_b, vals, bin_batch=32)
    print("score max diff:", float(jnp.max(jnp.abs(s1 - s2))))
    print("matched max diff:", float(jnp.max(jnp.abs(m1 - m2))))


if __name__ == "__main__":
    main()
