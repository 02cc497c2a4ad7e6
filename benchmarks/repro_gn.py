"""Minimal repro of the round-2 Mosaic lane-layout compile failure.

Runs bin_gn_moments_pallas at the exact production shape that failed in
BENCH_r02 (plane, n_r=256, cq=96, cb=128, bin_batch=16) and compares the
lane vs sublane layouts against the XLA twin on the real chip.
"""
from __future__ import annotations

import sys

import numpy as np
import jax
import jax.numpy as jnp

from icp_tpu.kernels.fused_gn import (
    bin_gn_moments_pallas,
    bin_gn_moments_ref,
    _auto_bin_batch_gn,
)


def make_inputs(n_r=256, cq=96, cb=128, seed=0):
    rng = np.random.default_rng(seed)
    mg = rng.normal(0, 100, (n_r, cq, 8)).astype(np.float32)
    mg[..., 3] = 1.0
    mg[..., 7] = 1.0
    nm = rng.normal(0, 1, (n_r, cq, 3)).astype(np.float32)
    nm /= np.linalg.norm(nm, axis=-1, keepdims=True)
    qvalid = (rng.uniform(size=(n_r, cq)) < 0.8).astype(np.float32)
    reps = rng.normal(0, 500, (n_r, 8)).astype(np.float32)
    reps[:, 3] = 1.0
    reps[:, 7] = 1.0
    vals = rng.normal(0, 100, (n_r, cb, 12)).astype(np.float32)
    nf = rng.normal(0, 1, (n_r, cb, 3)).astype(np.float32)
    nf /= np.linalg.norm(nf, axis=-1, keepdims=True)
    vals[..., 8:11] = nf
    vals[..., 11] = 0.0
    sq_b = np.sum(vals[..., :8] ** 2 * np.array(
        [1, 1, 1, 0, 200, 200, 200, 0], np.float32), axis=-1)
    sq_b[:, cb // 2:] = np.inf  # half the slots invalid
    G = np.eye(8, dtype=np.float32)
    b_row = np.zeros((1, 8), np.float32)
    return (jnp.asarray(mg), jnp.asarray(nm), jnp.asarray(qvalid),
            jnp.asarray(reps), jnp.asarray(vals), jnp.asarray(sq_b),
            jnp.asarray(G), jnp.asarray(b_row))


def main():
    mg, nm, qvalid, reps, vals, sq_b, G, b_row = make_inputs()
    n_r, cq, _ = mg.shape
    cb = vals.shape[1]
    for mode in ("plane", "plane_sym", "gicp"):
        nm_in = None if mode == "plane" else nm
        bb = _auto_bin_batch_gn(n_r, cq, cb, mode)
        ref = bin_gn_moments_ref(mg, nm_in, qvalid, reps, vals, sq_b, G,
                                 b_row, 200.0, mode=mode, weighted=True)
        if isinstance(ref, tuple):  # gicp: (P, P_z) since round 3
            ref = ref[0] + ref[1]
        ref = np.asarray(jax.block_until_ready(ref))
        for layout in ("lane", "sublane"):
            try:
                out = bin_gn_moments_pallas(
                    mg, nm_in, qvalid, reps, vals, sq_b, G, b_row, 200.0,
                    mode=mode, weighted=True, v_layout=layout)
                if isinstance(out, tuple):
                    out = out[0] + out[1]
                out = np.asarray(jax.block_until_ready(out))
                scale = max(1.0, np.abs(ref).max())
                err = np.abs(out - ref).max() / scale
                print(f"{mode:10s} bb={bb:2d} {layout:8s} OK  rel_err={err:.2e}",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                msg = str(e).split("\n")[0][:140]
                print(f"{mode:10s} bb={bb:2d} {layout:8s} FAIL {msg}",
                      flush=True)


if __name__ == "__main__":
    sys.exit(main())
