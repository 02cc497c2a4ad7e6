"""Hardware A/B: "rowcat" vs "sublane" GN moment layouts (round 3).

The GICP kernel's VMEM ceiling is the "sublane" layout's three SEQUENTIAL
row accumulations — Mosaic's stack allocator keeps each row's intermediates
live across the accumulate chain, so gicp needs ~2.5x plane's stack and is
forced down to bin_batch=8 (VERDICT r2 item 5). "rowcat" concatenates the
three GN rows along the query axis and reduces them with ONE dot_general;
this probe measures (a) which bin batches compile per layout, (b) parity
vs the XLA twin, (c) wall-clock per call at the flagship shape.

Run on the real chip (no env override), AFTER any bench has finished —
concurrent processes contend for the single tunneled chip grant.
"""
from __future__ import annotations

import sys
import time

import numpy as np
import jax

from icp_tpu.kernels.fused_gn import (
    bin_gn_moments_pallas,
    bin_gn_moments_ref,
)
from benchmarks.repro_gn import make_inputs


def main():
    mg, nm, qvalid, reps, vals, sq_b, G, b_row = make_inputs()
    n_r, cq, _ = mg.shape
    cb = vals.shape[1]
    for mode in ("gicp", "plane", "plane_sym"):
        nm_in = None if mode == "plane" else nm
        ref = np.asarray(jax.block_until_ready(bin_gn_moments_ref(
            mg, nm_in, qvalid, reps, vals, sq_b, G, b_row, 200.0,
            mode=mode, weighted=True)))
        scale = max(1.0, np.abs(ref).max())
        for layout in ("rowcat", "sublane"):
            for bb in (8, 16, 32):
                try:
                    run = lambda: jax.block_until_ready(bin_gn_moments_pallas(
                        mg, nm_in, qvalid, reps, vals, sq_b, G, b_row, 200.0,
                        mode=mode, weighted=True, v_layout=layout,
                        bin_batch=bb))
                    out = np.asarray(run())
                    err = np.abs(out - ref).max() / scale
                    best = float("inf")
                    for _ in range(20):
                        t0 = time.perf_counter()
                        run()
                        best = min(best, time.perf_counter() - t0)
                    print(f"{mode:10s} {layout:8s} bb={bb:2d} OK  "
                          f"rel_err={err:.2e}  {best*1e3:.3f} ms/call",
                          flush=True)
                except Exception as e:  # noqa: BLE001
                    msg = str(e).split("\n")[0][:120]
                    print(f"{mode:10s} {layout:8s} bb={bb:2d} FAIL {msg}",
                          flush=True)


if __name__ == "__main__":
    sys.exit(main())
