"""Hardware compile + parity sweep of every supported Pallas-kernel shape —
THE PRE-SNAPSHOT RITUAL (run after any kernel / block-policy / capacity
change; interpret-mode CPU tests cannot catch Mosaic lowering legality).

Iterates ``icp_tpu.runtime.support_matrix.kernel_rows()`` — every kernel x
variant x auto-selected block shape reachable from supported configs — and
for each row compiles BOTH the Pallas path and its XLA twin on the real
chip and asserts they agree. Results are written to
``benchmarks/hw_compile_table.json``; ``tests/test_kernel_blocks.py``
asserts (on CPU, every run) that production auto-selection only lands on
rows recorded ``ok`` there, closing the loop that round 2 left open (a
default config reached a never-compiled kernel shape; BENCH_r02 rc=1).

Also drives three end-to-end registrations (POINT / PLANE / GICP, fused vs
unfused) on a rendered pair with known ground truth.

Usage: python benchmarks/smoke_fused_hw.py [shape_class ...]
       (default: all classes; see support_matrix.shape_classes)
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

import numpy as np

TOL = 2e-4


def _rel_err(a, b) -> float:
    import jax

    errs = []
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        x = np.asarray(x, np.float64)
        y = np.asarray(y, np.float64)
        errs.append(np.abs(x - y).max() / max(1.0, np.abs(y).max()))
    return float(max(errs))


def _load_table(path: str) -> dict:
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {}


def main() -> None:
    import jax
    import jax.numpy as jnp

    from icp_tpu import ICPConfig, ICPParams, Objective, register
    from icp_tpu.icp.quaternion import qangle_deg, qconj, qmul
    from icp_tpu.icp.run import build_index
    from icp_tpu.icp.state import identity_state
    from icp_tpu.ops.normals import normals_for
    from icp_tpu.ops.sampling import get_landmarks
    from icp_tpu.rbc.grouping import group_rows_by_bin
    from icp_tpu.rbc.search import (
        rbc_gn_system,
        rbc_point_assign,
        rbc_point_moments,
        rbc_search_grouped,
    )
    from icp_tpu.runtime import support_matrix
    from icp_tpu.sensors import synthetic
    from icp_tpu.slam import se3
    from __graft_entry__ import _synthetic_pair

    print("backend:", jax.default_backend())
    assert jax.default_backend() != "cpu", \
        "the hardware sweep must run on the real chip (unset JAX_PLATFORMS)"

    classes = support_matrix.shape_classes()
    wanted = set(sys.argv[1:]) or set(classes)
    unknown = wanted - set(classes) - {"e2e"}
    assert not unknown, f"unknown shape classes: {unknown}"

    table_path = os.path.join(os.path.dirname(__file__),
                              "hw_compile_table.json")
    table = _load_table(table_path)
    params = ICPParams(alpha=2e2).as_f32()
    failures = []

    def record(key, fn, tol=TOL):
        try:
            err = fn()
            ok = err <= tol
            table[key] = {"ok": bool(ok), "rel_err": round(err, 9)}
            tag = "ok  " if ok else "MISM"
            print(f"{tag} {key} rel_err={err:.2e}", flush=True)
        except Exception as e:  # noqa: BLE001 - recorded per row
            msg = " ".join(str(e).split())[:240]
            table[key] = {"ok": False, "error": msg}
            print(f"FAIL {key} {msg[:120]}", flush=True)
        if not table[key]["ok"]:
            failures.append(key)

    for name in [c for c in classes if c in wanted]:
        cfg_pt = classes[name]
        cfg_gn = dataclasses.replace(cfg_pt, objective=Objective.PLANE,
                                     estimate_scale=False)
        fixed_np, moving_np = _synthetic_pair(cfg_pt.m)
        fixed = jnp.asarray(fixed_np)
        moving = jnp.asarray(moving_np)
        st = identity_state(fixed.dtype)
        index_pt = jax.block_until_ready(
            jax.jit(build_index, static_argnames=("config",))(
                fixed, params, cfg_pt))
        index_gn = jax.block_until_ready(
            jax.jit(build_index, static_argnames=("config",))(
                fixed, params, cfg_gn))
        mn = normals_for(moving, cfg_gn.normal_mode)
        mn_rot = mn  # identity accumulated rotation
        n_r = cfg_pt.n_r
        cq = cfg_pt.query_capacity

        def assign(use_pallas):
            f = jax.jit(lambda mv: rbc_point_assign(
                index_pt, mv, st.q, st.t, st.s, params.alpha,
                use_pallas=use_pallas)[0])
            return np.asarray(jax.block_until_ready(f(moving)))

        def point(weighted, robust, use_pallas):
            f = jax.jit(lambda mv: rbc_point_moments(
                index_pt, mv, st.q, st.t, st.s, params.alpha, params.c, cq,
                weighted=weighted, use_pallas=use_pallas, robust=robust,
                robust_delta=params.robust_delta))
            return jax.block_until_ready(f(moving))

        def gn(mode, weighted, robust, use_pallas):
            f = jax.jit(lambda mv, nr: rbc_gn_system(
                index_gn, mv, st.q, st.t, st.s, params.alpha, cq, mode=mode,
                weighted=weighted, use_pallas=use_pallas, robust=robust,
                robust_delta=params.robust_delta,
                gicp_eps=params.gicp_epsilon,
                mnormals_rot=None if mode == "plane" else nr))
            return jax.block_until_ready(f(moving, mn_rot))

        def mindist(use_pallas):
            # Argmin tie flips in the rep assignment can re-bin a few
            # queries between the two paths, moving individual d2 slots —
            # so compare the quantities production consumes: the
            # median-derived adaptive scale, the finite-slot count, and
            # the (order-free) sorted d2 tail.
            from icp_tpu.ops.moments import adaptive_robust_delta
            from icp_tpu.rbc.grouping import group_rows_by_bin
            from icp_tpu.rbc.search import rbc_min_dists_grouped

            def f(mv):
                rid, G, b_row = rbc_point_assign(
                    index_pt, mv, st.q, st.t, st.s, params.alpha,
                    use_pallas=use_pallas)
                gl = group_rows_by_bin(rid, n_r, cq, (mv,))
                d2 = rbc_min_dists_grouped(
                    index_pt, gl.grouped[0], gl.valid.astype(mv.dtype),
                    G, b_row, params.alpha, use_pallas=use_pallas)
                delta = adaptive_robust_delta(
                    d2.reshape(-1), jnp.isfinite(d2).reshape(-1), "tukey")
                return d2, delta
            d, delta = jax.block_until_ready(jax.jit(f)(moving))
            d = np.asarray(d)
            fin = np.isfinite(d)
            dsort = np.sort(np.where(fin, d, 0.0).reshape(-1))
            return (float(delta), float(fin.sum()),
                    dsort[:: max(1, dsort.size // 256)])

        def search(with_normals, use_pallas):
            f = jax.jit(lambda mv: rbc_search_grouped(
                index_gn if with_normals else index_pt, mv, params.alpha,
                cq, use_pallas=use_pallas, with_normals=with_normals))
            r = jax.block_until_ready(f(moving))
            valid = np.asarray(r.valid)[..., None]
            return (np.asarray(r.matched_g) * valid,
                    np.asarray(r.dist_g) * valid[..., 0],
                    np.asarray(r.matched_normals) * valid)

        def brute(use_pallas):
            if use_pallas:
                from icp_tpu.kernels.brute_nn import (
                    nearest_neighbor_brute_pallas as nn,
                )
            else:
                from icp_tpu.ops.distance import nearest_neighbor_brute as nn
            f = jax.jit(lambda mv: nn(mv, fixed, params.alpha))
            idx, d = jax.block_until_ready(f(moving))
            return np.asarray(idx), np.asarray(d)

        for row in support_matrix.kernel_rows():
            if row.shape_class != name:
                continue
            # Assignment rows compare ids: argmin TIE flips between the two
            # lowerings are expected at ~1e-4 rates (near-equidistant
            # candidates; the winning SCOREs agree) — the tie-tolerant
            # threshold is on the flip fraction, not TOL.
            tol = 1e-3 if row.kind in ("repassign", "brute") else TOL
            if row.kind == "repassign":
                def run_row(row=row):
                    a, b = assign(True), assign(False)
                    return float(np.mean(a != b))
            elif row.kind == "repassignc":
                def run_row(row=row):
                    from icp_tpu.rbc.search import rbc_point_assign_counts

                    def f(use_pallas):
                        g = jax.jit(lambda mv: rbc_point_assign_counts(
                            index_pt, mv, st.q, st.t, st.s, params.alpha,
                            use_pallas=use_pallas)[:2])
                        rid, counts = jax.block_until_ready(g(moving))
                        return np.asarray(rid), np.asarray(counts)
                    (ra, ca), (rb, cb2) = f(True), f(False)
                    # rid parity is tie-tolerant (argmin flips), but each
                    # path's counts must match ITS OWN rid exactly — the
                    # kernel's accumulation contract.
                    self_a = float(np.any(
                        np.bincount(ra, minlength=n_r) != ca))
                    self_b = float(np.any(
                        np.bincount(rb, minlength=n_r) != cb2))
                    return max(float(np.mean(ra != rb)), self_a, self_b)
            elif row.kind == "point":
                def run_row(row=row):
                    return _rel_err(point(row.weighted, row.robust, True),
                                    point(row.weighted, row.robust, False))
            elif row.kind == "gn":
                def run_row(row=row):
                    return _rel_err(gn(row.mode, row.weighted, row.robust,
                                       True),
                                    gn(row.mode, row.weighted, row.robust,
                                       False))
            elif row.kind == "mindist":
                def run_row(row=row):
                    return _rel_err(mindist(True), mindist(False))
            elif row.kind == "table":
                def run_row(row=row):
                    # Bit-exact contract: the kernel is a permutation copy.
                    d = 11 if row.with_normals else 8
                    rows8 = (moving if d == 8 else
                             jnp.concatenate([moving, mn_rot], axis=1))

                    def grp(use_pallas):
                        def f(mv):
                            rid, _, _ = rbc_point_assign(
                                index_pt, moving, st.q, st.t, st.s,
                                params.alpha, use_pallas=False)
                            g = group_rows_by_bin(rid, n_r, cq, (mv,),
                                                  use_pallas=use_pallas)
                            return (g.grouped[0]
                                    * g.valid[..., None].astype(mv.dtype))
                        return np.asarray(
                            jax.block_until_ready(jax.jit(f)(rows8)))
                    a, b = grp(True), grp(False)
                    return 0.0 if np.array_equal(a, b) else 1.0
            elif row.kind == "binsearch":
                def run_row(row=row):
                    return _rel_err(search(row.with_normals, True),
                                    search(row.with_normals, False))
            else:
                assert row.kind == "brute", row.kind
                def run_row(row=row):
                    (ia, da), (ib, db) = brute(True), brute(False)
                    return max(float(np.mean(ia != ib)), _rel_err(da, db))
            record(row.key, run_row, tol=tol)

    # --- End-to-end: fused vs unfused registration, rendered pair with
    # ground truth (POINT floor ~3 mm on the landmark lattice; PLANE/GICP
    # sub-mm — bench.py gates the absolute bounds, this checks agreement
    # and that every production composition compiles on-chip).
    if not sys.argv[1:] or "e2e" in wanted or wanted == set(classes):
        scene = synthetic.default_scene()
        q_gt = np.array([0, np.sin(0.004), 0, np.cos(0.004)], np.float32)
        t_gt = np.array([10.0, -6.0, 8.0], np.float32)
        pose_b = synthetic.CameraPose(jnp.asarray(q_gt), jnp.asarray(t_gt))
        la = get_landmarks(synthetic.render_cloud(
            scene, synthetic.CameraPose.identity()).reshape(-1, 8))
        lb = get_landmarks(synthetic.render_cloud(
            scene, pose_b).reshape(-1, 8))
        rel = se3.relative(synthetic.CameraPose.identity(), pose_b)

        def e2e(obj, fused_field, bound_mm, key=None, **extra_cfg):
            def run_row():
                errs = {}
                for fused in (True, False):
                    cfg = dataclasses.replace(
                        ICPConfig(estimate_scale=False, objective=obj,
                                  **extra_cfg),
                        **{fused_field: fused})
                    s = jax.block_until_ready(register(la, lb, params, cfg))
                    t_err = float(jnp.linalg.norm(s.t - rel.t))
                    a_err = float(qangle_deg(qmul(s.q, qconj(rel.q))))
                    assert t_err < bound_mm and a_err < 0.5, \
                        (obj, fused, t_err, a_err)
                    errs[fused] = (t_err, a_err)
                return abs(errs[True][0] - errs[False][0]) / 100.0
            record(key or f"e2e-{obj.value}", run_row)

        e2e(Objective.POINT, "fused_point", 5.0)
        e2e(Objective.PLANE, "fused_gn", 1.0)
        e2e(Objective.PLANE, "fused_gn", 1.0, key="e2e-plane_sym",
            plane_symmetric=True)
        e2e(Objective.GICP, "fused_gn", 1.0)

    with open(table_path, "w") as f:
        json.dump(dict(sorted(table.items())), f, indent=1)
    print(f"wrote {table_path}: {len(table)} rows, "
          f"{sum(1 for v in table.values() if v['ok'])} ok")
    if failures:
        print("FAILURES:", *failures, sep="\n  ")
        sys.exit(1)
    print("smoke ok")


if __name__ == "__main__":
    main()
