"""Naive numpy golden references for the per-op tests.

Mirrors the role of the reference's CPU goldens
(include/ICP/tests/helper_funcs.hpp — cpuICPLMs, cpuICPReps, cpuICPWeights,
cpuICPMean[Weighted], cpuICPDevs, cpuICPS[w], cpuICPTransformQ,
cpuICPPowerMethod): independent serial implementations of the documented
semantics, written against the kernel contracts, not against our JAX code.
"""

from __future__ import annotations

import numpy as np


def golden_get_landmarks(cloud: np.ndarray) -> np.ndarray:
    """cloud (480, 640, 8) -> (16384, 8); ref kernels/icp_kernels.cl:62-76."""
    out = np.zeros((128, 128, 8), cloud.dtype)
    for r in range(128):
        for l in range(128):
            out[r, l] = cloud[48 + 3 * r + 1, 64 + 4 * l + 1]
    return out.reshape(-1, 8)


def golden_get_reps(lms: np.ndarray, n_ry: int, n_rx: int) -> np.ndarray:
    """lms (16384, 8) -> (n_r, 8); ref kernels/icp_kernels.cl:96-114."""
    grid = lms.reshape(128, 128, 8)
    sx, sy = 128 // n_rx, 128 // n_ry
    out = np.zeros((n_ry, n_rx, 8), lms.dtype)
    for ry in range(n_ry):
        for rx in range(n_rx):
            out[ry, rx] = grid[ry * sy + sy // 2 - 1, rx * sx + sx // 2 - 1]
    return out.reshape(-1, 8)


def golden_weights(dists: np.ndarray):
    """w = 100/(100+d), sum in f64; ref kernels/icp_kernels.cl:138-180."""
    w = 100.0 / (100.0 + dists.astype(np.float64))
    return w.astype(np.float32), w.sum()


def golden_means(F: np.ndarray, M: np.ndarray):
    """xyz means; ref kernels/icp_kernels.cl:370-411."""
    return F[:, :3].mean(0), M[:, :3].mean(0)


def golden_means_weighted(F, M, W, sum_w):
    wn = (W / sum_w)[:, None]
    return (F[:, :3] * wn).sum(0), (M[:, :3] * wn).sum(0)


def golden_s_matrix(dev_m, dev_f, c, W=None):
    """11-vector in icpSijProducts order; ref kernels/icp_kernels.cl:632-743."""
    cm = dev_m * c
    cf = dev_f * c
    w = np.ones(len(cm)) if W is None else W
    S = np.zeros(11)
    for i in range(3):
        for j in range(3):
            S[3 * i + j] = np.sum(w * cm[:, i] * cf[:, j])
    S[9] = np.sum(w * np.sum(cf * cf, 1))
    S[10] = np.sum(w * np.sum(cm * cm, 1))
    return S


def golden_transform_q(points8, q, t, s):
    """p' = s(p + 2v x (v x p + w p)) + t; ref kernels/icp_kernels.cl:771-802."""
    v, w = q[:3], q[3]
    out = points8.copy()
    for i in range(len(points8)):
        p = points8[i, :3]
        out[i, :3] = s * (p + np.cross(2 * v, np.cross(v, p) + w * p)) + t
    return out


def golden_blended_d2(a, b, alpha):
    """8-D blended squared distance between two points."""
    dg = a[:3] - b[:3]
    dp = a[4:7] - b[4:7]
    return float(dg @ dg + alpha * (dp @ dp))


def golden_rbc_nn(queries, db, reps, alpha):
    """Per-query RBC semantics: nearest rep, then exhaustive search in that
    rep's bin (bin = db points whose nearest rep is that rep)."""
    n, m, n_r = len(db), len(queries), len(reps)
    rep_of = np.array([
        np.argmin([golden_blended_d2(db[i], reps[r], alpha) for r in range(n_r)])
        for i in range(n)
    ])
    nn_id = np.zeros(m, np.int64)
    nn_d2 = np.zeros(m)
    for qi in range(m):
        r = np.argmin([golden_blended_d2(queries[qi], reps[j], alpha)
                       for j in range(n_r)])
        members = np.where(rep_of == r)[0]
        if len(members) == 0:
            nn_id[qi], nn_d2[qi] = -1, np.inf
            continue
        ds = [golden_blended_d2(queries[qi], db[i], alpha) for i in members]
        k = int(np.argmin(ds))
        nn_id[qi], nn_d2[qi] = members[k], ds[k]
    return nn_id, nn_d2


# Cross-implementation golden triplet embedded in the reference test
# (tests/testsICP.cpp:1008-1046): a real S matrix + means captured from
# Kinect data, and the SVD solution for the resulting incremental transform.
REF_S11 = np.array([
    0.00168053, 0.000131408, -0.000775179,
    0.000156595, 0.00102674, -0.000563479,
    -0.000722137, -0.000559463, 0.00246661,
    0.00521271, 0.00515292,
], np.float32)
REF_MEANS = np.array([
    [-33.9694, -17.6421, 1494.22],
    [-44.8322, -19.3835, 1485.93],
], np.float32)
REF_SVD_TK = np.array([
    0.00111412, 0.00730956, -0.00647493, 0.999952,
    -10.4598, 4.74009, -0.762817, 1.00578,
], np.float32)
