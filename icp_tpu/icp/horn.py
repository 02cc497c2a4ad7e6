"""Horn absolute-orientation solvers: rotation from the cross-covariance S.

Two jit-compatible, fully on-device modes mirroring the reference's variants:

* :func:`solve_rotation_power` — quaternion power method on Horn's 4x4 N
  matrix, re-designed from the single-work-item ``icpPowerMethod`` OpenCL
  task (reference kernels/icp_kernels.cl:976-1054) as a bounded
  ``lax.while_loop``.
* :func:`solve_rotation_svd` — SVD solve R = V * diag(1, 1, det) * U^T,
  mirroring the reference's host-side Eigen JacobiSVD path (reference
  src/ICP/algorithms.cpp:3474-3487) but running on-device so the ICP loop
  never leaves the chip.

S layout (the 11-vector produced by :mod:`icp_tpu.ops.moments`, matching the
``icpSijProducts`` output order, reference kernels/icp_kernels.cl:660-670)::

    S11 = [Sxx, Sxy, Sxz, Syx, Syy, Syz, Szx, Szy, Szz, sum|f'|^2, sum|m'|^2]

with ``S[3i+j] = sum_k m_dev[k,i] * f_dev[k,j]`` and the symmetric-scale
constituents last; ``s_k = sqrt(S[9]/S[10])`` (reference cpp:3471).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from icp_tpu.icp.quaternion import matrix_to_quat, qnormalize, qrotate

_POWER_MAX_ITER = 1000  # reference kernels/icp_kernels.cl:1007


def build_N(S9: jnp.ndarray) -> jnp.ndarray:
    """Horn's 4x4 N matrix in [x, y, z, w] quaternion basis.

    Layout matches reference kernels/icp_kernels.cl:993-999.

    Args:
      S9: (9,) flattened cross-covariance, S9[3i+j] = sum m_i f_j.
    Returns:
      (4, 4) symmetric matrix whose dominant (most positive eigenvalue)
      eigenvector is the optimal rotation quaternion.
    """
    Sxx, Sxy, Sxz, Syx, Syy, Syz, Szx, Szy, Szz = [S9[i] for i in range(9)]
    return jnp.array(
        [
            [Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz, Syz - Szy],
            [Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy, Szx - Sxz],
            [Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz, Sxy - Syx],
            [Syz - Szy, Szx - Sxz, Sxy - Syx, Sxx + Syy + Szz],
        ],
        dtype=S9.dtype,
    )


_POWER_CHUNK = 8  # matvecs unrolled per while_loop trip


def _power_iterate(N: jnp.ndarray, max_iter: int = _POWER_MAX_ITER) -> jnp.ndarray:
    """Power iteration from x0 = ones(4) until the step-size plateaus.

    The reference stops when two consecutive iterate distances are exactly
    equal (a float-equality fixed-point test, kernels/icp_kernels.cl:1019).
    Kept, but at CHUNK granularity: on TPU each ``lax.while_loop`` trip costs
    ~5 us of loop overhead, so 8 matvecs are unrolled per trip (pure VPU work
    on a 4-vector) and the plateau test runs per chunk. Bounded regardless
    (SURVEY.md §7 risk (e)).
    """
    x0 = jnp.ones((4,), dtype=N.dtype)
    max_outer = max(max_iter // _POWER_CHUNK, 1)

    def cond(carry):
        i, _x, _err, converged = carry
        return jnp.logical_and(i < max_outer, jnp.logical_not(converged))

    def body(carry):
        i, x, err_prev, _ = carry
        x_new = x
        for _ in range(_POWER_CHUNK):
            x_new = qnormalize(jnp.dot(N, x_new, precision=jax.lax.Precision.HIGHEST))
        err = jnp.linalg.norm(x - x_new)
        converged = jnp.logical_or(err == err_prev, err == 0.0)
        return (i + 1, x_new, err, converged)

    _, x, _, _ = jax.lax.while_loop(cond, body, (0, x0, jnp.float32(jnp.inf), False))
    return x


def solve_rotation_power(S9: jnp.ndarray) -> jnp.ndarray:
    """Dominant-most-positive-eigenvector quaternion via the power method.

    Mirrors the negative-eigenvalue handling of the reference kernel
    (kernels/icp_kernels.cl:1024-1037): if the dominant eigenvalue mu of N is
    negative, rerun on N' = N - mu*I (all eigenvalues shifted >= 0; the
    eigenvector of the most positive eigenvalue is unchanged).

    Returns:
      (4,) unit quaternion [x, y, z, w].
    """
    N = build_N(S9)
    x = _power_iterate(N)
    # Rayleigh quotient (x is unit) — more robust than the reference's
    # N[0].x / x.x component ratio, identical for exact eigenvectors.
    lam = x @ (N @ x)

    def rerun(_):
        N2 = N - lam * jnp.eye(4, dtype=N.dtype)
        return N2, _power_iterate(N2)

    def keep(_):
        return N, x

    N_final, x = jax.lax.cond(lam < 0, rerun, keep, None)
    # One final un-normalized multiply then exact normalize, as in the
    # reference epilogue (kernels/icp_kernels.cl:1039-1041).
    q = qnormalize(N_final @ x)
    # Canonical sign (w >= 0): q and -q are the same rotation, but the
    # convergence metric 2*atan2(|v|, w) is not sign-invariant.
    return q * jnp.where(q[3] < 0, -1.0, 1.0)


def solve_rotation_svd(S9: jnp.ndarray) -> jnp.ndarray:
    """Rotation via SVD of the 3x3 cross-covariance, with reflection fix.

    R = V * diag(1, 1, det(V U^T)) * U^T  (reference cpp:3477-3487).

    Returns:
      (4,) unit quaternion [x, y, z, w].
    """
    S = S9.reshape(3, 3)
    U, _, Vt = jnp.linalg.svd(S)
    V = Vt.T
    R0 = V @ U.T
    d = jnp.linalg.det(R0)
    B = jnp.diag(jnp.array([1.0, 1.0, 1.0], dtype=S.dtype).at[2].set(d))
    R = V @ B @ U.T
    return matrix_to_quat(R)


def solve_step_transform(S11: jnp.ndarray, mean_f: jnp.ndarray,
                         mean_m: jnp.ndarray, *, use_power: bool,
                         estimate_scale: bool = True):
    """Incremental transform (q_k, t_k, s_k) for one ICP iteration.

    s_k = sqrt(S[9] / S[10]) — Horn's symmetric scale, the ratio of the
    (c-scaled) deviation energies (reference cpp:3471; the c scaling cancels).
    t_k = mean_f - s_k * R(q_k) * mean_m  (reference cpp:3489 / cl:1050).

    Args:
      S11: (11,) S-matrix vector (see module docstring).
      mean_f: (3,) fixed-set centroid.
      mean_m: (3,) moving-set centroid.
      use_power: static flag selecting the power-method or SVD solver.
      estimate_scale: solve for s_k (reference behavior); False pins
        s_k = 1 (rigid mode — see ICPConfig.estimate_scale).
    Returns:
      (qk (4,), tk (3,), sk scalar).
    """
    if estimate_scale:
        sk = jnp.sqrt(S11[9] / S11[10])
    else:
        sk = jnp.ones((), S11.dtype)
    if use_power:
        qk = solve_rotation_power(S11[:9])
    else:
        qk = solve_rotation_svd(S11[:9])
    tk = mean_f - sk * qrotate(qk, mean_m)
    return qk, tk, sk
