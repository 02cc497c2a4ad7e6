"""Frame-to-frame RGB-D odometry chain.

The reference registers exactly one pair per run (ICPReg). This module
chains registrations over a frame sequence — BASELINE.json config 3
("frame-to-frame RGB-D odometry chain") — accumulating world poses and
selecting keyframes for the pose-graph backend.

Each frame's cloud is in its own camera frame; ICP(frame_{i} -> frame_{i+1})
estimates the relative pose prev_from_cur, and world poses accumulate as
world_from_cur = world_from_prev * prev_from_cur.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from icp_tpu.icp.quaternion import qangle_deg
from icp_tpu.icp.run import register
from icp_tpu.icp.state import ICPState
from icp_tpu.ops.sampling import get_landmarks
from icp_tpu.runtime.config import ICPConfig, ICPParams
from icp_tpu.slam.se3 import Pose, compose


@dataclass
class OdometryResult:
    """Trajectory estimate over a frame sequence.

    poses: world_from_camera pose per frame (frame 0 = identity).
    keyframes: indices of selected keyframes.
    relative: per-step ICP states (relative transform + iteration count).
    """

    poses: list[Pose] = field(default_factory=list)
    keyframes: list[int] = field(default_factory=list)
    relative: list[ICPState] = field(default_factory=list)


@dataclass(frozen=True)
class KeyframePolicy:
    """Keyframe selection: motion thresholds OR a frame-count cap since the
    last keyframe (standard RGB-D odometry practice; tuned for Kinect-scale
    motion)."""

    max_angle_deg: float = 2.0
    max_translation: float = 80.0  # mm
    max_gap: int = 10


def frame_to_landmarks(cloud8: jnp.ndarray) -> jnp.ndarray:
    """(480, 640, 8) or (307200, 8) frame -> (16384, 8) landmarks."""
    return get_landmarks(cloud8.reshape(-1, 8))


def run_odometry(
    frames: list[jnp.ndarray],
    params: ICPParams,
    config: ICPConfig,
    policy: KeyframePolicy = KeyframePolicy(),
    to_landmarks: Callable[[jnp.ndarray], jnp.ndarray] = frame_to_landmarks,
) -> OdometryResult:
    """Chain ICP over consecutive frames.

    ICP convention here: register(fixed=prev landmarks, moving=cur landmarks)
    returns cur->prev (i.e. prev_from_cur), because it maps the moving cloud
    onto the fixed one.

    Args:
      frames: list of camera-frame clouds ((480, 640, 8) or (n, 8)).
    """
    result = OdometryResult()
    result.poses.append(Pose.identity())
    result.keyframes.append(0)

    prev_lms = to_landmarks(frames[0])
    last_kf_pose = result.poses[0]
    gap = 0

    for i in range(1, len(frames)):
        cur_lms = to_landmarks(frames[i])
        state = register(prev_lms, cur_lms, params, config)
        state = jax.block_until_ready(state)
        rel = Pose(state.q, state.t)  # prev_from_cur (scale ~1 for rigid)
        world = compose(result.poses[-1], rel)
        result.poses.append(world)
        result.relative.append(state)

        # Keyframe decision on motion since the last keyframe.
        from icp_tpu.slam.se3 import relative as rel_pose

        d = rel_pose(last_kf_pose, world)
        gap += 1
        if (
            float(qangle_deg(d.q)) > policy.max_angle_deg
            or float(jnp.linalg.norm(d.t)) > policy.max_translation
            or gap >= policy.max_gap
        ):
            result.keyframes.append(i)
            last_kf_pose = world
            gap = 0

        prev_lms = cur_lms

    return result


def odometry_chain_device(lms_seq: jnp.ndarray, params: ICPParams,
                          config: ICPConfig):
    """The WHOLE odometry chain as one device dispatch.

    ``lax.scan`` over consecutive landmark pairs: per step, build the RBC
    index over the previous frame, run the full registration
    ``lax.while_loop``, and compose the world pose — zero host involvement
    for the entire sequence (the per-frame analog of the per-iteration win
    over the reference).

    Args:
      lms_seq: (T, m, 8) landmark sets of T consecutive frames.
    Returns:
      (world_q (T, 4), world_t (T, 3), rel_k (T-1,) iteration counts).
    """
    from icp_tpu.icp.quaternion import qidentity, qmul, qnormalize, qrotate
    from icp_tpu.icp.run import build_index, icp_run

    def step(carry, pair):
        q_w, t_w = carry
        prev, cur = pair
        index = build_index(prev, params, config)
        st = icp_run(cur, index, params, config)
        # world_from_cur = world_from_prev * prev_from_cur
        q_new = qnormalize(qmul(q_w, st.q))
        t_new = qrotate(q_w, st.t) + t_w
        return (q_new, t_new), (q_new, t_new, st.k)

    init = (qidentity(lms_seq.dtype), jnp.zeros((3,), lms_seq.dtype))
    pairs = (lms_seq[:-1], lms_seq[1:])
    _, (qs, ts, ks) = jax.lax.scan(step, init, pairs)
    world_q = jnp.concatenate([init[0][None], qs], axis=0)
    world_t = jnp.concatenate([jnp.zeros((1, 3), lms_seq.dtype), ts], axis=0)
    return world_q, world_t, ks


def absolute_trajectory_error(est: list[Pose], gt: list[Pose]) -> float:
    """RMS translational ATE after aligning the first poses (both
    trajectories are expressed relative to their own frame 0 here, so no
    Horn alignment is needed — frame 0 is the common anchor)."""
    errs = []
    for e, g in zip(est, gt):
        errs.append(np.linalg.norm(np.asarray(e.t) - np.asarray(g.t)))
    return float(np.sqrt(np.mean(np.square(errs))))


def relative_pose_error(est: list[Pose], gt: list[Pose],
                        delta: int = 1) -> tuple[float, float]:
    """TUM-benchmark RPE (Sturm et al., IROS 2012): drift per ``delta``
    frames.

    For every i, compare the estimated relative motion over [i, i+delta]
    with the ground-truth one:

        E_i = (G_i^-1 G_{i+delta})^-1 (X_i^-1 X_{i+delta})

    Returns (RMS translational RPE in the trajectory's length unit, RMS
    rotational RPE in degrees). Complements ATE: ATE measures global
    consistency, RPE measures local drift independent of accumulated error.
    """
    from icp_tpu.slam import se3

    t_errs, r_errs = [], []
    for i in range(len(est) - delta):
        rel_e = se3.relative(est[i], est[i + delta])
        rel_g = se3.relative(gt[i], gt[i + delta])
        err = se3.compose(se3.inverse(rel_g), rel_e)
        t_errs.append(float(np.linalg.norm(np.asarray(err.t))))
        r_errs.append(float(qangle_deg(err.q)))
    if not t_errs:
        raise ValueError("trajectory shorter than delta")
    return (float(np.sqrt(np.mean(np.square(t_errs)))),
            float(np.sqrt(np.mean(np.square(r_errs)))))
