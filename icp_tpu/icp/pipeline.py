"""App-level pipelines — the reference's L4 layer (ICPSBS / ICPReg).

``ICPStepByStep`` mirrors ``ICPSBS`` (src/ocl_icp_sbs.cpp:79-228): landmark
sampling for both clouds, one ICP iteration per ``step()`` call, full-cloud
transform for display, and the reference's per-iteration report (latency,
rotation angle/axis, translation, scale, increment deltas —
src/ocl_icp_sbs.cpp:202-217).

``ICPRegistration`` mirrors ``ICPReg`` (src/ocl_icp_reg.cpp:79-217): one
``register_clouds()`` call runs the whole convergence loop on device and
reports iterations + latency.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from icp_tpu.icp.quaternion import qangle_deg, qaxis, transform_points
from icp_tpu.icp.run import build_index, icp_run
from icp_tpu.icp.state import ICPState, identity_state
from icp_tpu.icp.step import icp_step
from icp_tpu.ops.sampling import get_landmarks
from icp_tpu.runtime.config import Correspondence, ICPConfig, ICPParams
from icp_tpu.runtime.timing import CPUTimer


def _report(state: ICPState, latency_ms: float) -> str:
    """The reference's per-iteration printout (src/ocl_icp_sbs.cpp:202-217)."""
    angle = float(qangle_deg(state.q))
    axis = np.asarray(qaxis(state.q))
    dt = float(jnp.linalg.norm(state.tk))
    dang = float(qangle_deg(state.qk))
    lines = [
        "================",
        f"Iteration k = {int(state.k)}:",
        f"    Latency               :    {latency_ms:.3f} ms",
        f"    Rotation angle        :    {angle:.6f} degrees",
        f"    Rotation axis         :    {axis[0]:.4f} {axis[1]:.4f} {axis[2]:.4f}",
        f"    Translation vector    :    {np.asarray(state.t)}",
        f"    Scale                 :    {float(state.s):.6f}",
        f"    Change in translation :    {dt:.6f} mm",
        f"    Change in rotation    :    {dang:.6f} degrees",
    ]
    return "\n".join(lines)


class ICPStepByStep:
    """Step-by-step pipeline over two full 640x480 clouds (ICPSBS parity)."""

    def __init__(self, fixed_cloud: jnp.ndarray, moving_cloud: jnp.ndarray,
                 params: Optional[ICPParams] = None,
                 config: Optional[ICPConfig] = None):
        self.config = config or ICPConfig()
        self.params = (params or ICPParams(alpha=2e2)).as_f32()
        self.moving_cloud = jnp.asarray(moving_cloud).reshape(-1, 8)
        self.fixed_cloud = jnp.asarray(fixed_cloud).reshape(-1, 8)
        self.fixed_lms = get_landmarks(self.fixed_cloud)
        self.moving_lms = get_landmarks(self.moving_cloud)
        self.state = identity_state()
        self._index = None
        self._step_fn = jax.jit(
            lambda st, mv, ix: icp_step(st, mv, ix, self.params, self.config))

    def build_rbc(self) -> None:
        """Reference ``buildRBC``: (re)construct the search structure over
        the fixed landmarks and reset the iteration counter."""
        self._index = jax.block_until_ready(
            jax.jit(lambda f: build_index(f, self.params, self.config))(
                self.fixed_lms))
        self.state = identity_state()

    def step(self, verbose: bool = True) -> ICPState:
        """One ICP iteration (reference ``ICPSBS::step``)."""
        if self._index is None and self.config.needs_index:
            self.build_rbc()
        target = self._index if self._index is not None else self.fixed_lms
        with CPUTimer() as t:
            self.state = jax.block_until_ready(
                self._step_fn(self.state, self.moving_lms, target))
        if verbose:
            print(_report(self.state, t.span_ms))
        return self.state

    def transformed_cloud(self) -> jnp.ndarray:
        """Full-cloud transform for display (the reference's display-path
        ICPTransform over all 307200 points, src/ocl_icp_reg.cpp:115-121)."""
        return transform_points(self.moving_cloud, self.state.q,
                                self.state.t, self.state.s)

    def reset(self) -> None:
        self.state = identity_state()


class ICPRegistration:
    """Full registration pipeline (ICPReg parity)."""

    def __init__(self, params: Optional[ICPParams] = None,
                 config: Optional[ICPConfig] = None):
        self.config = config or ICPConfig()
        self.params = (params or ICPParams(alpha=2e2)).as_f32()

        def _run(fixed_lms, moving_lms):
            if self.config.needs_index:
                target = build_index(fixed_lms, self.params, self.config)
            else:
                target = fixed_lms
            return icp_run(moving_lms, target, self.params, self.config)

        self._run_fn = jax.jit(_run)

    def register_clouds(self, fixed_cloud: jnp.ndarray,
                        moving_cloud: jnp.ndarray,
                        verbose: bool = True) -> ICPState:
        """Register full 640x480 clouds (reference ``ICPReg::registerPC``):
        sample landmarks, build RBC, run to convergence — one device
        dispatch — and report iterations + latency."""
        fixed_lms = get_landmarks(jnp.asarray(fixed_cloud).reshape(-1, 8))
        moving_lms = get_landmarks(jnp.asarray(moving_cloud).reshape(-1, 8))
        with CPUTimer() as t:
            state = jax.block_until_ready(self._run_fn(fixed_lms, moving_lms))
        if verbose:
            print(_report(state, t.span_ms))
            print(f"Registration finished in k = {int(state.k)} iterations, "
                  f"{t.span_ms:.2f} ms")
        return state
