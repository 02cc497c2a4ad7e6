"""App-pipeline tests (ICPSBS / ICPReg parity layer)."""

import numpy as np
import jax.numpy as jnp

from icp_tpu import ICPConfig, ICPParams
from icp_tpu.icp.pipeline import ICPRegistration, ICPStepByStep
from icp_tpu.icp.quaternion import qangle_deg
from icp_tpu.sensors import synthetic


def _cloud_pair():
    scene = synthetic.default_scene()
    pa = synthetic.CameraPose.identity()
    q = np.array([0, np.sin(0.003), 0, np.cos(0.003)], np.float32)
    t = np.array([8.0, -4.0, 6.0], np.float32)
    pb = synthetic.CameraPose(jnp.asarray(q), jnp.asarray(t))
    return (synthetic.render_cloud(scene, pa),
            synthetic.render_cloud(scene, pb))


def test_step_by_step_pipeline(capsys):
    fixed, moving = _cloud_pair()
    app = ICPStepByStep(fixed, moving, ICPParams(alpha=2e2),
                        ICPConfig(estimate_scale=False))
    app.build_rbc()
    st1 = app.step(verbose=True)
    assert int(st1.k) == 1
    out = capsys.readouterr().out
    # Reference report fields (src/ocl_icp_sbs.cpp:202-217).
    for field in ["Iteration k", "Latency", "Rotation angle", "Rotation axis",
                  "Translation vector", "Scale", "Change in translation",
                  "Change in rotation"]:
        assert field in out, field
    st2 = app.step(verbose=False)
    assert int(st2.k) == 2

    tc = app.transformed_cloud()
    assert tc.shape == (307200, 8)
    # Photometric half untouched by the display transform.
    np.testing.assert_array_equal(np.asarray(tc)[:, 4:],
                                  np.asarray(moving).reshape(-1, 8)[:, 4:])

    app.reset()
    assert int(app.state.k) == 0


def test_registration_pipeline(capsys):
    fixed, moving = _cloud_pair()
    app = ICPRegistration(ICPParams(alpha=2e2),
                          ICPConfig(estimate_scale=False))
    st = app.register_clouds(fixed, moving, verbose=True)
    out = capsys.readouterr().out
    assert "Registration finished in k =" in out
    assert 1 <= int(st.k) <= 40
    # Transform is in a sane range for the ~11 mm ground-truth motion.
    assert float(jnp.linalg.norm(st.t)) < 50.0
    assert float(qangle_deg(st.q)) < 2.0
