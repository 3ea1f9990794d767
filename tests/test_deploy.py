"""Deployment stack tests: LCM wire protocol, fingerprint interop with the
reference's lcm-gen bindings, StateEstimator/LCMAgent behavior, and a full
hardware-in-the-loop loop against the C++ bridge in sim mode."""
import os
import struct
import subprocess
import sys
import time

import numpy as np
import pytest

from wtw_tpu.deploy import (LCM, DeployedPolicy, LCMAgent, StateEstimator,
                            leg_control_data_lcmt, pd_tau_targets_lcmt,
                            rc_command_lcmt, state_estimator_lcmt)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_LCM_TYPES = "/root/reference/go1_gym_deploy/lcm_types"

# distinct multicast group per test session so parallel runs don't collide
MCAST = ("239.255.76.67", 17667)


def test_wire_roundtrip_all_types():
    for cls, kw in [
        (pd_tau_targets_lcmt, dict(q_des=[0.5] * 12, kp=[20.0] * 12)),
        (leg_control_data_lcmt, dict(q=[0.25] * 12, tau_est=[1.5] * 12)),
        (state_estimator_lcmt, dict(rpy=[0.1, -0.2, 0.3],
                                    contact_estimate=[250.0] * 4)),
        (rc_command_lcmt, dict(mode=3, left_stick=[0.5, -0.5])),
    ]:
        msg = cls(**kw)
        out = cls.decode(msg.encode())
        for k, v in kw.items():
            got = getattr(out, k)
            np.testing.assert_allclose(got, v, rtol=1e-6)


@pytest.mark.skipif(not os.path.isdir(REF_LCM_TYPES),
                    reason="reference bindings not mounted")
def test_fingerprints_match_lcm_gen():
    """Our hand-computed type hashes must equal lcm-gen's fingerprints —
    that is what makes us wire-compatible with real LCM peers."""
    sys.path.insert(0, REF_LCM_TYPES)
    import importlib
    for name in ["pd_tau_targets_lcmt", "state_estimator_lcmt",
                 "leg_control_data_lcmt", "rc_command_lcmt"]:
        ref = getattr(importlib.import_module(name), name)
        ref_hash = struct.unpack(">q", ref._get_packed_fingerprint())[0]
        import wtw_tpu.deploy.lcm_types as T
        assert getattr(T, name).type_hash() == ref_hash, name


@pytest.mark.skipif(not os.path.isdir(REF_LCM_TYPES),
                    reason="reference bindings not mounted")
def test_payload_bytes_match_lcm_gen():
    """Byte-identical encoding vs the reference's generated encoder."""
    sys.path.insert(0, REF_LCM_TYPES)
    from pd_tau_targets_lcmt import pd_tau_targets_lcmt as RefPd
    ref = RefPd()
    ref.q_des = [0.1 * i for i in range(12)]
    ref.qd_des = [0.0] * 12
    ref.tau_ff = [0.0] * 12
    ref.kp = [20.0] * 12
    ref.kd = [0.5] * 12
    ref.timestamp_us = 123456789
    ref.id = 7
    ref.robot_id = 1
    ref.se_contactState = [0.0] * 4
    ours = pd_tau_targets_lcmt(
        q_des=[0.1 * i for i in range(12)], qd_des=[0.0] * 12,
        tau_ff=[0.0] * 12, kp=[20.0] * 12, kd=[0.5] * 12,
        timestamp_us=123456789, id=7, robot_id=1,
        se_contactState=[0.0] * 4)
    assert ours.encode() == ref.encode()


def test_pubsub_roundtrip():
    lc = LCM(addr=MCAST)
    got = []
    lc.subscribe("chan_a", lambda ch, d: got.append(
        leg_control_data_lcmt.decode(d)))
    msg = leg_control_data_lcmt(q=[0.3] * 12)
    lc.publish("chan_a", msg.encode())
    deadline = time.time() + 2.0
    while not got and time.time() < deadline:
        lc.handle_once(0.1)
    lc.stop()
    assert got and got[0].q[0] == pytest.approx(0.3)


def test_state_estimator_processing():
    lc = LCM(addr=MCAST)
    se = StateEstimator(lc)
    # inject telemetry directly through the callbacks
    se._legdata_cb("leg_control_data", leg_control_data_lcmt(
        q=list(np.arange(12) * 0.1), qd=[0.5] * 12).encode())
    se._legdata_imu_cb("state_estimator_data", state_estimator_lcmt(
        rpy=[0.0, 0.0, np.pi / 2], contact_estimate=[250, 100, 250, 100],
        vWorld=[1.0, 0.0, 0.0]).encode())
    np.testing.assert_allclose(se.get_dof_pos(), np.arange(12) * 0.1)
    # yaw pi/2: world +x velocity becomes body -y... (R^T v)
    v_body = se.get_body_linear_vel()
    assert v_body[1] == pytest.approx(-1.0, abs=1e-5)
    # gravity in body frame stays -z under pure yaw
    np.testing.assert_allclose(se.get_gravity_vector(), [0, 0, -1],
                               atol=1e-6)
    # contact threshold at 200, reordered by CONTACT_IDXS
    assert se.get_contact_state().tolist() == [0.0, 1.0, 0.0, 1.0]
    # RC mapping: forward stick -> vx
    se._rc_command_cb("rc_command", rc_command_lcmt(
        mode=1, left_stick=[0.0, 0.8], right_stick=[0.0, 0.0]).encode())
    cmd = se.get_command()
    assert cmd[0] == pytest.approx(0.8)
    assert cmd[5] == 0.0 and cmd[6] == 0.0   # trot gait (mode 1)
    lc.stop()


def test_deployed_policy_matches_training_export(tmp_path):
    """Export from the training stack -> numpy inference parity."""
    import jax
    import jax.numpy as jnp
    from wtw_tpu.models import actor_critic as ac

    params = ac.init_actor_critic(jax.random.PRNGKey(0), 42, 2, 420, 12)
    export = {}
    for net in ("adaptation", "actor"):
        for i, lyr in enumerate(params[net]):
            export[f"{net}/w{i}"] = np.asarray(lyr["w"])
            export[f"{net}/b{i}"] = np.asarray(lyr["b"])
    path = tmp_path / "policy.npz"
    np.savez(path, **export)
    policy = DeployedPolicy(str(path))
    obs_h = np.random.default_rng(0).normal(size=(3, 420)).astype(np.float32)
    ours = policy(obs_h)
    theirs, _ = ac.act_student(params, jnp.asarray(obs_h))
    np.testing.assert_allclose(ours, np.asarray(theirs), atol=1e-5)


@pytest.mark.slow
def test_hil_cpp_bridge_tracks_targets(tmp_path):
    """Hardware-in-the-loop: the C++ bridge (sim backend) must drive its
    simulated joints toward PD targets published from Python, and stream
    telemetry back."""
    exe = os.path.join(REPO, "cpp", "lcm_position_bridge")
    if not os.path.exists(exe):
        subprocess.run(["make", "-C", os.path.join(REPO, "cpp")], check=True)
    port = 17766
    proc = subprocess.Popen(
        [exe, "--sim", "--duration-s", "8", "--port", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE)
    try:
        lc = LCM(addr=("239.255.76.67", port))
        se = StateEstimator(lc)
        se.spin()
        deadline = time.time() + 5.0
        while not se.received_first_legdata and time.time() < deadline:
            time.sleep(0.05)
        assert se.received_first_legdata, "no telemetry from C++ bridge"

        target = np.array([-0.1, 1.2, -2.0, 0.1, 1.2, -2.0,
                           -0.1, 1.2, -2.0, 0.1, 1.2, -2.0])
        msg = pd_tau_targets_lcmt(
            q_des=list(target), qd_des=[0.0] * 12, tau_ff=[0.0] * 12,
            kp=[40.0] * 12, kd=[2.0] * 12, se_contactState=[0.0] * 4)
        for _ in range(100):            # 2 s of 50 Hz commands
            lc.publish("pd_plustau_targets", msg.encode())
            time.sleep(0.02)
        q = se.get_dof_pos()
        err = np.abs(q - target).max()
        lc.stop()
        assert err < 0.1, f"joints did not track targets, err={err}"
        # contact estimate crossed the 200 threshold
        assert se.get_contact_state().sum() == 4
    finally:
        proc.terminate()
        proc.wait(timeout=5)


def test_camera_message_fragmentation():
    """>64 KB camera messages must fragment (LC03) and reassemble."""
    import os as _os
    from wtw_tpu.deploy.lcm_types import camera_message_lcmt
    lc = LCM(addr=("239.255.76.67", 18765))
    got = []
    lc.subscribe("camera_image_front", lambda ch, d: got.append(d))
    img = _os.urandom(camera_message_lcmt.SIZE)
    lc.publish("camera_image_front", camera_message_lcmt(data=img).encode())
    deadline = time.time() + 3.0
    while not got and time.time() < deadline:
        lc.handle_once(0.1)
    lc.stop()
    assert got
    assert camera_message_lcmt.decode(got[0]).data == img


@pytest.mark.skipif(not os.path.isdir(REF_LCM_TYPES),
                    reason="reference bindings not mounted")
def test_camera_fingerprints_match():
    sys.path.insert(0, REF_LCM_TYPES)
    import importlib
    for name in ["camera_message_lcmt", "camera_message_rect_wide"]:
        ref = getattr(importlib.import_module(name), name)
        ref_hash = struct.unpack(">q", ref._get_packed_fingerprint())[0]
        import wtw_tpu.deploy.lcm_types as T
        assert getattr(T, name).type_hash() == ref_hash, name
