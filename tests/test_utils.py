"""Utility tests: deploy episode logger, console monitor, phase timer."""
import numpy as np

from wtw_tpu.deploy.logger import EpisodeLogger, load_episode
from wtw_tpu.utils.monitor import PhaseTimer, monitor_table


def test_episode_logger_roundtrip(tmp_path):
    log = EpisodeLogger(run_dir=str(tmp_path))
    for i in range(5):
        log.log(q=np.full(12, float(i)), tau=np.ones(12), rew=float(i))
    path = log.save(tag="t0")
    blob = load_episode(path)
    assert blob["q"].shape == (5, 12)
    assert blob["rew"].tolist() == [0, 1, 2, 3, 4]
    assert blob["t"].shape == (5,)
    # logger reset after save
    log.log(q=np.zeros(12), tau=np.zeros(12), rew=0.0)
    assert len(log._data["rew"]) == 1


def test_monitor_table_renders():
    out = monitor_table({"rew_total": 1.2345, "steps": 100}, title="it 5")
    assert "it 5" in out and "rew_total" in out and "1.2345" in out


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    with t.phase("b"):
        pass
    s = t.summary()
    assert set(s) == {"a", "b"}
    assert t.summary() == {}


def test_keyboard_command_source():
    """The interactive sim-eval command source (the joystick analog,
    tasks/go2_parkour.py:30-36): scripted keys edit the 15-dim command
    vector within the reference limits (scripts/go1/train.py:153-182)."""
    from wtw_tpu.utils.keyboard import KeyboardCommandSource

    src = KeyboardCommandSource(15, vx=0.0)
    src.feed("ww2=")          # vx +0.2, gait pace, freq +0.25
    cmd = src.poll()
    assert abs(cmd[0] - 0.2) < 1e-6
    assert tuple(cmd[5:8]) == (0.0, 0.0, 0.5) and src.gait == "pace"
    assert abs(cmd[4] - 3.25) < 1e-6
    # limits clamp (vx limit 1.0)
    src.feed("w" * 20)
    assert src.poll()[0] <= 1.0 + 1e-6
    # space zeroes velocities, r restores defaults
    src.feed("qq ")
    cmd = src.poll()
    assert cmd[0] == 0.0 and cmd[2] == 0.0
    src.feed("r")
    cmd = src.poll()
    assert cmd[4] == 3.0 and src.gait == "trot"
    # ESC requests quit
    src.feed("\x1b")
    src.poll()
    assert src.quit


class TestObedienceEstimators:
    """Validate the command-obedience estimators (eval_gaits --obedience)
    against scripted-gait ground truth — a synthetic trot whose foot
    placements, body pose, and swing apexes are known exactly. Guards the
    round-4 MoB obedience evals: a wrong estimator would misdirect the
    fine-tune (the reference measures nothing here; this is our own bar)."""

    def _scripted_trot(self, W=0.30, L=0.40, APEX=0.17, T=240, N=3,
                       period=20):
        """Feet order FR FL RR RL. Diagonal pairs alternate contact every
        `period` steps; in contact feet sit exactly at the raibert nominal
        (x, y) = (±L/2, ±W/2); in swing, foot z traces a triangle with max
        APEX and xy moves AWAY from nominal (so contact-conditioning is
        load-bearing). Returns the traces dict obedience_stats expects."""
        import numpy as np

        t = np.arange(T)
        phase = (t // period) % 2                          # (T,)
        # diag pair A = FR+RL in contact when phase 0, pair B = FL+RR
        contact = np.zeros((T, N, 4), bool)
        for f, pair in enumerate([0, 1, 1, 0]):            # FR RL diag = 0
            contact[:, :, f] = (phase == pair)[:, None]
        signs_y = np.array([+1, -1, +1, -1])               # FR FL RR RL
        signs_x = np.array([+1, +1, -1, -1])
        foot_xy = np.zeros((T, N, 4, 2), np.float32)
        foot_xy[..., 0] = signs_x * L / 2
        foot_xy[..., 1] = signs_y * W / 2
        # swing feet drift outward in xy (must be ignored by the estimator)
        drift = (~contact)[..., None] * np.array([0.3, 0.2], np.float32)
        foot_xy = foot_xy + drift
        # foot z: 0.02 in stance; triangle peaking at APEX mid-swing
        s = (t % period) / period                          # (T,)
        tri = 0.02 + (APEX - 0.02) * (1 - np.abs(2 * s - 1))
        foot_z = np.where(contact, 0.02, tri[:, None, None])
        const = lambda v: np.full((T, N), v, np.float32)
        return {
            "base_z": const(0.31), "roll": const(0.01), "pitch": const(-0.2),
            "vx": const(0.5), "vy": const(-0.1), "wz": const(0.3),
            "foot_z": foot_z.astype(np.float32), "foot_xy": foot_xy,
            "contact": contact,
        }

    def test_stance_width_length_exact(self):
        from wtw_tpu.learn.eval_metrics import obedience_stats

        st = obedience_stats(self._scripted_trot(W=0.30, L=0.40), skip=40)
        assert abs(st["stance_width"] - 0.30) < 1e-5
        assert abs(st["stance_length"] - 0.40) < 1e-5
        # a different commanded geometry reads back exactly too
        st = obedience_stats(self._scripted_trot(W=0.45, L=0.35), skip=40)
        assert abs(st["stance_width"] - 0.45) < 1e-5
        assert abs(st["stance_length"] - 0.35) < 1e-5

    def test_foot_apex_reads_swing_peak(self):
        from wtw_tpu.learn.eval_metrics import obedience_stats

        st = obedience_stats(self._scripted_trot(APEX=0.17, period=20),
                             skip=40)
        # triangle sampled every step: peak sample within one step of APEX
        assert abs(st["foot_apex"] - 0.17) < 0.02
        st = obedience_stats(self._scripted_trot(APEX=0.08, period=20),
                             skip=40)
        assert abs(st["foot_apex"] - 0.08) < 0.01

    def test_swing_drift_does_not_contaminate_stance(self):
        """The swing-phase xy drift is 0.3/0.2 m — if the estimator ever
        averaged non-contact samples, width/length would be off by ~0.2+."""
        import numpy as np
        from wtw_tpu.learn.eval_metrics import obedience_stats

        tr = self._scripted_trot(W=0.20, L=0.40)
        st = obedience_stats(tr, skip=40)
        assert abs(st["stance_width"] - 0.20) < 1e-5
        # body means pass through
        assert abs(st["pitch"] + 0.2) < 1e-6
        assert abs(st["vy"] + 0.1) < 1e-6
