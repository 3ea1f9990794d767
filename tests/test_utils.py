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
