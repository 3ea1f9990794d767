"""CLI smoke tests: every script parses --help (catches import/argparse
breakage without running the heavy paths)."""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = ["train.py", "train_parkour.py", "train_vision.py", "play.py",
           "deploy.py", "plot_run.py", "smoke.py"]


@pytest.mark.parametrize("script", SCRIPTS)
def test_help(script):
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", script), "--help"],
        capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr[-500:]
    assert "usage" in out.stdout.lower()
