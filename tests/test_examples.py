"""Example scripts stay runnable (the gallery is part of the deliverable)."""
import subprocess
import pytest
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]


@pytest.mark.slow
def test_turntable_smoke(tmp_path):
    gif = tmp_path / "t.gif"
    out = subprocess.run(
        [
            sys.executable, str(REPO / "examples" / "turntable.py"),
            "--frames", "2", "--spp", "5", "--size", "32",
            "--out", str(tmp_path), "--gif", str(gif), "--cpu",
        ],
        capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    from PIL import Image

    a = np.asarray(Image.open(tmp_path / "frame_0000.png"))
    b = np.asarray(Image.open(tmp_path / "frame_0001.png"))
    assert a.shape == (32, 32, 3)
    assert not np.array_equal(a, b)  # the camera moved
    assert gif.exists() and gif.stat().st_size > 0
