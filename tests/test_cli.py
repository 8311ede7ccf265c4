"""CLI end-to-end smoke (component C1 — the reference's argument surface +
scripted impacts replacing mouse picking, SurtrArgument.h:21-52)."""

import json
import os

import numpy as np
import pytest

from surtr_tpu.__main__ import main, parse_impact


def test_parse_impact_spec():
    o, d, s = parse_impact("0,4.5,-10:0,0,1@60")
    assert o == (0.0, 4.5, -10.0)
    assert d == (0.0, 0.0, 1.0)
    assert s == 60
    o2, d2, s2 = parse_impact("1,2,3:4,5,6")
    assert s2 == 0 and o2 == (1.0, 2.0, 3.0)


@pytest.mark.slow  # full CLI e2e: compile-heavy; runs in `make test-all`
def test_cli_tiny_end_to_end(tmp_path, capsys):
    frames = tmp_path / "frames"
    snap = tmp_path / "state.npz"
    traj = tmp_path / "traj.npz"
    main([
        "--model", "cube",
        "--preset", "tiny",
        "--steps", "12",
        "--impact", "0,10,0:0,-1,0@5",
        "--size", "64",
        "--shadow", "64",
        "--frames", str(frames),
        "--camera", "orbit:10,6,2",
        "--save", str(snap),
        "--trajectory", str(traj),
    ])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    res = json.loads(out)
    assert res["model"] == "cube"
    assert res["steps"] == 12
    # impact fractured the initial compound
    assert res["pieces"] > 8 and res["bodies"] > 1
    assert abs(res["volume"] - 27.0) < 0.1
    # artifacts written
    assert snap.exists()
    assert traj.exists()
    assert len(os.listdir(frames)) >= 2
    t = np.load(traj)["x"]
    assert t.shape[0] == 12


def test_cli_camera_paths():
    import numpy as np

    from surtr_tpu.__main__ import camera_eye

    assert camera_eye("fly:0,1,2:6,1,2", 0, 11) == (0.0, 1.0, 2.0)
    assert camera_eye("fly:0,1,2:6,1,2", 10, 11) == (6.0, 1.0, 2.0)
    e0 = np.asarray(camera_eye("orbit:10,6,2", 0, 240))
    e60 = np.asarray(camera_eye("orbit:10,6,2", 60, 240))
    # same radius and height, rotated quarter turn after period/4
    assert np.isclose(np.hypot(e0[0], e0[2]), 10.0)
    assert np.isclose(np.hypot(e60[0], e60[2]), 10.0)
    assert e0[1] == 6.0 and e60[1] == 6.0
    assert np.isclose(np.dot(e0[[0, 2]], e60[[0, 2]]), 0.0, atol=1e-5)
    assert camera_eye("fixed", 5, 10) == (8.0, 6.0, 8.0)
