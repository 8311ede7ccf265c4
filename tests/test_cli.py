"""CLI end-to-end smoke (component C1 — the reference's argument surface +
scripted impacts replacing mouse picking, SurtrArgument.h:21-52)."""

import json
import os

import numpy as np

from surtr_tpu.__main__ import main, parse_impact


def test_parse_impact_spec():
    o, d, s = parse_impact("0,4.5,-10:0,0,1@60")
    assert o == (0.0, 4.5, -10.0)
    assert d == (0.0, 0.0, 1.0)
    assert s == 60
    o2, d2, s2 = parse_impact("1,2,3:4,5,6")
    assert s2 == 0 and o2 == (1.0, 2.0, 3.0)


def test_cli_tiny_end_to_end(tmp_path, capsys):
    frames = tmp_path / "frames"
    snap = tmp_path / "state.npz"
    traj = tmp_path / "traj.npz"
    main([
        "--model", "cube",
        "--preset", "tiny",
        "--steps", "25",
        "--impact", "0,10,0:0,-1,0@5",
        "--size", "64",
        "--shadow", "64",
        "--frames", str(frames),
        "--save", str(snap),
        "--trajectory", str(traj),
    ])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    res = json.loads(out)
    assert res["model"] == "cube"
    assert res["steps"] == 25
    # impact fractured the initial compound
    assert res["pieces"] > 8 and res["bodies"] > 1
    assert abs(res["volume"] - 27.0) < 0.1
    # artifacts written
    assert snap.exists()
    assert traj.exists()
    assert len(os.listdir(frames)) >= 2
    t = np.load(traj)["x"]
    assert t.shape[0] == 25
