"""Native C++ loader parity with the Python fallback."""

import os
import subprocess

import numpy as np
import pytest

from surtr_tpu.io.obj import parse_obj
from surtr_tpu.native import available, obj_native

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OBJ = "/root/reference/Resources/Models/cube.obj"


@pytest.fixture(scope="module", autouse=True)
def build_native():
    if not available():
        subprocess.run(["make", "native"], cwd=REPO, check=False)


def test_native_matches_python_loader():
    if not available() or not os.path.exists(OBJ):
        pytest.skip("native lib or reference assets unavailable")
    out = obj_native.parse_obj_file(OBJ, (3, 3, 3), (0, 0, 0), True)
    assert out is not None
    vn, fn = out
    with open(OBJ) as f:
        vp, fp = parse_obj(f.read(), (3, 3, 3), (0, 0, 0), True)
    assert np.allclose(vn, vp, atol=1e-6)
    assert np.array_equal(fn, fp)


def test_native_missing_file_returns_none():
    if not available():
        pytest.skip("native lib unavailable")
    assert obj_native.parse_obj_file("/nonexistent.obj") is None
