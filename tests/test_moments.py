"""Moments vs closed forms (oracle formula: Poly::Moments, Poly.cpp:55-87)."""

import jax.numpy as jnp
import numpy as np

from surtr_tpu.ops.moments import inertia, moments
from surtr_tpu.types import scale_poly, translate_poly, unit_cube


def test_cube_volume_centroid():
    v, c = moments(unit_cube())
    assert np.isclose(float(v), 1.0, atol=1e-6)
    assert np.allclose(np.asarray(c), 0.0, atol=1e-6)


def test_scaled_translated_box():
    box = translate_poly(
        scale_poly(unit_cube(), jnp.array([2.0, 3.0, 4.0])),
        jnp.array([10.0, -5.0, 1.0]),
    )
    v, c = moments(box)
    assert np.isclose(float(v), 24.0, rtol=1e-5)
    assert np.allclose(np.asarray(c), [10.0, -5.0, 1.0], atol=1e-4)


def test_inertia_box_closed_form():
    """Box a×b×c, density ρ: I_xx = m (b² + c²) / 12."""
    a, b, c = 2.0, 3.0, 4.0
    rho = 10.0
    box = scale_poly(unit_cube(), jnp.array([a, b, c]))
    m, com, I = inertia(box, density=rho)
    mass = rho * a * b * c
    assert np.isclose(float(m), mass, rtol=1e-5)
    want = mass / 12.0 * np.array([b * b + c * c, a * a + c * c, a * a + b * b])
    assert np.allclose(np.asarray(jnp.diag(I)), want, rtol=1e-4)
    off = np.asarray(I) - np.diag(np.diag(np.asarray(I)))
    assert np.allclose(off, 0.0, atol=1e-3)


def test_inertia_translated_com():
    box = translate_poly(unit_cube(), jnp.array([5.0, 0.0, 0.0]))
    m, com, I = inertia(box, density=1.0)
    # Inertia about the centroid is translation-invariant.
    _, _, I0 = inertia(unit_cube(), density=1.0)
    assert np.allclose(np.asarray(I), np.asarray(I0), atol=1e-3)
    assert np.allclose(np.asarray(com), [5.0, 0, 0], atol=1e-5)
