"""Probability algebra + angle math tests.

Mirrors the reference's unit tests (common/src/math.rs:159-195) and adds
coverage for the log-space helpers.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from slamrs_tpu.core import math as m

PI = np.pi


def test_log_odds_inverse_roundtrip():
    # math.rs:167-177: probability -> log-odds -> probability over [0, 1)
    vals = np.arange(1, 100) / 100.0
    out = m.log_odds_to_prob(m.prob_to_log_odds(jnp.asarray(vals)))
    np.testing.assert_allclose(np.asarray(out), vals, atol=1e-6)


def test_zero_is_half():
    # math.rs:179-182
    assert float(m.prob_to_log_odds(0.5)) == pytest.approx(0.0, abs=1e-6)
    assert float(m.log_odds_to_prob(0.0)) == pytest.approx(0.5, abs=1e-7)


@pytest.mark.parametrize("alpha,beta,expected", [
    (PI, PI, 0.0),
    (-PI, PI, 0.0),
    (0.0, PI, -PI),
    (PI, 0.0, -PI),
    (0.0, PI / 2, PI / 2),
    (PI / 2, 0.0, -PI / 2),
    (PI, PI / 2, -PI / 2),
    (PI / 2, PI, PI / 2),
])
def test_angle_diff_table(alpha, beta, expected):
    # math.rs:184-194 (8-case table)
    assert float(m.angle_diff(alpha, beta)) == pytest.approx(expected,
                                                             abs=1e-6)


def test_angle_diff_range():
    rng = np.random.RandomState(0)
    a = rng.uniform(-10, 10, 256)
    b = rng.uniform(-10, 10, 256)
    d = np.asarray(m.angle_diff(jnp.asarray(a), jnp.asarray(b)))
    assert (d >= -PI - 1e-6).all() and (d < PI + 1e-6).all()
    # shortest-distance property
    np.testing.assert_allclose(np.sin(d), np.sin(b - a), atol=1e-5)
    np.testing.assert_allclose(np.cos(d), np.cos(b - a), atol=1e-5)


def test_log_prob_algebra():
    a, b = 0.3, 0.6
    la, lb = np.log(a), np.log(b)
    assert float(m.log_prob_mul(la, lb)) == pytest.approx(np.log(a * b))
    assert float(m.log_prob_add(la, lb)) == pytest.approx(np.log(a + b),
                                                          abs=1e-6)


def test_normal_logpdf():
    from scipy import stats  # scipy ships with the image? fallback below
    x, mu, s = 0.3, 0.1, 0.5
    expected = stats.norm.logpdf(x, mu, s)
    assert float(m.normal_logpdf(x, mu, s)) == pytest.approx(float(expected),
                                                             abs=1e-5)


def test_wrap_angle():
    assert float(m.wrap_angle(3 * PI)) == pytest.approx(-PI, abs=1e-5)
    assert float(m.wrap_angle(0.5)) == pytest.approx(0.5, abs=1e-6)
