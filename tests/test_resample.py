"""Systematic resampling tests (grid/particle.rs:49-105 semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from slamrs_tpu.ops import resample as rs


def test_degenerate_weight_selects_winner():
    w = jnp.array([0.0, 0.0, 1.0, 0.0])
    idx = np.asarray(rs.systematic_resample(jax.random.key(0), w))
    assert (idx == 2).all()


def test_uniform_weights_identity():
    # with equal weights, systematic resampling maps m -> m for any offset
    n = 16
    w = jnp.full((n,), 1.0 / n)
    for seed in range(5):
        idx = np.asarray(rs.systematic_resample(jax.random.key(seed), w))
        np.testing.assert_array_equal(idx, np.arange(n))


def test_proportionality():
    # counts approximate n * w_i within 1 (systematic resampling property)
    rng = np.random.RandomState(0)
    w = rng.dirichlet(np.ones(32)).astype(np.float32)
    n = 512
    wn = np.repeat(w, 16) / 16  # stretch to 512 lanes with the same mass
    idx = np.asarray(rs.systematic_resample(jax.random.key(1),
                                            jnp.asarray(wn)))
    counts = np.bincount(idx, minlength=n)
    np.testing.assert_allclose(counts, n * wn, atol=1.0)


def test_batched():
    w = jnp.stack([jnp.array([1.0, 0, 0, 0]), jnp.array([0, 0, 0, 1.0])])
    idx = np.asarray(rs.systematic_resample(jax.random.key(0), w))
    assert (idx[0] == 0).all() and (idx[1] == 3).all()


def test_normalize_log_weights():
    lw = jnp.array([-1000.0, -1000.0, -999.0])
    w = np.asarray(rs.normalize_log_weights(lw))
    np.testing.assert_allclose(w.sum(), 1.0, atol=1e-6)
    assert w[2] > w[0]


def test_effective_particles():
    w = jnp.array([0.25, 0.25, 0.25, 0.25])
    assert float(rs.effective_particles(w)) == 4.0
    w = jnp.array([1.0, 0.0, 0.0, 0.0])
    assert float(rs.effective_particles(w)) == 1.0
