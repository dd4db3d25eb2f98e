"""Tests for stratified + inverse-CDF sampling (vs torch re-derivation)."""

import numpy as np
import torch
import jax
import jax.numpy as jnp

from nvsr_tpu.ops.sampling import (
    hierarchical_z_vals,
    sample_pdf,
    stratified_z_vals,
)


def _torch_sample_pdf_det(bins, weights, num_samples):
    """Independent torch re-derivation of deterministic inverse-CDF
    sampling with the reference's exact numeric conventions
    (nerf_helpers.py:668-702)."""
    weights = torch.from_numpy(weights) + 1e-5
    pdf = weights / torch.sum(weights, -1, keepdim=True)
    cdf = torch.cumsum(pdf, -1)
    cdf = torch.cat([torch.zeros_like(cdf[..., :1]), cdf], -1)
    u = torch.linspace(0.0, 1.0, steps=num_samples)
    u = u.expand(list(cdf.shape[:-1]) + [num_samples]).contiguous()
    inds = torch.searchsorted(cdf.contiguous(), u, side="right")
    below = torch.clamp(inds - 1, min=0)
    above = torch.clamp(inds, max=cdf.shape[-1] - 1)
    cdf_g = torch.gather(cdf, 1, torch.cat([below, above], -1))
    cdf_below, cdf_above = cdf_g[..., :num_samples], cdf_g[..., num_samples:]
    bins_t = torch.from_numpy(bins)
    bins_g = torch.gather(bins_t, 1, torch.cat(
        [below.clamp(max=bins_t.shape[-1] - 1),
         above.clamp(max=bins_t.shape[-1] - 1)], -1))
    bins_below, bins_above = bins_g[..., :num_samples], bins_g[..., num_samples:]
    denom = cdf_above - cdf_below
    denom = torch.where(denom < 1e-5, torch.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    return (bins_below + t * (bins_above - bins_below)).numpy()


def test_stratified_deterministic():
    near = jnp.full((5, 1), 2.0)
    far = jnp.full((5, 1), 6.0)
    z = stratified_z_vals(jax.random.PRNGKey(0), near, far, 8,
                          lindisp=False, perturb=False)
    expected = np.linspace(2.0, 6.0, 8)
    np.testing.assert_allclose(np.asarray(z[0]), expected, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(z[4]), expected, rtol=1e-6)


def test_stratified_lindisp():
    near = jnp.full((1, 1), 2.0)
    far = jnp.full((1, 1), 6.0)
    z = np.asarray(stratified_z_vals(jax.random.PRNGKey(0), near, far, 5,
                                     lindisp=True, perturb=False))[0]
    t = np.linspace(0, 1, 5)
    expected = 1.0 / (1.0 / 2.0 * (1 - t) + 1.0 / 6.0 * t)
    np.testing.assert_allclose(z, expected, rtol=1e-6)


def test_stratified_perturb_within_strata():
    near = jnp.full((100, 1), 2.0)
    far = jnp.full((100, 1), 6.0)
    z = np.asarray(stratified_z_vals(jax.random.PRNGKey(3), near, far, 16,
                                     lindisp=False, perturb=True))
    base = np.linspace(2.0, 6.0, 16)
    mids = 0.5 * (base[1:] + base[:-1])
    lower = np.concatenate([[base[0]], mids])
    upper = np.concatenate([mids, [base[-1]]])
    assert np.all(z >= lower - 1e-6) and np.all(z <= upper + 1e-6)
    assert np.all(np.diff(z, axis=-1) > -1e-6)


def test_sample_pdf_det_matches_torch(rng):
    bins = np.sort(rng.random((7, 15)).astype(np.float32), axis=-1)
    weights = rng.random((7, 14)).astype(np.float32)
    ours = np.asarray(sample_pdf(jax.random.PRNGKey(0), jnp.asarray(bins),
                                 jnp.asarray(weights), 33, det=True))
    ref = _torch_sample_pdf_det(bins, weights, 33)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_sample_pdf_concentrates_mass(rng):
    """Random samples should land where the weights say."""
    bins = np.tile(np.linspace(0.0, 1.0, 11, dtype=np.float32), (4, 1))
    weights = np.zeros((4, 10), dtype=np.float32)
    weights[:, 5] = 100.0  # all the mass in bin [0.5, 0.6]
    s = np.asarray(sample_pdf(jax.random.PRNGKey(1), jnp.asarray(bins),
                              jnp.asarray(weights), 64, det=False))
    frac_in_bin = np.mean((s >= 0.5) & (s <= 0.6))
    assert frac_in_bin > 0.95


def test_hierarchical_merge_sorted(rng):
    z_vals = np.sort(rng.random((3, 9)).astype(np.float32), -1) * 4 + 2
    weights = rng.random((3, 9)).astype(np.float32)
    z = np.asarray(hierarchical_z_vals(jax.random.PRNGKey(2),
                                       jnp.asarray(z_vals),
                                       jnp.asarray(weights), 16, det=False))
    assert z.shape == (3, 25)
    assert np.all(np.diff(z, axis=-1) >= 0)


def test_hierarchical_samples_no_grad():
    """Resampled depths are stop-gradiented (reference train_utils.py:153)."""
    z_vals = jnp.tile(jnp.linspace(2.0, 6.0, 9), (2, 1))

    def f(w):
        z = hierarchical_z_vals(jax.random.PRNGKey(0), z_vals, w, 8, det=True)
        return jnp.sum(z)

    g = jax.grad(f)(jnp.ones((2, 9)))
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-7)


def test_sorted_uniform_is_sorted_and_uniform():
    from nvsr_tpu.ops.sampling import sorted_uniform

    u = np.asarray(sorted_uniform(jax.random.PRNGKey(0), (2000, 16)))
    assert np.all(np.diff(u, axis=-1) >= 0)
    assert np.all((u >= 0) & (u <= 1))
    # marginal of a random position ~ Beta(i+1, n-i+1); check mean of
    # the middle order statistic is near (i+1)/(n+1)
    mid = u[:, 8]
    np.testing.assert_allclose(mid.mean(), 9 / 17, atol=0.02)
    # pooled samples look uniform
    np.testing.assert_allclose(u.ravel().mean(), 0.5, atol=0.01)


def test_merge_sorted_matches_numpy(rng):
    from nvsr_tpu.ops.sampling import merge_sorted

    a = np.sort(rng.random((10, 9)).astype(np.float32), -1)
    b = np.sort(rng.random((10, 6)).astype(np.float32), -1)
    out = np.asarray(merge_sorted(jnp.asarray(a), jnp.asarray(b)))
    ref = np.sort(np.concatenate([a, b], -1), -1)
    np.testing.assert_allclose(out, ref, atol=1e-7)


def test_merge_sorted_with_ties():
    from nvsr_tpu.ops.sampling import merge_sorted

    a = jnp.asarray([[1.0, 2.0, 2.0, 5.0]])
    b = jnp.asarray([[2.0, 3.0]])
    out = np.asarray(merge_sorted(a, b))
    np.testing.assert_allclose(out, [[1, 2, 2, 2, 3, 5]])


def test_degenerate_interval_z_exactly_constant():
    """near == far (occupancy miss rays): stratified + hierarchical z
    must be EXACTLY constant — any ULP non-monotonicity collides the
    sort-free merge into k-fold-summed values (PERF.md round 3)."""
    near = jnp.full((8, 1), 3.8631353)
    far = jnp.full((8, 1), 3.8631353)
    for perturb in (False, True):
        zc = stratified_z_vals(jax.random.PRNGKey(0), near, far, 16,
                               lindisp=False, perturb=perturb)
        assert (np.asarray(zc) == np.asarray(zc[:, :1])).all()
        zf = hierarchical_z_vals(jax.random.PRNGKey(1), zc,
                                 jnp.ones((8, 16)), 16, det=not perturb)
        z = np.asarray(zf)
        np.testing.assert_array_equal(z, np.broadcast_to(z[:, :1], z.shape))


def test_hierarchical_det_merge_equals_sort(rng):
    """det path: the sort-free merge must equal sort(concat)."""
    z_vals = np.sort(rng.random((5, 9)).astype(np.float32), -1) * 4 + 2
    weights = rng.random((5, 9)).astype(np.float32)
    z = np.asarray(hierarchical_z_vals(jax.random.PRNGKey(0),
                                       jnp.asarray(z_vals),
                                       jnp.asarray(weights), 8, det=True))
    from nvsr_tpu.ops.sampling import sample_pdf
    z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    s = np.asarray(sample_pdf(jax.random.PRNGKey(0), jnp.asarray(z_mid),
                              jnp.asarray(weights[..., 1:-1]), 8, det=True))
    ref = np.sort(np.concatenate([z_vals, s], -1), -1)
    np.testing.assert_allclose(z, ref, atol=1e-6)


def test_hierarchical_random_sorted_and_in_support(rng):
    z_vals = np.tile(np.linspace(2.0, 6.0, 9, dtype=np.float32), (50, 1))
    weights = rng.random((50, 9)).astype(np.float32)
    z = np.asarray(hierarchical_z_vals(jax.random.PRNGKey(7),
                                       jnp.asarray(z_vals),
                                       jnp.asarray(weights), 16, det=False))
    assert z.shape == (50, 25)
    assert np.all(np.diff(z, axis=-1) >= -1e-6)
    assert z.min() >= 2.0 - 1e-5 and z.max() <= 6.0 + 1e-5
