import math

import jax
import jax.numpy as jnp
import numpy as np

from detectinblur_tpu.ops.psf import (
    rasterize_psf,
    center_psf,
    find_offsets,
    psf_principal_components,
    sample_psf,
    crop_center,
)
from detectinblur_tpu.ops.trajectory import sample_trajectory


def numpy_rasterize_oracle(traj_xy, canvas, fraction):
    """Independent numpy implementation of the documented reference PSF
    splatting semantics (generate_PSF.py:31-83) used as a parity oracle."""
    T = len(traj_xy)
    psf = np.zeros((canvas, canvas))
    f = fraction * T
    p = 0.0
    tri = lambda x: np.maximum(0.0, 1.0 - np.abs(x))
    for t in range(T):
        if f >= t and p < t - 1:
            tp = 1.0
        elif f >= t - 1 and p < t - 1:
            tp = f - (t - 1)
        elif f >= t and p < t:
            tp = t - p
        elif f >= t - 1 and p < t:
            tp = f - p
        else:
            tp = 0.0
        px, py = traj_xy[t]
        m2 = int(min(canvas - 1, max(1, math.floor(px))))
        m1 = int(min(canvas - 1, max(1, math.floor(py))))
        M2, M1 = m2 + 1, m1 + 1
        for (r, c) in [(m1, m2), (m1, M2), (M1, m2), (M1, M2)]:
            if r < canvas and c < canvas:
                psf[r, c] += tp * tri(px - c) * tri(py - r)
    return psf / T


def test_rasterize_matches_numpy_oracle():
    traj = sample_trajectory(jax.random.key(0), canvas=64, iters=150, max_len=30.0, expl=0.005)
    xy = np.asarray(traj.positions)
    for fraction in (1 / 10, 1 / 2, 1.0):
        ours = np.asarray(rasterize_psf(traj.positions, canvas=64, fraction=fraction))
        oracle = numpy_rasterize_oracle(xy, 64, fraction)
        np.testing.assert_allclose(ours, oracle, atol=1e-6)


def test_psf_mass_tracks_exposure():
    traj = sample_trajectory(jax.random.key(1), canvas=128, iters=400, max_len=60.0, expl=0.005)
    masses = []
    for fraction in (1 / 18, 1 / 5, 1.0):
        psf = rasterize_psf(traj.positions, canvas=128, fraction=fraction)
        masses.append(float(jnp.sum(psf)))
    # Total splatted mass ~ exposure fraction (bilinear weights sum to 1).
    np.testing.assert_allclose(masses, [1 / 18, 1 / 5, 1.0], rtol=0.05)
    assert masses[0] < masses[1] < masses[2]


def test_center_psf_centroid():
    canvas = 64
    psf = jnp.zeros((canvas, canvas)).at[10:14, 40:46].set(1.0)
    centered = np.asarray(center_psf(psf))
    ys, xs = np.nonzero(centered > 0)
    w = centered[centered > 0]
    cx = (xs * w).sum() / w.sum()
    cy = (ys * w).sum() / w.sum()
    assert abs(cx - canvas / 2) <= 1.0
    assert abs(cy - canvas / 2) <= 1.0
    # Mass preserved under roll.
    np.testing.assert_allclose(centered.sum(), float(jnp.sum(psf)))


def test_find_offsets():
    canvas = 128
    half = canvas // 2 - 1  # 63
    psf = jnp.zeros((canvas, canvas))
    # Support spanning x in [60, 70], y in [50, 66].
    psf = psf.at[50:67, 60:71].set(1.0)
    left, top, right, bottom = np.asarray(find_offsets(psf))
    assert left == 63 - 60
    assert right == 70 - 63
    assert top == 63 - 50
    assert bottom == 66 - 63


def reference_pca_oracle(psf):
    nz = np.nonzero(psf > 0)
    coordY, coordX = nz[0].astype(float), nz[1].astype(float)
    coordYP = coordY - coordY.mean()
    coordXP = coordX - coordX.mean()
    cov = (coordYP * coordXP).mean()
    varX = (coordXP * coordXP).mean()
    varY = (coordYP * coordYP).mean()
    lam1 = (varX + varY) / 2 + math.sqrt(((varX - varY) / 2) ** 2 + cov**2)
    lam2 = (varX + varY) / 2 - math.sqrt(((varX - varY) / 2) ** 2 + cov**2)
    sig = lambda x: 1 / (1 + math.exp(-x))
    sf1 = 1 - (sig(math.sqrt(lam1) / 10) - 0.5) * 0.6
    sf2 = 1 - (sig(math.sqrt(max(lam2, 0)) / 10) - 0.5) * 0.6
    theta = -math.atan2(lam1 - varX, -cov)
    return theta, sf1, sf2


def test_principal_components_match_reference_formula():
    key = jax.random.key(9)
    psf = sample_psf(key, expl=0.005, fraction=0.5, iters=500)
    arr = np.asarray(psf)
    theta_o, sf1_o, sf2_o = reference_pca_oracle(arr)
    comps = psf_principal_components(psf)
    np.testing.assert_allclose(float(comps.theta_rad), theta_o, atol=1e-4)
    np.testing.assert_allclose(float(comps.scale_factor_lambda1), sf1_o, atol=1e-5)
    np.testing.assert_allclose(float(comps.scale_factor_lambda2), sf2_o, atol=1e-5)


def test_sample_psf_end_to_end():
    psf = sample_psf(jax.random.key(2), expl=0.005, fraction=1.0, iters=500)
    assert psf.shape == (128, 128)
    arr = np.asarray(psf)
    assert arr.sum() > 0
    # Centered + cropped: support must fit inside the 128 window (the
    # check performed by see_PSFs.py:5-22).
    assert arr[0, :].sum() == 0 or arr[-1, :].sum() == 0  # not wrapped around


def test_crop_center():
    psf = jnp.arange(16.0).reshape(4, 4)
    c = crop_center(psf, 2)
    np.testing.assert_allclose(np.asarray(c), [[5.0, 6.0], [9.0, 10.0]])


def test_vmapped_psf_bank():
    # On-device PSF bank generation: the replacement for generate_PSFs.py.
    keys = jax.random.split(jax.random.key(0), 4)
    bank = jax.vmap(lambda k: sample_psf(k, expl=0.001, fraction=0.5, iters=200))(keys)
    assert bank.shape == (4, 128, 128)
    sums = np.asarray(jnp.sum(bank, axis=(1, 2)))
    assert (sums > 0).all()
