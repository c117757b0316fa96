"""Host-side blur-decision sampling + device PSF banks.

The reference's BlurImage transform (transforms.py:186-463) runs per image
in dataloader workers: decide to blur, pick (type, exposure), load or
generate a PSF, optionally CPU-blur, compute PSF PCA. TPU-native split:

  * host (this module): the cheap *decisions* — blur y/n by regime
    probability, (param, fraction) indices incl. the LEHE class weighting,
    PSF bank index;
  * device: the expensive parts — the PSF bank itself is pre-generated with
    one vmapped ``sample_psf`` sweep (the replacement for both
    generate_PSFs.py and on-the-fly generation), and blur + PCA happen
    inside the jitted step (ops/blur.py, ops/psf.py).

The blur probability regimes match train.py:139-144 (0.75 low / 1.0 high /
0.9 default) and the LEHE sampling weights transforms.py:238-263.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

from detectinblur_tpu.ops.psf import BLUR_PARAMS, BLUR_FRACTIONS

LEHE_FRACTION_WEIGHTS = (0.0625, 0.0625, 0.0625, 0.375, 0.375)


@dataclass
class BlurPolicy:
    prob: float = 0.9
    blur_type: Optional[float] = None       # fixed param value (eval sweeps)
    blur_exposure: Optional[float] = None   # fixed fraction value
    low_exposure: bool = False
    high_exposure: bool = False
    lehe_blur_seg: bool = False

    @staticmethod
    def training_default(low: bool = False, high: bool = False) -> "BlurPolicy":
        # train.py:139-144 regime probabilities.
        prob = 0.75 if low else (1.0 if high else 0.9)
        return BlurPolicy(prob=prob, low_exposure=low, high_exposure=high)


@dataclass
class BlurDecision:
    blurring: bool
    param_index: int       # -1 when not blurring
    fraction_index: int    # -1 when negligible exposure / not blurring
    psf_index: int         # index into the (param, fraction) PSF bank


def sample_blur_decision(rng: np.random.Generator, policy: BlurPolicy,
                         bank_size: int = 12000) -> BlurDecision:
    threshold = (1 - 0.0625) if policy.lehe_blur_seg else policy.prob
    if rng.random() >= threshold:
        return BlurDecision(False, -1, -1, 0)

    if policy.blur_exposure is not None:
        diffs = np.abs(np.asarray(BLUR_FRACTIONS) - policy.blur_exposure)
        fraction_index = int(np.argmin(diffs))
        if policy.blur_exposure < 1 / 90:   # legacy negligible-exposure tag
            fraction_index = -1
    elif policy.high_exposure:
        fraction_index = int(rng.integers(3, 5))
    elif policy.low_exposure:
        fraction_index = int(rng.integers(0, 3))
    elif policy.lehe_blur_seg:
        fraction_index = int(rng.choice(5, p=LEHE_FRACTION_WEIGHTS))
    else:
        fraction_index = int(rng.integers(0, 5))

    if policy.blur_type is not None:
        diffs = np.abs(np.asarray(BLUR_PARAMS) - policy.blur_type)
        param_index = int(np.argmin(diffs))
    else:
        param_index = int(rng.integers(0, len(BLUR_PARAMS)))

    return BlurDecision(True, param_index, fraction_index,
                        int(rng.integers(0, bank_size)))


def generate_psf_bank(
    key,
    bank_size: int = 256,
    params: Tuple[float, ...] = BLUR_PARAMS,
    fractions: Tuple[float, ...] = BLUR_FRACTIONS,
    iters: int = 2000,
    batch: int = 64,
    center: bool = True,
):
    """On-device PSF bank: [P, F, bank_size, 128, 128] float32.

    One vmapped sweep replaces generate_PSFs.py's 12-process CPU grind; at
    bank_size=12000 this reproduces the reference's stored-PSF setup, and a
    fresh bank per epoch reproduces on-the-fly generation distributionally.
    ``center=False`` keeps PSFs uncentered (--dont_center_psf).
    """
    import jax
    import jax.numpy as jnp

    from detectinblur_tpu.ops.psf import sample_psf

    out = np.empty((len(params), len(fractions), bank_size, 128, 128), np.float32)
    gen = jax.jit(
        jax.vmap(lambda k, p, f: sample_psf(k, expl=p, fraction=f, iters=iters,
                                            center=center)),
        static_argnames=(),
    )
    keys = jax.random.split(key, len(params) * len(fractions) * bank_size)
    idx = 0
    for pi, p in enumerate(params):
        for fi, f in enumerate(fractions):
            for start in range(0, bank_size, batch):
                n = min(batch, bank_size - start)
                kb = keys[idx : idx + n]
                idx += n
                chunk = gen(kb, jnp.full((n,), p), jnp.full((n,), f))
                out[pi, fi, start : start + n] = np.asarray(chunk)
    return out


def load_psf_bank(
    directory: str,
    bank_size: Optional[int] = None,
    n_params: int = 3,
    n_fractions: int = 5,
    max_bank: int = 2048,
    epoch: int = 0,
) -> np.ndarray:
    """Load a stored PSF bank from the reference's on-disk layout
    (--use_stored_psfs --stored_psf_directory): folders ``P{1-3}E{0-4}``
    (generate_PSFs.py:69: ``"P"+str(paramIndex+1)+"E"+str(fractionIndex)``)
    of fp16 ``I{idx:06d}`` files written extensionless via np.save on an
    open handle (generate_PSFs.py:88-90); ``.npy``-suffixed files are
    accepted too. PSFs are center-cropped 256 -> 128 exactly as the
    BlurImage transform does (transforms.py:306-309). Returns
    [P, F, n, 128, 128] float32.

    ``bank_size=None`` autodetects the smallest per-folder count. The bank
    lives in device HBM (the reference loads one PSF per image lazily from
    loader workers), so it is stride-subsampled to at most ``max_bank`` per
    bin — the full 12000/bin reference set would be 11.8 GB. ``epoch``
    offsets the stride sampling (epoch % stride), so reloading per epoch
    walks disjoint slices and training over many epochs sees the FULL
    reference bank (transforms.py:298-309 draws from all 12000/bin) at the
    same HBM footprint."""
    import os

    if bank_size is None:
        counts = []
        for pi in range(n_params):
            for fi in range(n_fractions):
                folder = os.path.join(directory, f"P{pi + 1}E{fi}")
                if not os.path.isdir(folder):
                    raise FileNotFoundError(
                        f"stored PSF bank folder missing: {folder}")
                counts.append(sum(1 for f_ in os.listdir(folder)
                                  if f_.startswith("I")))
        bank_size = min(counts)
        if bank_size == 0:
            raise FileNotFoundError(f"no PSF files under {directory}/P*E*")
    take = min(bank_size, max_bank)
    stride = max(1, bank_size // take)
    offset = epoch % stride
    indices = list(range(offset, offset + stride * take, stride))[:take]

    out = np.zeros((n_params, n_fractions, take, 128, 128), np.float32)
    for pi in range(n_params):
        for fi in range(n_fractions):
            folder = os.path.join(directory, f"P{pi + 1}E{fi}")
            for j, i in enumerate(indices):
                path = os.path.join(folder, f"I{i:06d}")
                if not os.path.exists(path):
                    path += ".npy"
                if not os.path.exists(path):
                    raise FileNotFoundError(
                        f"stored PSF bank incomplete: {path} "
                        f"(expected {bank_size} PSFs per P*E* folder)")
                psf = np.load(path).astype(np.float32)
                if psf.shape[0] > 128:   # 256-canvas files: central crop
                    o = (psf.shape[0] - 128) // 2
                    psf = psf[o:o + 128, o:o + 128]
                out[pi, fi, j] = psf
    return out
