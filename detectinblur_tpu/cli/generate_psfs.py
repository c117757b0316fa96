"""PSF bank pre-generation CLI (generate_PSFs.py equivalent — including the
fix for its NameError on `path`, generate_PSFs.py:69,75).

Writes fp16 npy-format files P{p}E{e}/I{idx:06d} — extensionless, exactly
like the reference's ``open(filePath,'wb'); np.save(f, ...)``
(generate_PSFs.py:88-91) so banks interoperate both ways
(transforms.py:301-309 loads the same names) — but generates on-device
with one vmapped sweep instead of 12 sliced CPU processes."""

from __future__ import annotations

import argparse
import os
import time

import jax
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--output_path", required=True)
    p.add_argument("--num_psfs", type=int, default=12000)
    p.add_argument("--slice_index", type=int, default=0)
    p.add_argument("--num_workers", type=int, default=1)
    p.add_argument("--canvas", type=int, default=256)
    p.add_argument("--max_len", type=float, default=96.0)
    p.add_argument("--crop", type=int, default=128,
                   help="store the centered central crop (0 = full canvas)")
    p.add_argument("--batch", type=int, default=128)
    args = p.parse_args(argv)

    from detectinblur_tpu.ops.psf import BLUR_PARAMS, BLUR_FRACTIONS, sample_psf
    import jax.numpy as jnp

    per = args.num_psfs // args.num_workers
    start_idx = args.slice_index * per
    gen = jax.jit(jax.vmap(
        lambda k, pp, ff: sample_psf(
            k, expl=pp, fraction=ff, canvas=args.canvas, max_len=args.max_len,
            crop_to=args.crop or None)
    ))

    key = jax.random.key(1337 * (args.slice_index + 1))
    t0 = time.perf_counter()
    for pi, param in enumerate(BLUR_PARAMS, start=1):
        for fi, fraction in enumerate(BLUR_FRACTIONS):
            folder = os.path.join(args.output_path, f"P{pi}E{fi}")
            os.makedirs(folder, exist_ok=True)
            for off in range(0, per, args.batch):
                n = min(args.batch, per - off)
                key, sub = jax.random.split(key)
                keys = jax.random.split(sub, n)
                bank = np.asarray(gen(keys, jnp.full((n,), param),
                                      jnp.full((n,), fraction)), np.float16)
                for j in range(n):
                    idx = start_idx + off + j
                    # Extensionless, like the reference (np.save on an open
                    # handle, generate_PSFs.py:88-90) so banks interoperate.
                    with open(os.path.join(folder, f"I{idx:06d}"), "wb") as f:
                        np.save(f, bank[j], allow_pickle=False)
            print(f"P{pi}E{fi}: {per} PSFs in {time.perf_counter() - t0:.1f}s")


if __name__ == "__main__":
    main()
