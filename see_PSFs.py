#!/usr/bin/env python
"""Sanity-check stored PSFs: nonzero support must fit in the central 128x128
window (reference see_PSFs.py:5-22 behavior)."""
import argparse
import glob
import os

import numpy as np

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--psf_directory", required=True)
    p.add_argument("--limit", type=int, default=100)
    args = p.parse_args()
    bad = 0
    files = sorted(glob.glob(os.path.join(args.psf_directory, "**", "I*.npy"),
                             recursive=True))[: args.limit]
    for f in files:
        psf = np.load(f).astype(np.float32)
        ys, xs = np.nonzero(psf > 0)
        c = psf.shape[0]
        lo, hi = c // 2 - 64, c // 2 + 64
        if len(ys) and (ys.min() < lo or ys.max() >= hi or xs.min() < lo or xs.max() >= hi):
            bad += 1
            print(f"{f}: support exceeds central 128 window")
    print(f"checked {len(files)} PSFs, {bad} bad")
