#!/usr/bin/env python
"""Root CLI wrapper: blur-estimator training (reference train_blur_estimator.py surface)."""
from detectinblur_tpu.cli.train_blur_estimator import main

if __name__ == "__main__":
    main()
