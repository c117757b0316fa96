#!/usr/bin/env python
"""Root CLI wrapper: detectinblur-tpu training (reference train.py surface)."""
from detectinblur_tpu.cli.train import main

if __name__ == "__main__":
    main()
