#!/usr/bin/env python
"""Root CLI wrapper: detectinblur-tpu evaluation (reference evaluate.py surface)."""
from detectinblur_tpu.cli.evaluate import main

if __name__ == "__main__":
    main()
