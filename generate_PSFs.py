#!/usr/bin/env python
"""Root CLI wrapper: PSF bank pre-generation (reference generate_PSFs.py surface)."""
from detectinblur_tpu.cli.generate_psfs import main

if __name__ == "__main__":
    main()
