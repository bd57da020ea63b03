#!/usr/bin/env python
"""Training entry point (same CLI surface as the reference train.py)."""
from neko_tpu.cli.train import main

if __name__ == "__main__":
    main()
