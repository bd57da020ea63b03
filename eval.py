#!/usr/bin/env python
"""Evaluation entry point (same CLI surface as the reference eval.py)."""
from neko_tpu.cli.evaluate import main

if __name__ == "__main__":
    main()
