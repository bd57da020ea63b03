#!/usr/bin/env python
"""HTTP inference-server entry point (see neko_tpu/serving/server.py)."""
from neko_tpu.cli.serve import main

if __name__ == "__main__":
    main()
