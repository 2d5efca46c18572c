#!/usr/bin/env python
"""Quick-train entry with lite defaults (reference: main_lite.py:67-78:
5000 steps, 3x lr, 10 saves)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from season_nerf_tpu.cli import main_lite

if __name__ == "__main__":
    main_lite()
