#!/usr/bin/env python
"""Train + evaluate a Season-NeRF on one site (reference: main.py)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from season_nerf_tpu.cli import main_train

if __name__ == "__main__":
    main_train()
