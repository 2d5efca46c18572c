#!/usr/bin/env python
"""Unpack DFC2019 Track-3 zips + Data.zip into the IO layout
(reference: main_setup_data.py)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from season_nerf_tpu.cli import setup_data

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--zip_dir", required=True)
    p.add_argument("--IO_Location", default="./io")
    args = p.parse_args()
    out = setup_data(args.zip_dir, args.IO_Location)
    print("images unpacked to", out)
