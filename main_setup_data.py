#!/usr/bin/env python
"""Unpack DFC2019 Track-3 zips + Data.zip into the IO layout
(reference: main_setup_data.py).

Accepts both the reference flag names (main_setup_data.py:11-16:
--path_to_zip, --Season_NeRF_Outputs, --code_data_path) and the shorter
aliases (--zip_dir, --IO_Location).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from season_nerf_tpu.cli import setup_data

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--zip_dir", "--path_to_zip", dest="zip_dir",
                   required=True,
                   help="folder containing the downloaded DFC2019 zips")
    p.add_argument("--IO_Location", "--Season_NeRF_Outputs",
                   dest="IO_Location", default="./io",
                   help="folder to hold assets for and outputs of main.py")
    p.add_argument("--code_data_path", default=None,
                   help="folder holding the repo's Data.zip (cached RPCs + "
                        "testing-region lists); defaults to --zip_dir, then "
                        "this repo's directory")
    args = p.parse_args()
    out = setup_data(args.zip_dir, args.IO_Location,
                     code_data_path=args.code_data_path)
    print("images unpacked to", out)
