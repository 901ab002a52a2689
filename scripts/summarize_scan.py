#!/usr/bin/env python
"""Aggregate per-point observables/transport CSVs of a scan into one
summary_all.csv (rebuild of scripts/batch_csv_summary_{T,beta}.jl).

Usage: python scripts/summarize_scan.py SCAN_ROOT --prefix T_ --name T
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dwavehmc_tpu.drivers.postprocess import summarize_scan


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("root")
    p.add_argument("--prefix", default="T_")
    p.add_argument("--name", default="T")
    ns = p.parse_args()
    print("wrote", summarize_scan(ns.root, ns.prefix, ns.name))


if __name__ == "__main__":
    main()
