#!/usr/bin/env python
"""Post-process spectra bins of one run or a whole scan tree
(rebuilds of scripts/process_spectra.jl + batch_process_spectra.jl).

Usage:
  python scripts/process_spectra.py RUN_DIR            # one run
  python scripts/process_spectra.py SCAN_ROOT --batch [--pattern 'T_*']
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dwavehmc_tpu.drivers.postprocess import (
    batch_process_spectra,
    process_spectra,
)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("path")
    p.add_argument("--batch", action="store_true")
    p.add_argument("--pattern", default="*")
    ns = p.parse_args()
    if ns.batch:
        res = batch_process_spectra(ns.path, ns.pattern)
        for d in res["processed"]:
            print("processed", d)
        for d, err in res["failed"].items():
            print("FAILED", d, err)
    else:
        info = process_spectra(ns.path)
        print(f"processed {ns.path}: {info['n_bins']} bins")


if __name__ == "__main__":
    main()
