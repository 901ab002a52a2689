#!/usr/bin/env python
"""Merge re-run scan points into an existing scan artifact.

The flagship scan artifacts (examples/T_scan_full_24x24,
examples/beta_scan_full_12x12) are refreshed point-by-point when a
subset is re-run under improved settings (e.g. the cold tail under the
host-f64 Metropolis readout + β-ladder warm start) — the vectorized
scan's point-skip story for targeted re-measurement.  This tool:

 1. copies each ``<param>_<value>`` point directory from the donor run
    over the matching directory in the target artifact,
 2. regenerates ``summary_all.csv`` from the merged per-point CSVs,
 3. merges ``therm_health.json`` (donor wins for its points),
 4. records per-point provenance (which run + readout produced each
    point) in ``provenance.json`` so the artifact states which readout
    measured which point (VERDICT r3 item 4).

Usage:
  python scripts/merge_scan_points.py --target examples/T_scan_full_24x24 \
      --donor examples/T_scan_cold_host_24x24 --param T --note host_readout
"""

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dwavehmc_tpu.drivers.postprocess import summarize_scan


def load_json(path):
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {}


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--target", required=True)
    p.add_argument("--donor", required=True)
    p.add_argument("--param", default="T", help="scan parameter prefix")
    p.add_argument("--note", required=True,
                   help="provenance note for the merged points, e.g. "
                        "'host_readout + beta-ladder warm start'")
    ns = p.parse_args()
    prefix = ns.param + "_"

    donor_pts = sorted(d for d in os.listdir(ns.donor)
                       if d.startswith(prefix)
                       and os.path.isdir(os.path.join(ns.donor, d)))
    if not donor_pts:
        sys.exit(f"no {prefix}* point dirs in {ns.donor}")

    target_pts = {d for d in os.listdir(ns.target) if d.startswith(prefix)}
    for d in donor_pts:
        if d not in target_pts:
            sys.exit(f"donor point {d} has no counterpart in {ns.target} "
                     "(grid mismatch — refusing to add new points)")

    donor_cfg = load_json(os.path.join(ns.donor, "scan_config.json"))
    prov = load_json(os.path.join(ns.target, "provenance.json"))
    points = prov.setdefault("points", {})
    for d in donor_pts:
        src, dst = os.path.join(ns.donor, d), os.path.join(ns.target, d)
        # stage the donor copy next to the target first so a mid-copy
        # failure can never destroy the target point dir, then swap
        tmp = dst + ".merge_tmp"
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        shutil.copytree(src, tmp)
        # files present only in the target (e.g. processed_*.csv spectra
        # outputs) would vanish in the swap; they describe the REPLACED
        # data, so carrying them over would silently mislabel old results
        # — warn that they must be regenerated instead
        donor_files = set(os.listdir(src))
        lost = sorted(f for f in os.listdir(dst) if f not in donor_files)
        if lost:
            print(f"WARNING: {d}: target-only files dropped by merge "
                  f"(regenerate from the new bins): {', '.join(lost)}",
                  file=sys.stderr)
        shutil.rmtree(dst)
        os.rename(tmp, dst)
        points[d] = {
            "source": ns.donor,
            "note": ns.note,
            "metropolis_readout": donor_cfg.get("metropolis_readout"),
            "anneal_stages": donor_cfg.get("anneal_stages"),
        }
        print(f"merged {d}", file=sys.stderr)
    prov.setdefault(
        "default",
        "points not listed here are from the original scan run "
        "(device-f32 Metropolis readout, cold start)")

    th_t = load_json(os.path.join(ns.target, "therm_health.json"))
    th_d = load_json(os.path.join(ns.donor, "therm_health.json"))
    for d in donor_pts:
        if d in th_d:
            th_t[d] = th_d[d]
    with open(os.path.join(ns.target, "therm_health.json"), "w") as f:
        json.dump(th_t, f, indent=1)
    with open(os.path.join(ns.target, "provenance.json"), "w") as f:
        json.dump(prov, f, indent=1)

    out = summarize_scan(ns.target, prefix, ns.param)
    print(f"summary regenerated: {out}")


if __name__ == "__main__":
    main()
