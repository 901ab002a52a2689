"""Run-directory IO: timestamped tee logger, flushed CSV writers, and the
spectra-bin store.

Mirrors the reference's four output channels per run directory
(src/Simulation.jl:49-73): ``simulation.log`` (append, timestamped, tee'd
to stdout), ``observables.csv`` (one row per sweep, flushed),
``transport.csv``, and the binned spectra store — JLD2 in the reference,
an incrementally-rewritten ``spectra_bins.npz`` here (same group/key
layout: ``sweep_<i>/{opt_cond,dos,dos_AN,A_k0,count}``).
"""

from __future__ import annotations

import datetime
import json
import os

import numpy as np

#: exact reference CSV headers (src/Simulation.jl:71-73)
OBS_HEADER = ("Sweep,Accepted,dH,Energy,Delta_Amp,Delta_Loc,Delta_Glob,"
              "S_Delta,Hole_p,Delta_Diff,Delta_Pair,Delta_LocalPair")
TRANS_HEADER = "Sweep,Superfluid_Stiffness,DC_Conductivity"


class TeeLogger:
    """Timestamped log lines to ``simulation.log`` (append) + stdout
    (src/Simulation.jl:59-67)."""

    def __init__(self, path: str, verbose: bool = True):
        self.f = open(path, "a")
        self.verbose = verbose

    def __call__(self, msg: str):
        ts = datetime.datetime.now().strftime("%Y-%m-%d %H:%M:%S")
        line = f"[{ts}] {msg}"
        self.f.write(line + "\n")
        self.f.flush()
        if self.verbose:
            print(line, flush=True)

    def close(self):
        self.f.close()


class CsvWriter:
    """Truncate-on-open CSV with per-row flush (src/Simulation.jl:55-56,166)."""

    def __init__(self, path: str, header: str):
        self.f = open(path, "w")
        self.f.write(header + "\n")
        self.f.flush()

    def row(self, *values):
        out = []
        for v in values:
            if isinstance(v, bool):
                out.append(str(int(v)))
            elif isinstance(v, (int, np.integer)):
                out.append(str(int(v)))
            else:
                out.append(f"{float(v):.6g}")
        self.f.write(",".join(out) + "\n")
        self.f.flush()

    def close(self):
        self.f.close()


class SpectraBinStore:
    """Binned spectra accumulator persisted to one .npz file.

    Equivalent of the reference's incremental JLD2 groups
    (src/Simulation.jl:181-220): arrays accumulate for ``bin_size`` heavy
    measurements, then the bin average is appended under ``sweep_<i>_*``
    keys and the file is atomically rewritten (npz has no append).
    Metadata (params dict + omega grids) is stored once at creation, like
    the reference's jldsave seed (src/Simulation.jl:89).
    """

    def __init__(self, path: str, bin_size: int, meta: dict | None = None):
        self.path = path
        self.bin_size = bin_size
        self.count = 0
        self.accum: dict[str, np.ndarray] = {}
        self.saved: dict[str, np.ndarray] = {}
        if meta:
            for k, v in meta.items():
                self.saved[f"meta_{k}"] = np.asarray(v)
        self._flush()

    def _flush(self):
        tmp = self.path + ".tmp.npz"   # .npz suffix: savez won't re-append
        np.savez(tmp, **self.saved)
        os.replace(tmp, self.path)

    def add(self, sweep_idx: int, arrays: dict[str, np.ndarray]):
        """Accumulate one heavy measurement; write the bin when full.
        Returns True if a bin was flushed at this sweep."""
        for k, v in arrays.items():
            v = np.asarray(v)
            if self.count == 0:
                self.accum[k] = v.copy()
            else:
                self.accum[k] += v
        self.count += 1
        if self.count >= self.bin_size:
            for k, v in self.accum.items():
                self.saved[f"sweep_{sweep_idx}_{k}"] = v / self.count
            self.saved[f"sweep_{sweep_idx}_count"] = np.asarray(self.count)
            self._flush()
            self.count = 0
            self.accum = {}
            return True
        return False

    # --- read side (post-processing) ---

    @staticmethod
    def load_bins(path: str) -> tuple[dict, dict[int, dict[str, np.ndarray]]]:
        """Returns (meta, {sweep_idx: {field: array}})."""
        with np.load(path) as z:
            meta = {k[len("meta_"):]: z[k] for k in z.files if k.startswith("meta_")}
            bins: dict[int, dict[str, np.ndarray]] = {}
            for k in z.files:
                if not k.startswith("sweep_"):
                    continue
                rest = k[len("sweep_"):]
                idx_str, field = rest.split("_", 1)
                bins.setdefault(int(idx_str), {})[field] = z[k]
        return meta, bins


def write_json(path: str, obj: dict):
    with open(path, "w") as f:
        json.dump(obj, f, indent=2, default=float)
