"""Pre-artifact quick-suite gate.

Round-3's failure mode was committing artifacts while the test suite was
red.  Scripts that produce committed artifacts call ``run_quick_suite()``
before doing any real work: it runs the ``-m quick`` pytest tier (~75 s,
CPU-only — the subprocess env pins the CPU backend so a TPU session in the
calling process is never disturbed) and refuses to proceed on failure.

Skip with ``SKIP_QUICK_TESTS=1`` (e.g. mid-debug or on resume of a run
that already passed the gate).
"""

from __future__ import annotations

import os
import subprocess
import sys


def run_quick_suite(repo_root: str | None = None) -> None:
    """Run ``pytest -m quick`` in a CPU-pinned subprocess; SystemExit on red.

    Call this at the top of artifact-producing scripts, before claiming
    the TPU.  No-op when SKIP_QUICK_TESTS=1.
    """
    if os.environ.get("SKIP_QUICK_TESTS", "0") == "1":
        print("[quickcheck] SKIP_QUICK_TESTS=1 — skipping quick tier",
              file=sys.stderr)
        return
    if repo_root is None:
        repo_root = os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
    env = dict(os.environ)
    # keep the subprocess off the tunneled TPU worker (see CLAUDE.md)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    print("[quickcheck] running quick test tier (pytest -m quick) ...",
          file=sys.stderr)
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-m", "quick", "-q",
         "--no-header", "-x"],
        cwd=repo_root, env=env)
    if proc.returncode != 0:
        sys.exit("[quickcheck] quick test tier FAILED — refusing to "
                 "produce artifacts from a red tree "
                 "(SKIP_QUICK_TESTS=1 to override)")
    print("[quickcheck] quick tier green", file=sys.stderr)
