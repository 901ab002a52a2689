"""Backend selection helpers.

This container ships a ``sitecustomize`` hook that registers the TPU
backend and pins ``JAX_PLATFORMS=axon`` in every interpreter, so a plain
environment variable is not enough to run on CPU — the config flag must be
forced after import, before first device use.  The float64 oracle path is
CPU-only: TPU rejects complex128 outright ("Element type C128 is not
supported on TPU").
"""

from __future__ import annotations

import os
import re


def force_platform(name: str | None, min_devices: int = 8):
    """Force the jax backend ("cpu" / "tpu" / None = leave as configured).

    Must be called before any jax device use.  For "cpu" also exposes at
    least ``min_devices`` virtual host devices so mesh code paths stay
    testable (an externally supplied
    ``--xla_force_host_platform_device_count`` is respected when it is
    already large enough).
    """
    if not name:
        return
    os.environ["JAX_PLATFORMS"] = name
    if name == "cpu":
        flags = os.environ.get("XLA_FLAGS", "")
        m = re.search(r"--xla_force_host_platform_device_count=(\d+)", flags)
        if m is None or int(m.group(1)) < min_devices:
            if m is not None:
                flags = flags.replace(m.group(0), "").strip()
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count="
                        f"{min_devices}").strip()
    import jax

    jax.config.update("jax_platforms", name)


def add_platform_arg(parser):
    parser.add_argument("--platform", default=None,
                        choices=(None, "cpu", "tpu"),
                        help="force jax backend (cpu enables the float64 "
                             "oracle path; TPU has no complex128)")
    return parser
