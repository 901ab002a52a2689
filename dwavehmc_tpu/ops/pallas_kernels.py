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
    if not interpret and not on_tpu():
        interpret = True          # CPU oracles run the same f32 tile math
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


#: rotation-construction kernel tile (f32-legal: sublane mult of 8,
#: lane 128)
_ROT_TM = 128
_ROT_TN = 128


def _rot_s_kernel(tr_ref, ti_ref, drow_ref, dcol_ref, smax_ref,
                  sr_ref, si_ref):
    """One (TM, TN) tile of the damped Jacobi generator S:

        gap   = d[col] − d[row]
        θ     = min(½·atan2(2|T|, |gap|), S_MAX)
        S     = (T/|T|)·θ·sign(gap)   off-diagonal, 0 on the diagonal

    — the ~8 elementwise passes of ops/tracked_eigh.rotation_matrix_parts
    fused into one VPU pass (one HBM read of T, one write of S).
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    tr = tr_ref[:]
    ti = ti_ref[:]
    d_col = drow_ref[0:1, :]                         # (1, TN): d[jTN+…]
    d_row = jnp.transpose(dcol_ref[0:1, :])          # (TM, 1): d[iTM+…]
    gap = d_col - d_row                              # d[None,:] − d[:,None]

    mag = jnp.sqrt(tr * tr + ti * ti)
    # θ = min(½·atan2(2|T|, |gap|), S_MAX) without atan2 (Mosaic has no
    # TC lowering for it): both args are ≥ 0, so atan2 = atan(r) with
    # r = 2|T|/|gap|, and since the result is clamped at S_MAX ≤ 0.15 we
    # may first clamp r at tan(2·S_MAX) and then use the odd series
    # atan(t) ≈ t − t³/3 + t⁵/5 — truncation error ≤ t⁷/7 ≤ 2e-6 on the
    # clamped domain (t ≤ tan(0.3) ≈ 0.31), far below f32 relevance for
    # a deliberately damped rotation angle.
    smax = smax_ref[0]
    r_cap = smax_ref[1]          # tan(2·S_MAX), computed outside (no
    #                              transcendentals inside the kernel)
    r = 2.0 * mag / jnp.maximum(jnp.abs(gap), 1e-30)
    t = jnp.minimum(r, r_cap)
    t2 = t * t
    theta = 0.5 * t * (1.0 - t2 * (1.0 / 3.0 - t2 * 0.2))
    theta = jnp.minimum(theta, smax)
    inv = 1.0 / jnp.maximum(mag, 1e-30)
    ok = mag > 1e-30
    pr = jnp.where(ok, tr * inv, 0.0)
    pi_ = jnp.where(ok, ti * inv, 0.0)

    rows = (jax.lax.broadcasted_iota(jnp.int32, tr.shape, 0)
            + i * tr.shape[0])
    cols = (jax.lax.broadcasted_iota(jnp.int32, tr.shape, 1)
            + j * tr.shape[1])
    coef = (theta * jnp.sign(gap + 1e-30)
            * (rows != cols).astype(tr.dtype))
    sr_ref[:] = pr * coef
    si_ref[:] = pi_ * coef


@functools.partial(jax.jit, static_argnames=("smax", "interpret"))
def rotation_s_parts(tr, ti, d, smax, *, interpret=False):
    """Fused rotation-generator construction (see _rot_s_kernel).

    tr/ti: (n, n) f32 projected matrix parts, d: (n,) diagonal.
    Returns (sr, si).  n is padded to the 128-tile internally; padded
    entries never reach the output slice.
    """
    dtype = jnp.float32
    if not interpret and not on_tpu():
        interpret = True          # CPU tests/oracles run interpreted
    n = d.shape[0]
    tr = tr.astype(dtype)
    ti = ti.astype(dtype)
    pad = (-n) % _ROT_TM
    npad = n + pad
    if pad:
        tr = jnp.pad(tr, ((0, pad), (0, pad)))
        ti = jnp.pad(ti, ((0, pad), (0, pad)))
    # d replicated to a (8, npad) strip: a (TM, 1)-shaped block is not a
    # legal f32 tile, so both orientations read from sublane row 0 of a
    # lane-major strip (the column orientation transposes in-kernel)
    d_strip = jnp.broadcast_to(
        jnp.pad(d.astype(dtype), (0, pad))[None, :], (8, npad))

    grid = (npad // _ROT_TM, npad // _ROT_TN)
    sr, si = pl.pallas_call(
        _rot_s_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_ROT_TM, _ROT_TN), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROT_TM, _ROT_TN), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, _ROT_TN), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, _ROT_TM), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((_ROT_TM, _ROT_TN), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROT_TM, _ROT_TN), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((npad, npad), dtype),
            jax.ShapeDtypeStruct((npad, npad), dtype),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=14 * npad * npad,
            bytes_accessed=4 * 4 * npad * npad,
            transcendentals=npad * npad,
        ),
    )(tr, ti, d_strip, d_strip,
      jnp.asarray([smax, np.tan(2.0 * float(smax))], dtype))
    if pad:
        sr, si = sr[:n, :n], si[:n, :n]
    return sr, si


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
