"""Split tracked segment (two programs per sweep) must reproduce the
single-program tracked segment exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from dwavehmc_tpu import LatticeSpec, calc_optimal_dt, make_params
from dwavehmc_tpu.parallel.ensemble import (
    init_ensemble_real,
    run_segment_real_jit,
    run_segment_tracked,
)

LAT = LatticeSpec(4, 4)


def test_split_equals_fused_tracked_segment():
    params = make_params(W=0.5, n_imp=0.25, beta=10.0, J=1.0,
                         dtype=jnp.float64)
    states0 = init_ensemble_real(LAT, params, jax.random.PRNGKey(2), 3,
                                 dtype=jnp.float64, n_imp=0.25)
    Nt = 4
    dt = calc_optimal_dt(10.0, 1.0, 1.0, Nt)

    s1, seg1 = run_segment_real_jit(LAT, params, states0, 4, Nt, dt,
                                    True, None, None, "tracked", 6)
    s2, seg2 = run_segment_tracked(LAT, params, states0, 4, Nt, dt,
                                   True, None, None, 6)

    np.testing.assert_array_equal(np.asarray(seg1.accepted),
                                  np.asarray(seg2.accepted))
    np.testing.assert_allclose(np.asarray(seg1.dH), np.asarray(seg2.dH),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(s1.delta_re),
                               np.asarray(s2.delta_re), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(seg1.observables.total_energy),
        np.asarray(seg2.observables.total_energy), rtol=1e-10)


def test_split_per_chain_dt():
    params = make_params(W=0.0, n_imp=0.0, beta=5.0, J=1.0,
                         dtype=jnp.float64)
    states = init_ensemble_real(LAT, params, jax.random.PRNGKey(1), 2,
                                dtype=jnp.float64, n_imp=0.0)
    dts = jnp.asarray([0.03, 0.05])
    states, seg = run_segment_tracked(LAT, params, states, 2, 3, dts,
                                      True, None, 0, 6)
    assert seg.accepted.shape == (2, 2)
    assert np.all(np.isfinite(np.asarray(seg.dH)))


def test_block_runner_matches_per_sweep_cadence():
    """The block-fused cheap-anchor runner (one program per K sweeps) must
    reproduce the per-sweep dispatch loop exactly: cheap accepts at sweeps
    1..K-1, exact anchor at sweep K."""
    from dwavehmc_tpu.parallel.ensemble import (
        _tracked_accept_jit, _tracked_leapfrog_jit,
    )

    params = make_params(W=0.5, n_imp=0.25, beta=10.0, J=1.0,
                         dtype=jnp.float64)
    states0 = init_ensemble_real(LAT, params, jax.random.PRNGKey(5), 2,
                                 dtype=jnp.float64, n_imp=0.25)
    Nt, K, n_sweeps = 3, 2, 4
    dt = calc_optimal_dt(10.0, 1.0, 1.0, Nt)

    s_blk, seg_blk = run_segment_tracked(states=states0, lat=LAT,
                                         params=params, n_sweeps=n_sweeps,
                                         Nt=Nt, dt=dt, tracked_iters=4,
                                         anchor_every=K, refine_iters=8,
                                         polish_iters=3)

    # reference: explicit per-sweep loop with the same cadence
    states = states0
    accs, dHs = [], []
    for i in range(n_sweeps):
        anchored = (i + 1) % K == 0
        prop = _tracked_leapfrog_jit(LAT, params, states, Nt, dt, 4,
                                     None, None, 0 if anchored else 8,
                                     0 if anchored else 3)
        states, info, _ = _tracked_accept_jit(LAT, params, states, prop,
                                              True, None, not anchored)
        accs.append(np.asarray(info.accepted))
        dHs.append(np.asarray(info.dH))

    np.testing.assert_array_equal(np.asarray(seg_blk.accepted),
                                  np.stack(accs))
    np.testing.assert_allclose(np.asarray(seg_blk.dH), np.stack(dHs),
                               rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.asarray(s_blk.delta_re),
                               np.asarray(states.delta_re), atol=1e-12)
    np.testing.assert_allclose(np.asarray(s_blk.evals),
                               np.asarray(states.evals), atol=1e-12)


def test_chunked_blocks_match_single_block():
    """Splitting a long anchor interval into several bounded programs
    (max_fused) must reproduce the single-block run exactly: the chunk
    boundary adds no physics — only a program boundary.  (Long single
    programs trip the remote worker's execution watchdog at production
    shapes, so the production path always chunks.)"""
    params = make_params(W=0.5, n_imp=0.25, beta=10.0, J=1.0,
                         dtype=jnp.float64)
    states0 = init_ensemble_real(LAT, params, jax.random.PRNGKey(7), 2,
                                 dtype=jnp.float64, n_imp=0.25)
    Nt, n_sweeps = 3, 7
    dt = calc_optimal_dt(10.0, 1.0, 1.0, Nt)

    kw = dict(measure=True, params_axis=None, dt_axis=None,
              tracked_iters=4, anchor_every=7, refine_iters=8,
              polish_iters=3)
    s_one, seg_one = run_segment_tracked(LAT, params, states0, n_sweeps,
                                         Nt, dt, max_fused=8, **kw)
    s_chk, seg_chk = run_segment_tracked(LAT, params, states0, n_sweeps,
                                         Nt, dt, max_fused=2, **kw)

    np.testing.assert_array_equal(np.asarray(seg_one.accepted),
                                  np.asarray(seg_chk.accepted))
    np.testing.assert_allclose(np.asarray(seg_one.dH),
                               np.asarray(seg_chk.dH),
                               rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.asarray(s_one.delta_re),
                               np.asarray(s_chk.delta_re), atol=1e-12)
    np.testing.assert_allclose(np.asarray(s_one.evals),
                               np.asarray(s_chk.evals), atol=1e-12)


def test_bf16_rotation_dtype_runs_and_stays_finite():
    """bf16-storage rotations (rot_dtype) must run end-to-end with finite
    dH and a basis cast back to the carry dtype; on CPU f32 the physics
    should stay close to the f32 path (bf16 floors only bind on-TPU)."""
    params = make_params(W=0.5, n_imp=0.25, beta=10.0, J=1.0,
                         dtype=jnp.float32)
    states0 = init_ensemble_real(LAT, params, jax.random.PRNGKey(9), 2,
                                 dtype=jnp.float32, n_imp=0.25)
    Nt = 3
    dt = calc_optimal_dt(10.0, 1.0, 1.0, Nt)
    s, seg = run_segment_tracked(LAT, params, states0, 4, Nt, dt,
                                 True, None, None, 6, 2, 8, 3, 2,
                                 jnp.bfloat16)
    assert s.delta_re.dtype == jnp.float32
    assert s.evals.dtype == jnp.float32
    assert np.all(np.isfinite(np.asarray(seg.dH)))
    assert np.asarray(seg.accepted).shape == (4, 2)


def test_program_step_budget_counts_anchor_leapfrog(monkeypatch):
    """Watchdog budget: no device program may contain more than ~54 total
    leapfrog steps, INCLUDING the anchor sweep's leapfrog fused into the
    final block of each anchor interval (ADVICE r2: at Nt=40 the old cap
    emitted an 80-step final program, beyond any validated margin)."""
    import dwavehmc_tpu.parallel.ensemble as ens

    calls = []
    real_block = ens._tracked_block_jit

    def spy(lat, params, states, n_cheap, Nt, dt, *args, **kw):
        # *args/**kw passthrough: a positionally-enumerated spy goes
        # stale every time the block runner grows a knob (this exact
        # test broke that way in r3 AND r5) — only the spied-on fields
        # are named
        final_leapfrog = args[8] if len(args) > 8 else kw.get(
            "final_leapfrog", True)
        calls.append((n_cheap, Nt, final_leapfrog))
        return real_block(lat, params, states, n_cheap, Nt, dt, *args,
                          **kw)

    monkeypatch.setattr(ens, "_tracked_block_jit", spy)

    params = make_params(W=0.5, n_imp=0.25, beta=10.0, J=1.0,
                         dtype=jnp.float64)
    states0 = init_ensemble_real(LAT, params, jax.random.PRNGKey(9), 1,
                                 dtype=jnp.float64, n_imp=0.25)

    # large Nt (thermalization-style): anchor leapfrog must run alone
    Nt = 40
    dt = calc_optimal_dt(10.0, 1.0, 1.0, Nt)
    run_segment_tracked(LAT, params, states0, 4, Nt, dt, False, None, None,
                        2, anchor_every=2, refine_iters=2, polish_iters=1)
    assert calls, "block runner never used"
    for n_cheap, nt, final in calls:
        steps = (n_cheap + (1 if final else 0)) * nt
        assert steps <= 54, (n_cheap, nt, final)

    # moderate Nt with a long anchor interval: every program (including the
    # final fused block) stays within the 54-step margin
    calls.clear()
    Nt = 6
    dt = calc_optimal_dt(10.0, 1.0, 1.0, Nt)
    run_segment_tracked(LAT, params, states0, 12, Nt, dt, False, None, None,
                        2, anchor_every=12, refine_iters=2, polish_iters=1)
    for n_cheap, nt, final in calls:
        steps = (n_cheap + (1 if final else 0)) * nt
        assert steps <= 54, (n_cheap, nt, final)
    assert sum(c for c, _, _ in calls) == 11   # 11 cheap + 1 anchored


def test_polish_precision_plumbing_matches_on_cpu():
    """polish_precision="high" (3-pass polish rotations) must flow through
    the block runner; on CPU matmul precision flags are no-ops so the
    result must equal the "highest" default exactly — this pins the
    plumbing (wrong wiring, e.g. into the readout or the refine phase,
    would still pass on CPU, but missing/shifted static args crash or
    change cadence)."""
    params = make_params(W=0.5, n_imp=0.25, beta=10.0, J=1.0,
                         dtype=jnp.float64)
    states0 = init_ensemble_real(LAT, params, jax.random.PRNGKey(5), 2,
                                 dtype=jnp.float64, n_imp=0.25)
    Nt = 3
    dt = calc_optimal_dt(10.0, 1.0, 1.0, Nt)

    def run(pp):
        return run_segment_tracked(LAT, params, states0, 6, Nt, dt,
                                   True, None, None, 6, 3, 6, 4, 2, None,
                                   8, "qdwh", pp)

    s_hi, seg_hi = run("highest")
    s_h3, seg_h3 = run("high")
    np.testing.assert_array_equal(np.asarray(seg_hi.accepted),
                                  np.asarray(seg_h3.accepted))
    np.testing.assert_allclose(np.asarray(seg_hi.dH),
                               np.asarray(seg_h3.dH), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(s_hi.delta_re),
                               np.asarray(s_h3.delta_re), atol=1e-14)


def test_leapfrog_unroll_equivalence():
    """unroll=Nt is a pure scheduling change: same trajectory, same
    decisions as the default rolled scan."""
    import jax
    import numpy as np

    from dwavehmc_tpu.models.lattice import LatticeSpec
    from dwavehmc_tpu.models.params import make_params
    from dwavehmc_tpu.parallel.ensemble import (
        init_ensemble_real,
        run_segment_tracked,
    )

    lat = LatticeSpec(4, 4)
    params = make_params(t=1.0, tp=-0.35, mu=-1.08, W=0.5, n_imp=0.25,
                         beta=8.0, J=1.0, mass=1.0, dtype=jnp.float32)
    states = init_ensemble_real(lat, params, jax.random.PRNGKey(2), 2,
                                dtype=jnp.float32, n_imp=0.25)
    s1, r1 = run_segment_tracked(lat, params,
                                 jax.tree.map(lambda x: x, states),
                                 3, 4, 0.04, measure=False,
                                 anchor_every=3, refine_iters=2,
                                 polish_iters=2, unroll=1)
    s2, r2 = run_segment_tracked(lat, params, states, 3, 4, 0.04,
                                 measure=False, anchor_every=3,
                                 refine_iters=2, polish_iters=2, unroll=4)
    np.testing.assert_array_equal(np.asarray(r1.accepted),
                                  np.asarray(r2.accepted))
    np.testing.assert_allclose(np.asarray(r1.dH), np.asarray(r2.dH),
                               rtol=0, atol=5e-4)
    np.testing.assert_allclose(np.asarray(s1.delta_re),
                               np.asarray(s2.delta_re), atol=1e-6)


def test_watchdog_chunk_caps_scale_with_shape():
    """The fused-program step budget must shrink with per-step cost
    (∝ dim³·batch): the 48-step cap validated at 24×24/b64 is ~4.2× the
    safe device time at 32×32/b48 (observed worker kernel-fault)."""
    from dwavehmc_tpu.parallel.ensemble import _watchdog_chunk_caps

    # validated shape: unchanged semantics (8 cheap/program, 8 with anchor)
    assert _watchdog_chunk_caps(576, 64, 6) == (8, 8)
    # 32×32/b48: ~4.2× per-step cost → at most 1 cheap sweep per program
    mc, af = _watchdog_chunk_caps(1024, 48, 6)
    assert mc * 6 * (1024 / 576) ** 3 * (48 / 64) <= 54
    assert (af + 1) * 6 * (1024 / 576) ** 3 * (48 / 64) <= 60
    # smaller-than-validated shapes never fuse beyond max_fused
    assert _watchdog_chunk_caps(144, 72, 6) == (8, 8)
    # large Nt: the anchor leapfrog runs as its own program
    assert _watchdog_chunk_caps(576, 64, 40)[1] == 0


def test_chunked_init_matches_full_init():
    """init_chunk bounds the per-program QDWH workspace (a (48,4096,4096)
    init eigh RESOURCE_EXHAUSTs a 16 GiB chip whose steady-state segments
    fit) and must be bit-identical to the single-program init."""
    params = make_params(W=0.5, n_imp=0.25, beta=5.0, J=1.0,
                         dtype=jnp.float32)
    a = init_ensemble_real(LAT, params, jax.random.PRNGKey(3), 5,
                           dtype=jnp.float32, n_imp=0.25)
    b = init_ensemble_real(LAT, params, jax.random.PRNGKey(3), 5,
                           dtype=jnp.float32, n_imp=0.25, init_chunk=2)
    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_exp2_scheme_segment_samples_validly():
    """The exp2 rotation scheme (with the fused Pallas S kernel) drives a
    full tracked segment with cheap anchors: finite dH throughout, healthy
    acceptance, identical-shape records.  The proposal differs from the
    ns scheme (different rotation algebra) — Metropolis correctness is
    scheme-independent, which is what this pins."""
    params = make_params(W=0.5, n_imp=0.25, beta=10.0, J=1.0,
                         dtype=jnp.float64)
    states0 = init_ensemble_real(LAT, params, jax.random.PRNGKey(4), 3,
                                 dtype=jnp.float64, n_imp=0.25)
    Nt = 4
    dt = calc_optimal_dt(10.0, 1.0, 1.0, Nt)

    s, seg = run_segment_tracked(LAT, params, states0, 6, Nt, dt,
                                 True, None, None, 6, anchor_every=3,
                                 refine_iters=8, polish_iters=4,
                                 ns_steps=1, rot_scheme="exp2",
                                 use_pallas_s=True)
    assert seg.dH.shape == (6, 3)
    assert np.isfinite(np.asarray(seg.dH)).all()
    assert np.asarray(seg.accepted).mean() > 0.3
    assert np.isfinite(np.asarray(s.evals)).all()
    # the carried basis stays orthonormal through the exp2 pipeline
    U = np.asarray(s.X[0]) + 1j * np.asarray(s.Y[0])
    np.testing.assert_allclose(U.conj().T @ U, np.eye(U.shape[1]),
                               atol=1e-6)
