"""Pallas banded-DP kernel vs lax.scan engine (interpret mode on CPU).

Marked ``slow`` wholesale: interpret-mode sweeps of the row kernel are
~14 of the suite's ~20 minutes on the 1-CPU box.  The inner loop
(``make test-quick`` / ``-m 'not slow'``) skips them; CI and ``make
test`` run everything.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import jax.numpy as jnp

from biseqt_tpu.sequence import Alphabet, pack_sequences
from biseqt_tpu.stochastics import rand_seq, MutationProcess
from biseqt_tpu.ops.banded_dp import banded_dp, ModeFlags
from biseqt_tpu.ops.pallas_dp import banded_dp_pallas

A4 = Alphabet("ACGT")

FLAG_CASES = [
    ModeFlags(),
    ModeFlags(local_start=True, local_end=True),
    ModeFlags(free_start_edges=True, free_end_edges=True),
    ModeFlags(local_end=True),            # start-anchored
    ModeFlags(local_start=True),          # end-anchored
]


@pytest.mark.parametrize("flags", FLAG_CASES)
def test_pallas_matches_lax(rng, flags):
    B = 4
    M = MutationProcess(A4, subst_probs=0.15, go_prob=0.05, ge_prob=0.2,
                        rng=rng)
    ss, ts = [], []
    for _ in range(B):
        S = rand_seq(A4, 150, rng=rng)
        T, _ = M.mutate(S)
        ss.append(S)
        ts.append(T)
    s_codes, s_lens = pack_sequences(ss, pad_to=256)
    t_codes, t_lens = pack_sequences(ts, pad_to=256)
    W = 128
    dmin = jnp.asarray([-(W // 2)] * B, jnp.int32)
    subst = np.where(np.eye(4, dtype=bool), 1.0, -1.0).astype(np.float32)
    kw = dict(W=W, subst=subst, go=-2.0, ge=-1.0, flags=flags)
    ref = banded_dp(
        jnp.asarray(s_codes), jnp.asarray(t_codes),
        jnp.asarray(s_lens), jnp.asarray(t_lens), dmin, **kw
    )
    out = banded_dp_pallas(
        jnp.asarray(s_codes), jnp.asarray(t_codes),
        jnp.asarray(s_lens), jnp.asarray(t_lens), dmin,
        interpret=True, **kw
    )
    np.testing.assert_allclose(
        np.asarray(out.score), np.asarray(ref.score), atol=1e-3
    )
    if flags == ModeFlags():  # end cell meaningful for global-like modes
        np.testing.assert_array_equal(np.asarray(out.end_i),
                                      np.asarray(ref.end_i))
        np.testing.assert_array_equal(np.asarray(out.end_j),
                                      np.asarray(ref.end_j))


def test_pallas_weff_band_leak(rng):
    """w_eff < W must forbid paths through lanes >= w_eff.

    Regression: masking only H_pre let live E values sit on dead lanes
    and re-enter via next row's F shift — a gap detour around the band
    edge that overscored (-4 vs -12 on this construction) whenever it
    beat the in-band mismatch path."""
    X = rng.integers(0, 4, 20).astype(np.int8)
    Y = rng.integers(0, 4, 20).astype(np.int8)
    Wb = rng.integers(0, 2, 20).astype(np.int8)
    Zb = (2 + rng.integers(0, 2, 20)).astype(np.int8)
    s = jnp.asarray(np.concatenate([X, Wb, Y])[None])
    t = jnp.asarray(np.concatenate([X, Zb, Y])[None])
    lens = jnp.asarray([60], jnp.int32)
    dmin = jnp.asarray([7 - 127], jnp.int32)   # live band = lanes [0, 8)
    w_eff = jnp.asarray([8], jnp.int32)
    subst = np.where(np.eye(4, dtype=bool), 1.0, -10.0).astype(np.float32)
    for flags in FLAG_CASES[:3]:
        kw = dict(W=128, subst=subst, go=-2.0, ge=-1.0, flags=flags,
                  w_eff=w_eff)
        ref = banded_dp(s, t, lens, lens, dmin, **kw)
        out = banded_dp_pallas(s, t, lens, lens, dmin, interpret=True, **kw)
        np.testing.assert_allclose(
            np.asarray(out.score), np.asarray(ref.score), atol=1e-3,
            err_msg=str(flags),
        )


def test_pallas_ragged_batch(rng):
    """Different lengths + bands per pair, non-multiple batch size."""
    B = 3
    lens = [(100, 90), (50, 70), (128, 128)]
    ss = [rand_seq(A4, a, rng=rng) for a, _ in lens]
    ts = [rand_seq(A4, b, rng=rng) for _, b in lens]
    s_codes, s_lens = pack_sequences(ss, pad_to=128)
    t_codes, t_lens = pack_sequences(ts, pad_to=128)
    W = 256
    dmin = jnp.asarray([-100, -120, -60], jnp.int32)
    w_eff = jnp.asarray([150, 200, 256], jnp.int32)
    subst = np.where(np.eye(4, dtype=bool), 2.0, -3.0).astype(np.float32)
    kw = dict(W=W, subst=subst, go=-4.0, ge=-1.0,
              flags=ModeFlags(free_start_edges=True, free_end_edges=True))
    ref = banded_dp(
        jnp.asarray(s_codes), jnp.asarray(t_codes),
        jnp.asarray(s_lens), jnp.asarray(t_lens), dmin,
        w_eff=w_eff, **kw
    )
    out = banded_dp_pallas(
        jnp.asarray(s_codes), jnp.asarray(t_codes),
        jnp.asarray(s_lens), jnp.asarray(t_lens), dmin,
        w_eff=w_eff, interpret=True, **kw
    )
    np.testing.assert_allclose(
        np.asarray(out.score), np.asarray(ref.score), atol=1e-3
    )


@pytest.mark.parametrize("flags", FLAG_CASES[:3])
def test_pallas_dirs_match_lax(rng, flags):
    """Direction bytes + optimum cell match the lax engine exactly."""
    from biseqt_tpu.ops.banded_dp import traceback_path

    B = 3
    M = MutationProcess(A4, subst_probs=0.15, go_prob=0.05, ge_prob=0.2,
                        rng=rng)
    ss, ts = [], []
    for _ in range(B):
        S = rand_seq(A4, 100, rng=rng)
        T, _ = M.mutate(S)
        ss.append(S)
        ts.append(T)
    s_codes, s_lens = pack_sequences(ss, pad_to=128)
    t_codes, t_lens = pack_sequences(ts, pad_to=128)
    W = 128
    dmin = jnp.asarray([-64] * B, jnp.int32)
    subst = np.where(np.eye(4, dtype=bool), 1.0, -1.0).astype(np.float32)
    kw = dict(W=W, subst=subst, go=-2.0, ge=-1.0, flags=flags)
    ref = banded_dp(
        jnp.asarray(s_codes), jnp.asarray(t_codes),
        jnp.asarray(s_lens), jnp.asarray(t_lens), dmin,
        with_dirs=True, **kw
    )
    out = banded_dp_pallas(
        jnp.asarray(s_codes), jnp.asarray(t_codes),
        jnp.asarray(s_lens), jnp.asarray(t_lens), dmin,
        with_dirs=True, interpret=True, **kw
    )
    np.testing.assert_allclose(np.asarray(out.score),
                               np.asarray(ref.score), atol=1e-3)
    np.testing.assert_array_equal(np.asarray(out.end_i),
                                  np.asarray(ref.end_i))
    np.testing.assert_array_equal(np.asarray(out.end_j),
                                  np.asarray(ref.end_j))
    # traceback over pallas bytes reproduces the lax walk
    for b in range(B):
        tx_p, i_p, j_p = traceback_path(
            np.asarray(out.dirs[b]), s_codes[b], t_codes[b],
            int(out.end_i[b]), int(out.end_j[b]),
            banded=True, dmax=int(dmin[b]) + W - 1, flags=flags,
        )
        tx_l, i_l, j_l = traceback_path(
            np.asarray(ref.dirs[b]), s_codes[b], t_codes[b],
            int(ref.end_i[b]), int(ref.end_j[b]),
            banded=True, dmax=int(dmin[b]) + W - 1, flags=flags,
        )
        assert (tx_p, i_p, j_p) == (tx_l, i_l, j_l), (flags, b)


def test_aligner_pallas_row_backend(rng):
    """Aligner(backend='pallas_row') — the ROW kernel's Aligner route —
    solves + tracebacks like the lax backend.  (backend='pallas' routes
    to the AD kernel since round 4; this is the only Aligner-level
    coverage of _solve_pallas + row-layout traceback_path.)"""
    from biseqt_tpu import pw
    from biseqt_tpu.pw import Aligner

    M = MutationProcess(A4, subst_probs=0.1, go_prob=0.04, ge_prob=0.15,
                        rng=rng)
    S = rand_seq(A4, 120, rng=rng)
    T, _ = M.mutate(S)
    kw = dict(alnmode=pw.BANDED_MODE, alntype=pw.B_GLOBAL,
              diag_range=(-30, 30), go_score=-2.0, ge_score=-1.0)
    with Aligner(S, T, **kw) as a_lax:
        s_lax = a_lax.solve()
        tx_lax = a_lax.traceback()
    with Aligner(S, T, backend="pallas_row", **kw) as a_p:
        s_p = a_p.solve()
        tx_p = a_p.traceback()
    assert s_p == pytest.approx(s_lax, abs=1e-3)
    assert tx_p.calculate_score(
        a_p.subst_scores, -2.0, -1.0
    ) == pytest.approx(s_lax, abs=1e-3)


def test_pallas_negative_dmax_long_t_matches_lax(rng):
    """Band entirely left of the main diagonal (dmax < 0) with a mutate
    sequence longer than LSp + W: the band-frame roll ring must not
    alias wrapped T letters under a passing validity mask."""
    B, LS, LT, W = 2, 120, 640, 128
    ss = rng.integers(0, 4, (B, LS)).astype(np.int8)
    # plant the true homology far right in T: T[300 + m] = S[m]
    ts = rng.integers(0, 4, (B, LT)).astype(np.int8)
    ts[:, 300:300 + LS] = ss
    s_lens = jnp.asarray(np.full((B,), LS, np.int32))
    t_lens = jnp.asarray(np.full((B,), LT, np.int32))
    dmin = jnp.asarray(np.full((B,), -420, np.int32))  # dmax = -293 < 0
    w_eff = jnp.asarray(np.full((B,), W - 1, np.int32))
    subst = np.where(np.eye(4, dtype=bool), 1.0, -1.0).astype(np.float32)
    for flags in (ModeFlags(local_start=True, local_end=True),
                  ModeFlags(free_start_edges=True, free_end_edges=True)):
        kw = dict(W=W, subst=subst, go=-2.0, ge=-1.0, flags=flags,
                  w_eff=w_eff)
        ref = np.asarray(banded_dp(
            jnp.asarray(ss), jnp.asarray(ts), s_lens, t_lens, dmin, **kw
        ).score)
        got = np.asarray(banded_dp_pallas(
            jnp.asarray(ss), jnp.asarray(ts), s_lens, t_lens, dmin,
            interpret=True, block_b=8, **kw
        ).score)
        np.testing.assert_allclose(got, ref, atol=1e-2, err_msg=str(flags))
        assert ref[0] > 100  # the planted diagonal was actually in band
