"""Antidiagonal dual-pair kernel vs the lax oracle (interpret mode).

Small r_chunk keeps the unrolled-body CPU compile tractable; the real
chip is covered by `make tpu-smoke` (exact parity + throughput).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from biseqt_tpu.ops.banded_dp import banded_dp, ModeFlags
from biseqt_tpu.ops.pallas_dp_ad import (banded_dp_pallas_ad,
                                         parity_adjusted_dmin)

FLAG_CASES = [
    ModeFlags(local_start=True, local_end=True),
    ModeFlags(),
    ModeFlags(free_start_edges=True, free_end_edges=True),
]


def _mk_batch(rng):
    """Ragged pairs, mixed dmin parities, per-pair effective widths."""
    B, L = 5, 150
    ss = rng.integers(0, 4, (B, L)).astype(np.int8)
    ts = ss.copy()
    m = rng.random((B, L)) < 0.15
    ts[m] = (ts[m] + 1 + rng.integers(0, 3, m.sum())) % 4
    s_lens = np.array([150, 140, 150, 130, 150], np.int32)
    t_lens = np.array([148, 150, 135, 150, 150], np.int32)
    dmin = np.array([-64, -63, -30, -80, -64], np.int32)
    w_eff = np.array([100, 127, 64, 120, 127], np.int32)
    return [jnp.asarray(x) for x in (ss, ts, s_lens, t_lens, dmin)], w_eff


@pytest.mark.parametrize("flags", FLAG_CASES)
def test_ad_kernel_matches_lax(rng, flags):
    args, w_eff = _mk_batch(rng)
    subst = np.where(np.eye(4, dtype=bool), 1.0, -1.0).astype(np.float32)
    kw = dict(W=128, subst=subst, go=-2.0, ge=-1.0, flags=flags,
              w_eff=jnp.asarray(w_eff))
    ref = np.asarray(banded_dp(*args, **kw).score)
    got = np.asarray(banded_dp_pallas_ad(
        *args, interpret=True, block_b=8, r_chunk=16, **kw).score)
    np.testing.assert_allclose(got, ref, atol=1e-2, err_msg=str(flags))


def test_ad_kernel_no_wrap_phantom(rng):
    """Adversarial band geometry for the circular E/F rolls: a rich
    bottom-edge diagonal (X vs X at d=0) and the global corner on the
    top edge (d=126).  Without wrap masks on the roll destinations, the
    bottom-edge score wraps lane 0 -> lane W-1 and reaches the corner
    as an illegal teleported gap (measured 176 vs the true 72)."""
    X = rng.integers(0, 4, 200).astype(np.int8)
    Z = rng.integers(0, 4, 126).astype(np.int8)
    S = np.concatenate([X, Z])[None, :]
    T = np.pad(X, (0, 126), constant_values=0)[None, :]
    sl = jnp.asarray([326], jnp.int32)
    tl = jnp.asarray([200], jnp.int32)
    dmin = jnp.asarray([-1], jnp.int32)
    w_eff = jnp.asarray([127], jnp.int32)
    subst = np.where(np.eye(4, dtype=bool), 1.0, -1.0).astype(np.float32)
    kw = dict(W=128, subst=subst, go=-2.0, ge=-1.0, flags=ModeFlags(),
              w_eff=w_eff)
    ref = np.asarray(banded_dp(jnp.asarray(S), jnp.asarray(T), sl, tl,
                               dmin, **kw).score)
    got = np.asarray(banded_dp_pallas_ad(
        jnp.asarray(S), jnp.asarray(T), sl, tl, dmin,
        interpret=True, block_b=8, r_chunk=16, **kw).score)
    np.testing.assert_allclose(got, ref, atol=1e-2)


def _rescore(ops, s, t, si, sj, subst, go, ge):
    score, i, j, prev = 0.0, si, sj, None
    for op in ops:
        if op in "MS":
            score += subst[s[i], t[j]]
            i += 1
            j += 1
        elif op == "I":
            score += ge + (go if prev != "I" else 0.0)
            j += 1
        else:
            score += ge + (go if prev != "D" else 0.0)
            i += 1
        prev = op
    return score, i, j


@pytest.mark.parametrize("flags", FLAG_CASES)
def test_ad_kernel_dirs_transcripts(rng, flags):
    """with_dirs=True: the antidiagonal direction bytes walked by the
    native AD tracer yield transcripts that rescore to exactly the DP
    score, for both pairs of every dual-pair plane, across modes."""
    from biseqt_tpu import native

    args, w_eff = _mk_batch(rng)
    subst = np.where(np.eye(4, dtype=bool), 1.0, -1.0).astype(np.float32)
    go, ge = -2.0, -1.0
    kw = dict(W=128, subst=subst, go=go, ge=ge, flags=flags,
              w_eff=jnp.asarray(w_eff))
    res = banded_dp_pallas_ad(
        *args, interpret=True, block_b=8, r_chunk=16, with_dirs=True,
        **kw)
    ref = np.asarray(banded_dp(*args, **kw).score)
    score = np.asarray(res.score)
    np.testing.assert_allclose(score, ref, atol=1e-2, err_msg=str(flags))

    ss, ts, s_lens, t_lens, dmin = [np.asarray(a) for a in args]
    B = ss.shape[0]
    dminq = parity_adjusted_dmin(dmin, np.arange(B, dtype=np.int32) % 2)
    ops, si, sj = native.traceback_batch_ad(
        np.asarray(res.dirs), dminq, ss, ts, s_lens, t_lens,
        np.asarray(res.end_i), np.asarray(res.end_j), flags,
    )
    anchored_end = not (flags.local_end or flags.free_end_edges)
    anchored_start = not (flags.local_start or flags.free_start_edges)
    n_checked = 0
    for b in range(B):
        if score[b] < -1e29:
            # unreachable (e.g. global corner outside the live band):
            # no transcript exists by construction
            continue
        n_checked += 1
        assert set(ops[b]) <= set("MSID"), (b, ops[b][:40])
        got, ei, ej = _rescore(
            ops[b], ss[b], ts[b], si[b], sj[b], subst, go, ge
        )
        assert got == pytest.approx(score[b], abs=1e-2), (b, flags)
        assert ei == int(np.asarray(res.end_i)[b])
        assert ej == int(np.asarray(res.end_j)[b])
        if anchored_end:
            assert (ei, ej) == (s_lens[b], t_lens[b])
        if anchored_start:
            assert (si[b], sj[b]) == (0, 0)
    assert n_checked >= B - 1, "test geometry should mostly be reachable"


@pytest.mark.parametrize("flags", FLAG_CASES)
def test_ad_kernel_i8win_matches_lax(rng, flags):
    """The int8-window lever (_i8win=True): carries the char chunks as
    int8 register values so the two per-step rolls move 4x fewer vregs.
    Uniform-subst fast path only; must be score-identical."""
    args, w_eff = _mk_batch(rng)
    subst = np.where(np.eye(4, dtype=bool), 1.0, -1.0).astype(np.float32)
    kw = dict(W=128, subst=subst, go=-2.0, ge=-1.0, flags=flags,
              w_eff=jnp.asarray(w_eff))
    ref = np.asarray(banded_dp(*args, **kw).score)
    got = np.asarray(banded_dp_pallas_ad(
        *args, interpret=True, block_b=8, r_chunk=16, _i8win=True,
        **kw).score)
    np.testing.assert_allclose(got, ref, atol=1e-2, err_msg=str(flags))


def test_ad_kernel_i8win_skewed_and_dirs(rng):
    """i8win on the skewed-length ring geometry (wrap regression) and in
    transcript mode (dirs bytes must be identical with the lever on)."""
    S = rng.integers(0, 4, 600).astype(np.int8)
    T = np.pad(S[481:581], (0, 28), constant_values=0)[None, :]
    S = S[None, :]
    sl = jnp.asarray([600], jnp.int32)
    tl = jnp.asarray([100], jnp.int32)
    dmin = jnp.asarray([480], jnp.int32)
    subst = np.where(np.eye(4, dtype=bool), 1.0, -1.0).astype(np.float32)
    kw = dict(W=128, subst=subst, go=-2.0, ge=-1.0,
              flags=ModeFlags(local_start=True, local_end=True),
              w_eff=jnp.asarray([127], jnp.int32))
    base = banded_dp_pallas_ad(
        jnp.asarray(S), jnp.asarray(T), sl, tl, dmin,
        interpret=True, block_b=8, r_chunk=16, with_dirs=True, **kw)
    got = banded_dp_pallas_ad(
        jnp.asarray(S), jnp.asarray(T), sl, tl, dmin,
        interpret=True, block_b=8, r_chunk=16, with_dirs=True,
        _i8win=True, **kw)
    np.testing.assert_allclose(np.asarray(got.score),
                               np.asarray(base.score), atol=1e-2)
    assert np.asarray(got.score)[0] > 90  # planted diagonal in band
    np.testing.assert_array_equal(np.asarray(got.dirs),
                                  np.asarray(base.dirs))
    assert int(got.end_i[0]) == int(base.end_i[0])
    assert int(got.end_j[0]) == int(base.end_j[0])


def test_ad_kernel_general_subst_fractional_ge(rng):
    """Non-uniform substitution matrix + fractional ge exercises the
    general lookup path and the drifted-state arithmetic."""
    args, w_eff = _mk_batch(rng)
    subst = np.array(
        [[2, -1, -2, -1], [-1, 2, -1, -2], [-2, -1, 2, -1], [-1, -2, -1, 2]],
        np.float32,
    )
    kw = dict(W=128, subst=subst, go=-3.0, ge=-0.5,
              flags=ModeFlags(local_start=True, local_end=True),
              w_eff=jnp.asarray(w_eff))
    ref = np.asarray(banded_dp(*args, **kw).score)
    got = np.asarray(banded_dp_pallas_ad(
        *args, interpret=True, block_b=8, r_chunk=16, **kw).score)
    np.testing.assert_allclose(got, ref, atol=1e-2)


def test_ad_kernel_row0_and_empty_origin(rng):
    """Degenerate geometry parity: free-end optimum on row 0, and an
    empty-origin global pair (the all-gap alignment) — cases where scan
    trackers that start at row 1 historically diverged."""
    subst = np.full((4, 4), -100.0, np.float32)
    s = jnp.asarray([[2, 2]], jnp.int8)
    t = jnp.asarray([[0, 0]], jnp.int8)
    tl = jnp.asarray([1], jnp.int32)
    dmin = jnp.asarray([-64], jnp.int32)
    kw = dict(W=128, subst=subst, go=-2.0, ge=-1.0,
              w_eff=jnp.asarray([127], jnp.int32))
    for sl_v, flags, want in (
        (2, ModeFlags(free_end_edges=True), -3.0),
        (0, ModeFlags(), -3.0),
    ):
        sl = jnp.asarray([sl_v], jnp.int32)
        ref = float(np.asarray(banded_dp(
            s, t, sl, tl, dmin, flags=flags, **kw
        ).score)[0])
        assert ref == pytest.approx(want), (sl_v, flags)
        got = float(np.asarray(banded_dp_pallas_ad(
            s, t, sl, tl, dmin, interpret=True, block_b=8, r_chunk=16,
            flags=flags, **kw
        ).score)[0])
        assert got == pytest.approx(want), (sl_v, flags)


def test_ad_kernel_skewed_lengths(rng):
    """LS >> LT with the band deep into S (large positive dmin): the
    half-stream ring must cover the longer sequence — a ring of
    (Apad+W)/2 wraps and serves S[0]-region characters where S[480+]
    belongs (historical repro: scored 9 instead of 100)."""
    S = rng.integers(0, 4, 600).astype(np.int8)
    T = np.pad(S[481:581], (0, 28), constant_values=0)[None, :]
    S = S[None, :]
    sl = jnp.asarray([600], jnp.int32)
    tl = jnp.asarray([100], jnp.int32)
    w_eff = jnp.asarray([127], jnp.int32)
    subst = np.where(np.eye(4, dtype=bool), 1.0, -1.0).astype(np.float32)
    for dmin_v, flags in (
        (480, ModeFlags(local_start=True, local_end=True)),
        (480, ModeFlags(free_start_edges=True, free_end_edges=True)),
    ):
        dmin = jnp.asarray([dmin_v], jnp.int32)
        kw = dict(W=128, subst=subst, go=-2.0, ge=-1.0, flags=flags,
                  w_eff=w_eff)
        ref = np.asarray(banded_dp(jnp.asarray(S), jnp.asarray(T), sl,
                                   tl, dmin, **kw).score)
        got = np.asarray(banded_dp_pallas_ad(
            jnp.asarray(S), jnp.asarray(T), sl, tl, dmin,
            interpret=True, block_b=8, r_chunk=16, **kw).score)
        np.testing.assert_allclose(got, ref, atol=1e-2, err_msg=str(flags))
        assert ref[0] > 90  # the planted diagonal is in band


def test_aligner_pallas_routes_to_ad_kernel(rng):
    """Aligner(backend='pallas') must hit the flagship AD kernel (scores
    AND transcripts), matching the lax backend exactly (round-3 verdict
    item 4: the reference-shaped API previously got the 3x-slower row
    kernel silently; that one now lives at backend='pallas_row')."""
    from biseqt_tpu import pw
    from biseqt_tpu.pw import Aligner
    from biseqt_tpu.sequence import Alphabet
    from biseqt_tpu.stochastics import rand_seq, MutationProcess

    A4 = Alphabet("ACGT")
    M = MutationProcess(A4, subst_probs=0.1, go_prob=0.04, ge_prob=0.15,
                        rng=rng)
    S = rand_seq(A4, 120, rng=rng)
    T, _ = M.mutate(S)
    for alntype in (pw.B_GLOBAL, pw.B_LOCAL, pw.B_OVERLAP):
        kw = dict(alnmode=pw.BANDED_MODE, alntype=alntype,
                  diag_range=(-30, 30), go_score=-2.0, ge_score=-1.0)
        with Aligner(S, T, **kw) as a_lax:
            s_lax = a_lax.solve()
            aln_lax = a_lax.traceback()
        with Aligner(S, T, backend="pallas", **kw) as a_p:
            s_p = a_p.solve()
            aln_p = a_p.traceback()
        assert s_p == pytest.approx(s_lax, abs=1e-3), alntype
        # transcripts from the AD nibble walk rescore to the optimum
        assert aln_p.calculate_score(
            a_p.subst_scores, -2.0, -1.0
        ) == pytest.approx(s_lax, abs=1e-3), alntype
        assert (aln_p.origin_start, aln_p.mutate_start) == (
            aln_lax.origin_start, aln_lax.mutate_start), alntype


@pytest.mark.slow
def test_ad_kernel_protein_planes_matches_lax(rng):
    """A=20 (protein-scale) general substitution through the round-4
    value-planes path: scores must match the lax oracle AND the legacy
    per-step select chain exactly."""
    A = 20
    B, L = 4, 120
    ss = rng.integers(0, A, (B, L)).astype(np.int8)
    ts = ss.copy()
    m = rng.random((B, L)) < 0.2
    ts[m] = (ts[m] + 1 + rng.integers(0, A - 1, m.sum())) % A
    s_lens = np.array([120, 110, 120, 100], np.int32)
    t_lens = np.array([118, 120, 105, 120], np.int32)
    dmin = np.array([-40, -39, -20, -64], np.int32)
    w_eff = jnp.asarray([100, 127, 64, 120], jnp.int32)
    subst = rng.uniform(-3.0, -0.2, (A, A)).astype(np.float32)
    np.fill_diagonal(subst, rng.uniform(0.5, 2.0, A).astype(np.float32))
    args = [jnp.asarray(x) for x in (ss, ts, s_lens, t_lens, dmin)]
    for flags in (ModeFlags(local_start=True, local_end=True),
                  ModeFlags()):
        kw = dict(W=128, subst=subst, go=-2.0, ge=-1.0, flags=flags,
                  w_eff=w_eff, A=A)
        ref = np.asarray(banded_dp(*args, **{k: v for k, v in kw.items()
                                             if k != "A"}).score)
        planes = np.asarray(banded_dp_pallas_ad(
            *args, interpret=True, block_b=8, r_chunk=16,
            _subst_planes=True, **kw).score)
        chain = np.asarray(banded_dp_pallas_ad(
            *args, interpret=True, block_b=8, r_chunk=16,
            _subst_planes=False, **kw).score)
        np.testing.assert_allclose(planes, ref, atol=1e-2,
                                   err_msg=str(flags))
        np.testing.assert_allclose(chain, ref, atol=1e-2,
                                   err_msg=str(flags))


@pytest.mark.slow
def test_ad_kernel_protein_packed_matches_lax(rng):
    """A=20 integer-grid substitution through the round-4 PACKED-planes
    path (base-32 digit packing, exact power-of-two extraction): scores
    must match the lax oracle exactly, on integer AND half-integer
    grids; non-grid matrices refuse _subst_packed=True."""
    from biseqt_tpu.ops.pallas_dp_ad import _int_grid

    A = 20
    B, L = 4, 120
    ss = rng.integers(0, A, (B, L)).astype(np.int8)
    ts = ss.copy()
    m = rng.random((B, L)) < 0.2
    ts[m] = (ts[m] + 1 + rng.integers(0, A - 1, m.sum())) % A
    s_lens = np.array([120, 110, 120, 100], np.int32)
    t_lens = np.array([118, 120, 105, 120], np.int32)
    dmin = np.array([-40, -39, -20, -64], np.int32)
    w_eff = jnp.asarray([100, 127, 64, 120], jnp.int32)
    args = [jnp.asarray(x) for x in (ss, ts, s_lens, t_lens, dmin)]
    # integer grid (g=1) and half-integer grid (g=0.5, exercises the
    # float-gcd grid detection)
    sub_i = rng.integers(-4, 0, (A, A)).astype(np.float32)
    sub_i = np.minimum(sub_i, sub_i.T)
    np.fill_diagonal(sub_i, rng.integers(1, 12, A).astype(np.float32))
    sub_h = (rng.integers(-8, 0, (A, A)) * 0.5).astype(np.float32)
    np.fill_diagonal(sub_h, (rng.integers(2, 20, A) * 0.5))
    assert _int_grid(sub_i) == (-4.0, 1.0)
    assert _int_grid(sub_h)[1] == 0.5
    for subst, flags in (
            (sub_i, ModeFlags(local_start=True, local_end=True)),
            (sub_i, ModeFlags()),
            (sub_h, ModeFlags(free_start_edges=True, local_end=True))):
        kw = dict(W=128, subst=subst, go=-2.0, ge=-1.0, flags=flags,
                  w_eff=w_eff)
        ref = np.asarray(banded_dp(*args, **kw).score)
        packed = np.asarray(banded_dp_pallas_ad(
            *args, interpret=True, block_b=8, r_chunk=16, A=A,
            _subst_packed=True, **kw).score)
        np.testing.assert_allclose(packed, ref, atol=1e-2,
                                   err_msg=str(flags))
    # non-grid matrix: explicit packed refuses; auto falls back cleanly
    sub_f = rng.uniform(-3.0, -0.2, (A, A)).astype(np.float32)
    np.fill_diagonal(sub_f, rng.uniform(0.5, 2.0, A))
    assert _int_grid(sub_f) is None
    with pytest.raises(ValueError):
        banded_dp_pallas_ad(
            *args, interpret=True, block_b=8, r_chunk=16, A=A,
            W=128, subst=sub_f, go=-2.0, ge=-1.0, flags=ModeFlags(),
            w_eff=w_eff, _subst_packed=True)
