"""On-device traceback sweep vs the native C++ walker (interpret mode).

The sweep kernel (ops/pallas_walk.py) must reproduce the C++ AD
walker's transcripts exactly — same op strings, same start cells —
since both consume the same packed direction planes.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from biseqt_tpu import native
from biseqt_tpu.ops.banded_dp import ModeFlags
from biseqt_tpu.ops.pallas_dp_ad import (banded_dp_pallas_ad,
                                         parity_adjusted_dmin)
from biseqt_tpu.ops.pallas_walk import traceback_sweep

FLAG_CASES = [
    ModeFlags(local_start=True, local_end=True),
    ModeFlags(),
    ModeFlags(free_start_edges=True, free_end_edges=True),
    ModeFlags(free_start_edges=True, local_end=True),
]


def _mk_batch(rng):
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
def test_device_walk_matches_native(rng, flags):
    args, w_eff = _mk_batch(rng)
    subst = np.where(np.eye(4, dtype=bool), 1.0, -1.0).astype(np.float32)
    kw = dict(W=128, subst=subst, go=-2.0, ge=-1.0, flags=flags,
              w_eff=jnp.asarray(w_eff))
    res = banded_dp_pallas_ad(
        *args, interpret=True, block_b=8, r_chunk=16, with_dirs=True,
        **kw)
    ss, ts, s_lens, t_lens, dmin = [np.asarray(a) for a in args]
    B = ss.shape[0]
    score = np.asarray(res.score)
    dminq = parity_adjusted_dmin(dmin, np.arange(B, dtype=np.int32) % 2)
    end_i = np.asarray(res.end_i).astype(np.int32)
    end_j = np.asarray(res.end_j).astype(np.int32)
    live = score > -1e29           # unreachable pairs have no transcript
    ref_ops, ref_si, ref_sj = native.traceback_batch_ad(
        np.asarray(res.dirs), dminq, ss, ts, s_lens, t_lens,
        end_i, end_j, flags,
    )
    # mask unreachable pairs out of the sweep (-1 end = skip)
    ei_m = np.where(live, end_i, -1).astype(np.int32)
    ej_m = np.where(live, end_j, -1).astype(np.int32)
    tr0, tr1, fi, fj = traceback_sweep(
        jnp.asarray(res.dirs), jnp.asarray(dminq), jnp.asarray(ei_m),
        jnp.asarray(ej_m), W=128, block_b=8, r_rows=8, interpret=True)
    got_ops, got_si, got_sj = native.compact_sweep_ops(
        np.asarray(tr0), np.asarray(tr1), np.asarray(fi), np.asarray(fj),
        ss, ts, flags)
    n_checked = 0
    for b in range(B):
        if not live[b]:
            assert got_ops[b] == ""
            continue
        assert got_ops[b] == ref_ops[b], (b, flags)
        assert got_si[b] == ref_si[b] and got_sj[b] == ref_sj[b], (
            b, flags)
        n_checked += 1
    assert n_checked >= B - 1


def test_device_walk_degenerate_geometries(rng):
    """Empty-origin global pair (all-insert transcript via anchored
    tails) and a free-end row-0 optimum — the degenerate geometries
    where walk engines historically rot."""
    subst = np.full((4, 4), -100.0, np.float32)
    s = np.asarray([[2, 2]], np.int8)
    t = np.asarray([[0, 0]], np.int8)
    tl = np.asarray([1], np.int32)
    dmin = np.asarray([-64], np.int32)
    for sl_v, flags in (
        (0, ModeFlags()),                       # empty origin, global
        (2, ModeFlags(free_end_edges=True)),    # free end on row 0
    ):
        sl = np.asarray([sl_v], np.int32)
        res = banded_dp_pallas_ad(
            jnp.asarray(s), jnp.asarray(t), jnp.asarray(sl),
            jnp.asarray(tl), jnp.asarray(dmin), W=128, subst=subst,
            go=-2.0, ge=-1.0, flags=flags,
            w_eff=jnp.asarray([127], np.int32), interpret=True,
            block_b=8, r_chunk=16, with_dirs=True)
        dminq = parity_adjusted_dmin(dmin, np.zeros(1, np.int32))
        end_i = np.asarray(res.end_i).astype(np.int32)
        end_j = np.asarray(res.end_j).astype(np.int32)
        ref_ops, ref_si, ref_sj = native.traceback_batch_ad(
            np.asarray(res.dirs), dminq, s, t, sl, tl, end_i, end_j,
            flags)
        tr0, tr1, fi, fj = traceback_sweep(
            jnp.asarray(res.dirs), jnp.asarray(dminq),
            jnp.asarray(end_i), jnp.asarray(end_j), W=128, block_b=8,
            r_rows=8, interpret=True)
        got_ops, got_si, got_sj = native.compact_sweep_ops(
            np.asarray(tr0), np.asarray(tr1), np.asarray(fi),
            np.asarray(fj), s, t, flags)
        assert got_ops[0] == ref_ops[0], (sl_v, flags, got_ops, ref_ops)
        assert (got_si[0], got_sj[0]) == (ref_si[0], ref_sj[0])
        if sl_v == 0:
            assert got_ops[0] == "I"   # the all-gap global transcript


def test_device_walk_skewed_lengths(rng):
    """The wrap-regression geometry: a 100-char T banding deep into a
    600-char S (dmin=480); walks must match the C++ tracer there too."""
    flags = ModeFlags(local_start=True, local_end=True)
    S = rng.integers(0, 4, 600).astype(np.int8)
    T = np.pad(S[481:581], (0, 28), constant_values=0)[None, :]
    S = S[None, :]
    sl = np.asarray([600], np.int32)
    tl = np.asarray([100], np.int32)
    dmin = np.asarray([480], np.int32)
    subst = np.where(np.eye(4, dtype=bool), 1.0, -1.0).astype(np.float32)
    kw = dict(W=128, subst=subst, go=-2.0, ge=-1.0, flags=flags,
              w_eff=jnp.asarray([127], np.int32))
    res = banded_dp_pallas_ad(
        jnp.asarray(S), jnp.asarray(T), jnp.asarray(sl), jnp.asarray(tl),
        jnp.asarray(dmin), interpret=True, block_b=8, r_chunk=16,
        with_dirs=True, **kw)
    dminq = parity_adjusted_dmin(dmin, np.arange(1, dtype=np.int32) % 2)
    end_i = np.asarray(res.end_i).astype(np.int32)
    end_j = np.asarray(res.end_j).astype(np.int32)
    ref_ops, ref_si, ref_sj = native.traceback_batch_ad(
        np.asarray(res.dirs), dminq, S, T, sl, tl, end_i, end_j, flags)
    tr0, tr1, fi, fj = traceback_sweep(
        jnp.asarray(res.dirs), jnp.asarray(dminq), jnp.asarray(end_i),
        jnp.asarray(end_j), W=128, block_b=8, r_rows=8, interpret=True)
    got_ops, got_si, got_sj = native.compact_sweep_ops(
        np.asarray(tr0), np.asarray(tr1), np.asarray(fi), np.asarray(fj),
        S, T, flags)
    assert got_ops[0] == ref_ops[0]
    assert (got_si[0], got_sj[0]) == (ref_si[0], ref_sj[0])
    assert got_ops[0].count("M") > 90


def test_device_walk_interleave_groups_match(rng):
    """groups=2 (the latency-hiding interleave) must be byte-identical
    to groups=1 — same traces, same cursors — on a batch big enough to
    engage the grouped path (B2 > block_b)."""
    B, L = 34, 96
    ss = rng.integers(0, 4, (B, L)).astype(np.int8)
    ts = ss.copy()
    m = rng.random((B, L)) < 0.2
    ts[m] = (ts[m] + 1 + rng.integers(0, 3, m.sum())) % 4
    s_lens = np.full((B,), L, np.int32)
    s_lens[3] = 70
    t_lens = np.full((B,), L, np.int32)
    t_lens[5] = 80
    dmin = np.full((B,), -40, np.int32)
    w_eff = jnp.full((B,), 100, jnp.int32)
    subst = np.where(np.eye(4, dtype=bool), 1.0, -1.0).astype(np.float32)
    flags = ModeFlags(local_start=True, local_end=True)
    res = banded_dp_pallas_ad(
        jnp.asarray(ss), jnp.asarray(ts), jnp.asarray(s_lens),
        jnp.asarray(t_lens), jnp.asarray(dmin), W=128, subst=subst,
        go=-2.0, ge=-1.0, flags=flags, w_eff=w_eff, interpret=True,
        block_b=8, r_chunk=16, with_dirs=True)
    dminq = parity_adjusted_dmin(dmin, np.arange(B, dtype=np.int32) % 2)
    ei = np.asarray(res.end_i).astype(np.int32)
    ej = np.asarray(res.end_j).astype(np.int32)
    ei[7] = -1   # one skipped pair
    ej[7] = -1
    outs = [
        traceback_sweep(
            jnp.asarray(res.dirs), jnp.asarray(dminq), jnp.asarray(ei),
            jnp.asarray(ej), W=128, block_b=8, r_rows=8, interpret=True,
            groups=g)
        for g in (1, 2)
    ]
    for k in range(4):
        np.testing.assert_array_equal(
            np.asarray(outs[0][k]), np.asarray(outs[1][k]),
            err_msg="output %d differs between groups=1 and groups=2" % k)


def test_device_walk_empty_plane():
    """Rp=0 / B2=0 planes return empty traces and untouched cursors
    instead of launching an out-of-bounds negative-offset DMA (round-4
    review finding)."""
    for B2, Rp in ((3, 0), (0, 0)):
        B = 2 * B2
        tr0, tr1, fi, fj = traceback_sweep(
            jnp.zeros((Rp, B2, 128), jnp.uint8),
            jnp.zeros((B,), jnp.int32),
            jnp.full((B,), 5, jnp.int32), jnp.full((B,), 7, jnp.int32),
            W=128, block_b=8, interpret=True)
        assert tr0.shape == (B2, 0) and tr1.shape == (B2, 0)
        np.testing.assert_array_equal(np.asarray(fi), np.full((B,), 5))
        np.testing.assert_array_equal(np.asarray(fj), np.full((B,), 7))


# ---------------------------------------------------------------------------
# Lane-packed (transposed-plane) walk — round 5
# ---------------------------------------------------------------------------

from biseqt_tpu.ops.pallas_walk import (traceback_sweep_t,  # noqa: E402
                                        traceback_sweep_t_fused,
                                        split_sweep_t_fused)


@pytest.mark.parametrize("flags", FLAG_CASES)
def test_lane_packed_walk_matches_native(rng, flags):
    args, w_eff = _mk_batch(rng)
    subst = np.where(np.eye(4, dtype=bool), 1.0, -1.0).astype(np.float32)
    kw = dict(W=128, subst=subst, go=-2.0, ge=-1.0, flags=flags,
              w_eff=jnp.asarray(w_eff))
    res = banded_dp_pallas_ad(
        *args, interpret=True, block_b=8, r_chunk=16, with_dirs=True,
        **kw)
    ss, ts, s_lens, t_lens, dmin = [np.asarray(a) for a in args]
    B = ss.shape[0]
    score = np.asarray(res.score)
    dminq = parity_adjusted_dmin(dmin, np.arange(B, dtype=np.int32) % 2)
    end_i = np.asarray(res.end_i).astype(np.int32)
    end_j = np.asarray(res.end_j).astype(np.int32)
    live = score > -1e29
    ref_ops, ref_si, ref_sj = native.traceback_batch_ad(
        np.asarray(res.dirs), dminq, ss, ts, s_lens, t_lens,
        end_i, end_j, flags,
    )
    ei_m = np.where(live, end_i, -1).astype(np.int32)
    ej_m = np.where(live, end_j, -1).astype(np.int32)
    tr, fi, fj = traceback_sweep_t(
        jnp.asarray(res.dirs), jnp.asarray(dminq), jnp.asarray(ei_m),
        jnp.asarray(ej_m), W=128, r_rows=8, interpret=True)
    got_ops, got_si, got_sj = native.compact_sweep_ops_t(
        np.asarray(tr), np.asarray(fi), np.asarray(fj), ss, ts, flags)
    n_checked = 0
    for b in range(B):
        if not live[b]:
            assert got_ops[b] == ""
            continue
        assert got_ops[b] == ref_ops[b], (b, flags)
        assert got_si[b] == ref_si[b] and got_sj[b] == ref_sj[b], (
            b, flags)
        n_checked += 1
    assert n_checked >= B - 1


def test_lane_packed_walk_degenerate_and_skewed(rng):
    """Empty-origin global pair, free-end row-0 optimum, and the
    skewed-band wrap-regression geometry — all through the lane-packed
    walk."""
    # degenerate geometries
    subst = np.full((4, 4), -100.0, np.float32)
    s = np.asarray([[2, 2]], np.int8)
    t = np.asarray([[0, 0]], np.int8)
    tl = np.asarray([1], np.int32)
    dmin = np.asarray([-64], np.int32)
    for sl_v, flags in (
        (0, ModeFlags()),
        (2, ModeFlags(free_end_edges=True)),
    ):
        sl = np.asarray([sl_v], np.int32)
        res = banded_dp_pallas_ad(
            jnp.asarray(s), jnp.asarray(t), jnp.asarray(sl),
            jnp.asarray(tl), jnp.asarray(dmin), W=128, subst=subst,
            go=-2.0, ge=-1.0, flags=flags,
            w_eff=jnp.asarray([127], np.int32), interpret=True,
            block_b=8, r_chunk=16, with_dirs=True)
        dminq = parity_adjusted_dmin(dmin, np.zeros(1, np.int32))
        end_i = np.asarray(res.end_i).astype(np.int32)
        end_j = np.asarray(res.end_j).astype(np.int32)
        ref_ops, ref_si, ref_sj = native.traceback_batch_ad(
            np.asarray(res.dirs), dminq, s, t, sl, tl, end_i, end_j,
            flags)
        tr, fi, fj = traceback_sweep_t(
            jnp.asarray(res.dirs), jnp.asarray(dminq),
            jnp.asarray(end_i), jnp.asarray(end_j), W=128,
            r_rows=8, interpret=True)
        got_ops, got_si, got_sj = native.compact_sweep_ops_t(
            np.asarray(tr), np.asarray(fi), np.asarray(fj), s, t, flags)
        assert got_ops[0] == ref_ops[0], (sl_v, flags, got_ops, ref_ops)
        assert (got_si[0], got_sj[0]) == (ref_si[0], ref_sj[0])
    # skewed lengths (the wrap-regression geometry)
    flags = ModeFlags(local_start=True, local_end=True)
    S = rng.integers(0, 4, 600).astype(np.int8)
    T = np.pad(S[481:581], (0, 28), constant_values=0)[None, :]
    S = S[None, :]
    sl = np.asarray([600], np.int32)
    tl = np.asarray([100], np.int32)
    dmin = np.asarray([480], np.int32)
    subst = np.where(np.eye(4, dtype=bool), 1.0, -1.0).astype(np.float32)
    res = banded_dp_pallas_ad(
        jnp.asarray(S), jnp.asarray(T), jnp.asarray(sl), jnp.asarray(tl),
        jnp.asarray(dmin), W=128, subst=subst, go=-2.0, ge=-1.0,
        flags=flags, w_eff=jnp.asarray([127], np.int32), interpret=True,
        block_b=8, r_chunk=16, with_dirs=True)
    dminq = parity_adjusted_dmin(dmin, np.zeros(1, np.int32))
    end_i = np.asarray(res.end_i).astype(np.int32)
    end_j = np.asarray(res.end_j).astype(np.int32)
    ref_ops, _, _ = native.traceback_batch_ad(
        np.asarray(res.dirs), dminq, S, T, sl, tl, end_i, end_j, flags)
    tr, fi, fj = traceback_sweep_t(
        jnp.asarray(res.dirs), jnp.asarray(dminq), jnp.asarray(end_i),
        jnp.asarray(end_j), W=128, r_rows=8, interpret=True)
    got_ops, _, _ = native.compact_sweep_ops_t(
        np.asarray(tr), np.asarray(fi), np.asarray(fj), S, T, flags)
    assert got_ops[0] == ref_ops[0]
    assert got_ops[0].count("M") > 90


def test_lane_packed_walk_empty_plane():
    for B2, Rp in ((3, 0), (0, 0)):
        B = 2 * B2
        tr, fi, fj = traceback_sweep_t(
            jnp.zeros((Rp, B2, 128), jnp.uint8),
            jnp.zeros((B,), jnp.int32),
            jnp.full((B,), 5, jnp.int32), jnp.full((B,), 7, jnp.int32),
            W=128, interpret=True)
        assert tr.shape == (2, 0, B2)
        np.testing.assert_array_equal(np.asarray(fi), np.full((B,), 5))
        np.testing.assert_array_equal(np.asarray(fj), np.full((B,), 7))


def test_lane_packed_walk_col_blocks(rng):
    """col_block smaller than the padded B2 engages the multi-program
    grid; results must be identical to the single-program run.  Uses a
    synthetic dirs plane (B2=130 > 128 lanes) — the walkers only read
    nibbles, so random planes exercise the grid determinism without an
    interpret-mode DP at B=260."""
    B2, Rp, W = 130, 16, 128
    B = 2 * B2
    dirs = rng.integers(0, 256, (Rp, B2, W)).astype(np.uint8)
    dminq = rng.integers(-W + 1, 1, B).astype(np.int32)
    # end cells inside the band: i + j < 2*Rp, i - j - dminq in [0, W)
    ei = rng.integers(1, Rp, B).astype(np.int32)
    ej = np.clip(ei - dminq - rng.integers(0, W, B), 0, Rp - 1
                 ).astype(np.int32)
    ei[::7] = -1                      # sprinkle skipped pairs
    outs = [
        traceback_sweep_t(
            jnp.asarray(dirs), jnp.asarray(dminq), jnp.asarray(ei),
            jnp.asarray(ej), W=W, r_rows=8, col_block=cb,
            interpret=True)
        for cb in (1024, 128)         # 1 program vs 2 programs
    ]
    for k in range(3):
        np.testing.assert_array_equal(
            np.asarray(outs[0][k]), np.asarray(outs[1][k]))


def test_lane_block_scales_down_with_band_width():
    """Round-5 regression: the pipeline's lane gate admits any
    W % 128 == 0 bucket (256/384/512...), and at W=256 the default
    col_block=1024 lane block put the RC*W*BL working set (~16 MB dirs
    chunks + ~96 MB of unrolled i32 nibble splits) over the 100 MB
    Mosaic VMEM limit — a compile-time OOM instead of a transcript.
    The lane block must shrink proportionally with W."""
    from biseqt_tpu.ops.pallas_walk import _lane_block
    for cb in (1024, 512, 128):
        for W in (128, 256, 384, 512, 1024):
            BL = _lane_block(10 ** 9, W, cb)
            assert BL % 128 == 0 and BL >= 128
            # W=128 budget preserved (the floor of 128 lanes may
            # exceed it only where traceback_sweep_t's RC guard
            # then halves the row chunk)
            assert W * BL <= max(128 * cb, 128 * W)
        assert _lane_block(10 ** 9, 128, cb) == cb


def test_lane_packed_walk_wide_band_parity(rng):
    """W=256 through both lane-block regimes: the W-shrunk block
    (col_block=256 -> BL=128, 2 programs) must agree with the
    single-program run exactly."""
    B2, Rp, W = 130, 12, 256
    B = 2 * B2
    dirs = rng.integers(0, 256, (Rp, B2, W)).astype(np.uint8)
    dminq = rng.integers(-W + 1, 1, B).astype(np.int32)
    ei = rng.integers(1, Rp, B).astype(np.int32)
    ej = np.clip(ei - dminq - rng.integers(0, W, B), 0, Rp - 1
                 ).astype(np.int32)
    ei[::7] = -1
    outs = [
        traceback_sweep_t(
            jnp.asarray(dirs), jnp.asarray(dminq), jnp.asarray(ei),
            jnp.asarray(ej), W=W, r_rows=8, col_block=cb,
            interpret=True)
        for cb in (1024, 256)
    ]
    for k in range(3):
        np.testing.assert_array_equal(
            np.asarray(outs[0][k]), np.asarray(outs[1][k]))


def test_lane_packed_fused_roundtrip(rng):
    """Fused single-array output splits back to the unfused triple."""
    B2, Rp, W = 20, 16, 128
    B = 2 * B2 - 3                    # ragged tail
    dirs = rng.integers(0, 256, (Rp, B2, W)).astype(np.uint8)
    dminq = rng.integers(-W + 1, 1, B).astype(np.int32)
    ei = rng.integers(1, Rp, B).astype(np.int32)
    ej = np.clip(ei - dminq - rng.integers(0, W, B), 0, Rp - 1
                 ).astype(np.int32)
    ei[::5] = -1
    tr, fi, fj = traceback_sweep_t(
        jnp.asarray(dirs), jnp.asarray(dminq), jnp.asarray(ei),
        jnp.asarray(ej), W=W, r_rows=8, interpret=True)
    fused = traceback_sweep_t_fused(
        jnp.asarray(dirs), jnp.asarray(dminq), jnp.asarray(ei),
        jnp.asarray(ej), W=W, r_rows=8, interpret=True)
    tr2, fi2, fj2 = split_sweep_t_fused(np.asarray(fused), B)
    np.testing.assert_array_equal(np.asarray(tr), tr2)
    np.testing.assert_array_equal(np.asarray(fi), fi2)
    np.testing.assert_array_equal(np.asarray(fj), fj2)
