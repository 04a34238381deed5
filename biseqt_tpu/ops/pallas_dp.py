"""Pallas TPU kernel: batched banded affine-gap DP (score mode).

The TPU-native replacement for the reference's C hot loop
(``biseqt/pwlib — dptable_solve`` in BANDED_MODE) — the component the
north-star GCUPS target measures.

Kernel design (see :mod:`.banded_dp` for the recurrence derivation):

  * **Streamed inputs.** The code streams (origin rows + band-frame mutate
    stream) live in HBM; 128-row chunks are double-buffered into VMEM with
    async DMA, so VMEM holds only O(block_b * W) state regardless of
    sequence length — megabase pairs and 256-pair tiles both fit.
  * **Register wavefront.** The whole band state (H, F — [block_b, W] f32)
    is carried through a ``fori_loop`` as values; 128 rows unroll
    statically per chunk so every sliding-window access is a compile-time
    slice of the chunk value (Mosaic requires lane-aligned vector loads;
    chunking turns the per-row unaligned slide into one aligned DMA per
    chunk).
  * **Minimal row body.** Validity is enforced by poisoning substitution
    scores at PAD characters (-1e30) — gap chains decay monotonically
    (go, ge <= 0), so poisoned lanes never win a max.  Mode trackers
    accumulate into [block_b, W] *vectors* (one max per row); reductions
    happen once after the loop.  The only superlinear cost per row is the
    closed-form affine E-chain: log2(W) shifted maxes.
  * The critical path is the E-chain's shifted-max dependency; Mosaic
    pipelines the independent per-vreg work, so wider tiles raise
    throughput until VPU issue saturates.

Traceback on TPU is served by the lax backend (direction bytes) or the
native host engine; this kernel is the throughput path.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .banded_dp import NEG, DPResult, ModeFlags

__all__ = ["banded_dp_pallas"]

_R = 128  # row chunk length (DMA granularity and unroll factor)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(dmax_ref, slen_ref, tlen_ref, weff_ref, subst_ref,
            s_hbm, t2_hbm,
            score_ref, ei_ref, ek_ref, *rest,
            W: int, LSp: int, BT: int, A: int, go: float, ge: float,
            flags: ModeFlags, uniform: tuple, with_dirs: bool = False):
    if with_dirs:
        (dirs_hbm, sbuf, tbuf, sems,
         dbuf, dsems, best_sc, bi_sc, bk_sc) = rest
    else:
        sbuf, tbuf, sems = rest
    b = pl.program_id(0)
    row0 = b * BT
    karange = jax.lax.broadcasted_iota(jnp.int32, (BT, W), 1)
    kf = karange.astype(jnp.float32)
    gek = ge * kf
    cgek = (go + ge) - gek
    shift_masks = {}
    cover = 1
    while cover < W:
        for mult in (1, 2, 3):
            if mult * cover < W:
                shift_masks[mult * cover] = karange >= (mult * cover)
        cover *= 4
    mask_up = karange < (W - 1)
    dmax = dmax_ref[:, :1]
    slen = slen_ref[:, :1]
    tlen = tlen_ref[:, :1]
    weff = weff_ref[:, :1]
    lane_ok = karange < weff

    def shr(x, sh):  # lane k <- k - sh
        return jnp.where(shift_masks[sh], pltpu.roll(x, sh, 1), NEG)

    def shl1(x):     # lane k <- k + 1
        return jnp.where(mask_up, pltpu.roll(x, W - 1, 1), NEG)

    # init row (i = 0)
    j0 = karange - dmax
    valid0 = (j0 >= 0) & (j0 <= tlen) & lane_ok
    if flags.local_start or flags.free_start_edges:
        h0 = jnp.zeros((BT, W), jnp.float32)
    else:
        h0 = jnp.where(j0 > 0, go + ge * j0.astype(jnp.float32), 0.0)
    H0 = jnp.where(valid0, h0, NEG)

    # row 0 can hold alignment ends (the j == tlen ray at i = 0 in
    # overlap mode, zero-score cells in local mode) — seed the trackers
    # from it, matching the lax engine (whose scan also starts at i=1)
    if flags.local_end:
        best0_vec = H0
    elif flags.free_end_edges:
        best0_vec = jnp.where(karange == tlen + dmax, H0, NEG)
        # the i == slen 'any j' ray includes row 0 when s_lens == 0
        best0_vec = jnp.maximum(
            best0_vec, jnp.where(slen == 0, H0, NEG)
        )
    else:
        best0_vec = jnp.full((BT, W), NEG)

    if with_dirs:
        best_sc[:] = jnp.max(best0_vec, axis=1, keepdims=True)
        bi_sc[:] = jnp.zeros((BT, 1), jnp.int32)
        bk_sc[:] = jnp.argmax(best0_vec, axis=1).astype(
            jnp.int32
        )[:, None]

    if uniform is None:
        srows = [
            [subst_ref[0, a * A + bb] for bb in range(A)] for a in range(A)
        ]

    def sub_score(s_char, t_win):
        if uniform is not None:
            m, mm = uniform
            base = jnp.where(s_char == t_win, m, mm)
        else:
            base = jnp.zeros(t_win.shape, jnp.float32)
            for a in range(A):
                row = jnp.full(t_win.shape, srows[a][0], jnp.float32)
                for bb in range(1, A):
                    row = jnp.where(t_win == bb, srows[a][bb], row)
                base = jnp.where(s_char == a, row, base)
        return jnp.where(t_win < 0, NEG, base)

    n_chunks = LSp // _R

    def start_dma(slot, c):
        base = c * _R
        d1 = pltpu.make_async_copy(
            s_hbm.at[pl.ds(row0, BT), pl.ds(base, _R)],
            sbuf.at[slot], sems.at[slot, 0],
        )
        d2 = pltpu.make_async_copy(
            t2_hbm.at[pl.ds(row0, BT), pl.ds(base, W + _R)],
            tbuf.at[slot], sems.at[slot, 1],
        )
        d1.start()
        d2.start()

    def wait_dma(slot, c):
        base = c * _R
        pltpu.make_async_copy(
            s_hbm.at[pl.ds(row0, BT), pl.ds(base, _R)],
            sbuf.at[slot], sems.at[slot, 0],
        ).wait()
        pltpu.make_async_copy(
            t2_hbm.at[pl.ds(row0, BT), pl.ds(base, W + _R)],
            tbuf.at[slot], sems.at[slot, 1],
        ).wait()

    start_dma(0, 0)

    track_col = flags.free_end_edges
    track_local = flags.local_end

    def dirs_dma(slot, c):
        return pltpu.make_async_copy(
            dbuf.at[slot],
            dirs_hbm.at[pl.ds(row0, BT), pl.ds(c * _R, _R), :],
            dsems.at[slot],
        )

    def chunk_body(c, carry):
        H, F, best_vec = carry
        slot = c % 2

        @pl.when(c + 1 < n_chunks)
        def _():
            start_dma(1 - slot, c + 1)

        wait_dma(slot, c)
        if with_dirs:
            # the slot's previous dirs write-out must have landed
            @pl.when(c >= 2)
            def _():
                dirs_dma(slot, c - 2).wait()
        s_chunk = sbuf[slot]
        t_chunk = tbuf[slot]

        for r in range(_R):
            i = c * _R + (r + 1)
            t_win = t_chunk[:, r:r + W]
            s_char = s_chunk[:, r:r + 1]
            sub = sub_score(s_char, t_win)

            diag_cand = H + sub
            if with_dirs:
                F_ext = shl1(F) + ge
                F = jnp.maximum(shl1(H + go) + ge, F_ext)
            else:
                F = shl1(jnp.maximum(H + go, F)) + ge
            H_pre = jnp.maximum(diag_cand, F)
            if flags.local_start:
                H_pre = jnp.maximum(H_pre, 0.0)
            if flags.free_start_edges:
                j_idx = karange + (i - dmax)
                H_pre = jnp.where(
                    j_idx == 0, jnp.maximum(H_pre, 0.0), H_pre
                )

            # E chain: closed-form prefix max, radix-4 Hillis-Steele — the
            # three rolls of each stage are independent, so the dependency
            # chain is ~log4(W) max-trees instead of log2(W) serial steps.
            # (A mask-free double-width variant was measured slower.)
            P = shr(H_pre, 1) + cgek
            cover = 1
            while cover < W:
                terms = [P] + [
                    shr(P, m * cover) for m in (1, 2, 3) if m * cover < W
                ]
                while len(terms) > 1:
                    terms = [
                        jnp.maximum(terms[i], terms[i + 1])
                        if i + 1 < len(terms) else terms[i]
                        for i in range(0, len(terms), 2)
                    ]
                P = terms[0]
                cover *= 4
            E = P + gek
            # mask dead lanes AFTER the E merge (matching the lax engine's
            # _row_update): masking only H_pre leaves live E values on
            # lanes k >= w_eff, which leak back into live lanes through
            # next row's F shift — an outside-the-band path (overscores
            # when a gap detour around the band edge beats in-band paths)
            H_new = jnp.where(lane_ok, jnp.maximum(H_pre, E), NEG)

            if with_dirs:
                # direction byte, identical semantics to the lax engine
                # (ops/banded_dp._row_update): bits 0-1 H-source, bit 2
                # E-extend, bit 3 F-extend
                d = jnp.where(
                    H_new == diag_cand, 1,
                    jnp.where(H_new == E, 2, 3),
                )
                if flags.local_start:
                    d = jnp.where(
                        (H_new == 0.0) & (diag_cand < 0.0), 0, d
                    )
                if flags.free_start_edges:
                    jj = karange + (i - dmax)
                    d = jnp.where(
                        (jj == 0) & (H_new == 0.0) & (F < 0.0), 0, d
                    )
                e_ext = (P == shr(P, 1)).astype(jnp.int32)
                f_ext = (F == F_ext).astype(jnp.int32)
                # int32 arithmetic (Mosaic vectors are i16/i32 only);
                # bit packing via mul/add, cast to u8 only at the store
                byte = d + e_ext * 4 + f_ext * 8
                j_idx2 = karange + (i - dmax)
                cell_ok = (
                    (j_idx2 >= 0) & (j_idx2 <= tlen) & lane_ok
                    & (i <= slen)
                )
                dbuf[slot, :, r, :] = jnp.where(
                    cell_ok, byte, 0
                ).astype(jnp.uint8)

            # freeze rows beyond each pair's length (one lane-broadcast)
            H = jnp.where(i <= slen, H_new, H)

            if track_local:
                best_vec = jnp.maximum(best_vec, H)
                if with_dirs:
                    # j-validity matters here: local_start floors even
                    # out-of-matrix lanes to 0, so a tie-at-0 argmax
                    # could otherwise record an end cell with j outside
                    # [0, tlen] (the walker would index garbage)
                    jv = karange + (i - dmax)
                    masked = jnp.where(
                        lane_ok & (jv >= 0) & (jv <= tlen), H_new, NEG
                    )
                    rowmax = jnp.max(masked, axis=1, keepdims=True)
                    rowarg = jnp.argmax(masked, axis=1).astype(
                        jnp.int32
                    )[:, None]
                    better = (i <= slen) & (rowmax > best_sc[:])
                    bi_sc[:] = jnp.where(better, i, bi_sc[:])
                    bk_sc[:] = jnp.where(better, rowarg, bk_sc[:])
                    best_sc[:] = jnp.where(better, rowmax, best_sc[:])
            if track_col:
                # j == |T| column: lane k = tlen - i + dmax this row
                kcol = tlen - i + dmax
                colvec = jnp.where((karange == kcol) & (i <= slen), H, NEG)
                best_vec = jnp.maximum(best_vec, colvec)
                if with_dirs:
                    colval = jnp.max(colvec, axis=1, keepdims=True)
                    better = colval > best_sc[:]
                    bi_sc[:] = jnp.where(better, i, bi_sc[:])
                    bk_sc[:] = jnp.where(better, kcol, bk_sc[:])
                    best_sc[:] = jnp.where(better, colval, best_sc[:])
                    # last row (i == slen): any j in matrix
                    jv = karange + (i - dmax)
                    masked = jnp.where(
                        lane_ok & (jv >= 0) & (jv <= tlen), H_new, NEG
                    )
                    rowmax = jnp.max(masked, axis=1, keepdims=True)
                    rowarg = jnp.argmax(masked, axis=1).astype(
                        jnp.int32
                    )[:, None]
                    better = (i == slen) & (rowmax > best_sc[:])
                    bi_sc[:] = jnp.where(better, i, bi_sc[:])
                    bk_sc[:] = jnp.where(better, rowarg, bk_sc[:])
                    best_sc[:] = jnp.where(better, rowmax, best_sc[:])
        if with_dirs:
            dirs_dma(slot, c).start()
        return (H, F, best_vec)

    H, F, best_vec = jax.lax.fori_loop(
        0, n_chunks, chunk_body,
        (H0, jnp.full((BT, W), NEG), best0_vec),
    )
    if with_dirs:
        # drain the last two dirs write-outs
        @pl.when(n_chunks >= 2)
        def _():
            dirs_dma(jnp.int32(n_chunks - 2) % 2, n_chunks - 2).wait()
        dirs_dma(jnp.int32(n_chunks - 1) % 2, n_chunks - 1).wait()

    # post-loop extraction (frozen rows: H holds each pair's last real row)
    kcorner = tlen - slen + dmax
    corner = jnp.max(
        jnp.where((karange == kcorner) & lane_ok, H, NEG),
        axis=1, keepdims=True,
    )
    if flags.free_end_edges:
        lastrow = jnp.max(jnp.where(lane_ok, H, NEG), axis=1, keepdims=True)
        score = jnp.maximum(
            jnp.max(best_vec, axis=1, keepdims=True), lastrow
        )
    elif flags.local_end:
        score = jnp.max(best_vec, axis=1, keepdims=True)
    else:
        score = corner
    score_ref[:] = score
    if with_dirs and (flags.local_end or flags.free_end_edges):
        ei_ref[:] = bi_sc[:]
        ek_ref[:] = bk_sc[:]
    elif flags.local_end or flags.free_end_edges:
        # score-only solve does not track the optimum cell; report -1
        # sentinels rather than the (wrong) matrix corner
        ei_ref[:] = jnp.full(ei_ref.shape, -1, jnp.int32)
        ek_ref[:] = jnp.full(ek_ref.shape, 0, jnp.int32)
    else:
        ei_ref[:] = slen
        ek_ref[:] = kcorner


def banded_dp_pallas(s_codes, t_codes, s_lens, t_lens, dmin, *, W: int,
                     subst, go: float, ge: float, flags: ModeFlags,
                     w_eff=None, A: int = 4, block_b: int = 64,
                     interpret: bool = False, with_dirs: bool = False):
    """Pallas-backed batched banded DP; contract of
    :func:`biseqt_tpu.ops.banded_dp.banded_dp`.

    ``with_dirs=True`` additionally streams per-cell direction bytes
    (identical format to the lax engine) to HBM chunk-by-chunk, and tracks
    the optimum cell for local/overlap modes — the full ``pwlib`` parity
    path for big batches; host traceback walks the returned array.

    ``go``/``ge`` are static floats (baked into the kernel); ``W`` must be
    a multiple of 128; ``go <= 0`` and ``ge <= 0`` are required by the
    poisoned-lane validity scheme.  ``subst`` must be a concrete (host)
    array — uniform match/mismatch matrices compile to a 2-op fast path.
    Sequences of any length stream from HBM (no VMEM residency limit).
    """
    assert W % 128 == 0, "pad band width to a multiple of 128"
    assert go <= 0 and ge <= 0, "kernel requires nonpositive gap scores"
    subst_np = np.asarray(jax.device_get(subst), np.float32)
    diag_vals = np.diag(subst_np)
    off_vals = subst_np[~np.eye(A, dtype=bool)]
    uniform = None
    if np.allclose(diag_vals, diag_vals[0]) and (
            off_vals.size == 0 or np.allclose(off_vals, off_vals[0])):
        uniform = (float(diag_vals[0]),
                   float(off_vals[0]) if off_vals.size else 0.0)
    return _banded_dp_pallas_jit(
        s_codes, t_codes, s_lens, t_lens, dmin,
        jnp.asarray(subst_np), w_eff, W=W, go=float(go), ge=float(ge),
        flags=flags, A=A, block_b=block_b, interpret=interpret,
        uniform=uniform, with_dirs=with_dirs,
    )


@functools.partial(
    jax.jit,
    static_argnames=("W", "go", "ge", "flags", "block_b", "interpret", "A",
                     "uniform", "with_dirs"),
)
def _banded_dp_pallas_jit(s_codes, t_codes, s_lens, t_lens, dmin, subst,
                          w_eff, *, W: int, go: float, ge: float,
                          flags: ModeFlags, A: int, block_b: int,
                          interpret: bool, uniform, with_dirs: bool = False):
    B, LS = s_codes.shape
    LT = t_codes.shape[1]
    LSp = _round_up(LS, _R)
    Bp = _round_up(B, block_b)

    s_codes = s_codes.astype(jnp.int32)
    t_codes = t_codes.astype(jnp.int32)
    dmin = dmin.astype(jnp.int32)
    if w_eff is None:
        w_eff = jnp.full((B,), W, jnp.int32)
    dmax = dmin + (W - 1)

    def padb(x, fill):
        return jnp.pad(x, ((0, Bp - B),), constant_values=fill)

    s_codes = jnp.pad(s_codes, ((0, Bp - B), (0, LSp - LS)),
                      constant_values=0)
    s_lens_p = padb(s_lens.astype(jnp.int32), 1)
    t_lens_p = padb(t_lens.astype(jnp.int32), 1)
    dmax_p = padb(dmax, 0)
    weff_p = padb(w_eff.astype(jnp.int32), W)

    # band frame: T2[b, y] = T[b, y - dmax_b] for y in [0, LSp + W).
    # A row-dependent gather is ~3x the kernel's own cost on TPU, so the
    # variable shift is done as a binary-decomposed batched roll: each of
    # ~15 steps is a full-width rotate + select (pure VPU), and the final
    # validity mask blanks wrapped/out-of-range lanes.
    Y = LSp + W
    # ring length: a valid cell reads src = y - dmax in [0, tlen); with
    # dmax < 0, src exceeds LSp + W, and a ring of that length would
    # alias T[src - ring] UNDER A PASSING MASK (silently wrong letters
    # exactly when the band sits left of the main diagonal and T is
    # long).  Cover LT as well so every maskable src is representable;
    # the kernel still reads only the first Y columns.
    Y2 = Y + LT
    t_codes_p = jnp.pad(
        t_codes.astype(jnp.int8),
        ((0, Bp - B), (0, max(Y2 - LT, 0))), constant_values=0,
    )[:, :Y2]
    # normalize to a nonnegative rotate amount in [0, Y2)
    shift = jnp.mod(dmax_p[:, None], Y2)
    t2 = t_codes_p
    bit = 1
    while bit < Y2:
        t2 = jnp.where(
            (shift & bit) != 0, jnp.roll(t2, bit, axis=1), t2
        )
        bit <<= 1
    yy = jnp.arange(Y2, dtype=jnp.int32)[None, :]
    src = yy - dmax_p[:, None]
    t2 = jnp.where(
        (src >= 0) & (src < t_lens_p[:, None]), t2.astype(jnp.int32), -1
    )[:, :Y]
    subst_flat = subst.reshape(1, A * A)

    BT = block_b
    grid = (Bp // BT,)
    kernel = functools.partial(
        _kernel, W=W, LSp=LSp, BT=BT, A=A, go=float(go), ge=float(ge),
        flags=flags, uniform=uniform, with_dirs=with_dirs,
    )
    vspec = lambda shape: pl.BlockSpec(
        shape, lambda b: (b, 0), memory_space=pltpu.VMEM
    )
    out_specs = [vspec((BT, 1))] * 3
    out_shape = [
        jax.ShapeDtypeStruct((Bp, 1), jnp.float32),
        jax.ShapeDtypeStruct((Bp, 1), jnp.int32),
        jax.ShapeDtypeStruct((Bp, 1), jnp.int32),
    ]
    scratch = [
        pltpu.VMEM((2, BT, _R), jnp.int32),         # s double buffer
        pltpu.VMEM((2, BT, W + _R), jnp.int32),     # t2 double buffer
        pltpu.SemaphoreType.DMA((2, 2)),
    ]
    if with_dirs:
        out_specs = out_specs + [pl.BlockSpec(memory_space=pl.ANY)]
        out_shape = out_shape + [
            jax.ShapeDtypeStruct((Bp, LSp, W), jnp.uint8)
        ]
        scratch = scratch + [
            pltpu.VMEM((2, BT, _R, W), jnp.uint8),  # dirs double buffer
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((BT, 1), jnp.float32),       # best
            pltpu.VMEM((BT, 1), jnp.int32),         # bi
            pltpu.VMEM((BT, 1), jnp.int32),         # bk
        ]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            vspec((BT, 1)),
            vspec((BT, 1)),
            vspec((BT, 1)),
            vspec((BT, 1)),
            pl.BlockSpec((1, A * A), lambda b: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),   # s codes (HBM)
            pl.BlockSpec(memory_space=pl.ANY),   # t2 stream (HBM)
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            # the unrolled row body gets single-assignment stack slots from
            # Mosaic; allow it to use more than the 16M default (v5e has
            # 128M physical VMEM)
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(dmax_p[:, None], s_lens_p[:, None], t_lens_p[:, None],
      weff_p[:, None], subst_flat, s_codes, t2)
    if with_dirs:
        score, ei, ek, dirs_out = out
        dirs = dirs_out[:B, :LS]
    else:
        score, ei, ek = out
        dirs = jnp.zeros((), jnp.uint8)

    score = score[:B, 0]
    ei = ei[:B, 0]
    ek = ek[:B, 0]
    ej = jnp.where(ei < 0, -1, ei - dmax + ek)
    return DPResult(score=score, end_i=ei, end_j=ej, dirs=dirs)
