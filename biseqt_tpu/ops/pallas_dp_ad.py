"""Pallas TPU kernel: antidiagonal dual-pair banded affine-gap DP (score).

Second-generation throughput kernel for the reference's C hot loop
(``biseqt/pwlib — dptable_solve``).  The row-form kernel
(:mod:`.pallas_dp`) iterates DP *rows*; its per-row cost is dominated by
the within-row affine E-chain (a log-depth prefix max, ~24 of ~40 vector
ops per row).  This kernel removes the prefix max entirely by iterating
**antidiagonals** (a = i + j): every DP predecessor then lives in a
*previous* wavefront —

  * diag (i-1, j-1): same lane, step a-2;
  * E-pred (i, j-1):  lane d+1, step a-1 (one static lane shift);
  * F-pred (i-1, j):  lane d-1, step a-1;

so the affine chains become single shifted maxes and the step body is
~17 vector ops instead of ~40.

The classic cost of the antidiagonal layout is lattice parity: cell
(i, j) exists on lane d = i - j only when (a + d) is even, which idles
half the lanes.  Here the odd sublattice is **a second, independent
pair**: tile row b holds pairs (2b, 2b+1), pair p's band start is
adjusted so that dmin' ≡ p (mod 2), and the interleaved char streams
SI[z] = S_{z mod 2}[(z + dmin') / 2] / TI[u] (built with the same
binary-decomposed per-pair roll as the row kernel's band frame) feed
both pairs from one sliding window — 100% lane utilization, zero extra
steps.

Score extraction: per-step maxima accumulate into two alternating
vectors (even/odd step a); because pair p's slots satisfy
(a + k) ≡ p (mod 2), the post-loop separation by lane parity recovers
per-pair scores exactly.  Mode trackers (local max, overlap rays,
global corner) accumulate into the same two vectors through per-step
masks.

Transcripts: ``with_dirs=True`` streams per-cell direction nibbles to
HBM in a packed antidiagonal layout (two steps per byte; see
:func:`banded_dp_pallas_ad`), walked on host by the batched C++ tracer
``native.traceback_batch_ad``.  Contract and oracle:
:func:`.banded_dp.banded_dp`.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .banded_dp import NEG, DPResult, ModeFlags

__all__ = ["banded_dp_pallas_ad", "parity_adjusted_dmin"]


def parity_adjusted_dmin(dmin, pair_index):
    """The kernel's per-pair band start ``dmin'`` (``dmin`` adjusted
    upward so ``dmin' ≡ pair (mod 2)``) — the lane addressing contract
    of the antidiagonal dirs plane (`native.traceback_batch_ad`).
    One definition, shared by the kernel wrapper and every consumer."""
    return dmin + (pair_index - dmin) % 2

_R = 128          # antidiagonal steps per chunk (DMA granularity, unroll)
PAD_S = -1        # s-stream pad code (never equals a t code)
PAD_T = -2


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(dmin0_ref, dmin1_ref, lo0_ref, lo1_ref, hi0_ref, hi1_ref,
            sl0_ref, sl1_ref, tl0_ref, tl1_ref, subst_ref,
            si_hbm, tir_hbm,
            *rest,
            W: int, Apad: int, BT: int, A: int, go: float, ge: float,
            flags: ModeFlags, uniform, R: int, strip: int = 0,
            with_dirs: bool = False, i8win: bool = False,
            subst_planes: bool = False, subst_packed: bool = False,
            pack_vmin: float = 0.0, pack_g: float = 1.0):
    if with_dirs:
        (score0_ref, score1_ref, dirs_hbm, ma_ref, mb_ref, aa_ref, ab_ref,
         sbuf, tbuf, dbuf, sems) = rest
    else:
        score0_ref, score1_ref, sbuf, tbuf, sems = rest
    b = pl.program_id(0)
    row0 = b * BT
    karange = jax.lax.broadcasted_iota(jnp.int32, (BT, W), 1)
    even_k = (karange % 2) == 0

    dmin0 = dmin0_ref[:, :1]
    dmin1 = dmin1_ref[:, :1]
    lo0, lo1 = lo0_ref[:, :1], lo1_ref[:, :1]   # live-lane range [lo, hi)
    hi0, hi1 = hi0_ref[:, :1], hi1_ref[:, :1]
    sl0, sl1 = sl0_ref[:, :1], sl1_ref[:, :1]
    tl0, tl1 = tl0_ref[:, :1], tl1_ref[:, :1]

    # live-lane masks per slot parity of the step index a.  Pair p owns
    # slots with (a + k) ≡ p (mod 2) (dmin'_p ≡ p by construction), so at
    # even a, even lanes are pair 0; at odd a they swap.  The effective
    # band is the TOP w_eff diagonals (the engine-wide convention: pw.py
    # passes dmin = dmax - W + 1 and w_eff = the requested width).
    # additive float masks (0 on live lanes, NEG on dead): Mosaic cannot
    # select between two i1 vectors (i8->i1 trunc unsupported), and an
    # add is the same single op as the select would be
    okf0 = jnp.where((karange >= lo0) & (karange < hi0), 0.0, NEG)
    okf1 = jnp.where((karange >= lo1) & (karange < hi1), 0.0, NEG)
    lane_okf_aeven = jnp.where(even_k, okf0, okf1)
    lane_okf_aodd = jnp.where(even_k, okf1, okf0)

    # E/F lane shifts are circular rolls and MUST mask the wrap
    # destination lane (W-1 for E, 0 for F) every step.  A round-2
    # attempt to drop these masks ("the wrap source is a dead lane, and
    # dead lanes are poisoned") was WRONG: the additive lane masks
    # poison H only — the E/F carries are never damped on dead lanes
    # (in drifted form they decay exactly at the legitimate ge-per-lane
    # rate), so a live value that wraps re-enters the live band after
    # paying only the in-band gap cost while having illegally teleported
    # its coordinate by W — a phantom path that overscores whenever the
    # band's bottom edge is richer than its top (repro: rich d=0 edge +
    # corner on the d=126 edge -> 176 vs true 72).  Additive masks (one
    # add each, same cost as a select).
    wrapmask_E = jnp.where(karange == W - 1, NEG, 0.0)
    wrapmask_F = jnp.where(karange == 0, NEG, 0.0)

    sltl0 = sl0 + tl0
    sltl1 = sl1 + tl1
    kc0 = sl0 - tl0 - dmin0        # global corner lane (i=slen, j=tlen)
    kc1 = sl1 - tl1 - dmin1

    # drifted-state formulation: every carried value represents
    # H'(a) = H(a) + gd*a with gd = -ge, which cancels the per-step +ge
    # of both gap chains (E' = max(H' + go, E'), F' likewise) — two fewer
    # vector adds per step.  Substitution constants absorb +2*gd (diag
    # predecessor is two steps back); clamps/trackers compare against the
    # per-step scalar ga = gd*a.
    gd = -ge
    if uniform is None:
        srows = [
            [subst_ref[0, a * A + bb] + 2.0 * gd for bb in range(A)]
            for a in range(A)
        ]
    if subst_packed:
        # packed-planes path (round 4, protein-scale alphabets): the
        # matrix is on an integer grid subst = vmin + g*code with code
        # in [0, 30] (host-verified), so FOUR s-letters' t-value planes
        # pack into ONE f32 plane as base-32 digits (max 31*(32^4-1)/31
        # = 2^20-1 < 2^24: exact).  Per step the A-way plane select
        # shrinks to a P = ceil(A/4)-way select and the A plane rolls
        # to P rolls; extraction is one multiply by 2^-5m (a POWER OF
        # TWO, so the product is exact), an i32 floor-cast and &31.
        # Code 31 is the t-PAD sentinel in every digit slot.
        KP = 4
        PP = (A + KP - 1) // KP
        inv_g = 1.0 / pack_g
        _crow = [
            [jnp.round((subst_ref[0, a * A + bb] - pack_vmin) * inv_g)
             for bb in range(A)] for a in range(A)
        ]
        pcrows = [
            [sum(_crow[p * KP + k][bb] * float(32 ** k)
                 for k in range(KP) if p * KP + k < A)
             for bb in range(A)]
            for p in range(PP)
        ]
        PACK_SENT = jnp.float32(31 * (32 ** 4 - 1) // 31)  # 31 everywhere

    def sub_score(s_win, t_win):
        if uniform is not None:
            m, mm = uniform
            return jnp.where(s_win == t_win, m + 2.0 * gd, mm + 2.0 * gd)
        base = jnp.zeros(t_win.shape, jnp.float32)
        for a in range(A):
            row = jnp.full(t_win.shape, srows[a][0], jnp.float32)
            for bb in range(1, A):
                row = jnp.where(t_win == bb, srows[a][bb], row)
            base = jnp.where(s_win == a, row, base)
        # pads never match; poison both-sided pads for non-local safety
        return jnp.where(
            (s_win < 0) | (t_win < 0), jnp.float32(-1.0 + 2.0 * gd), base
        )

    n_chunks = Apad // R
    TLEN = Apad + W               # reversed t-stream length

    def start_dma(slot, c):
        pltpu.make_async_copy(
            si_hbm.at[pl.ds(row0, BT), pl.ds(c * R, W + R)],
            sbuf.at[slot], sems.at[slot, 0],
        ).start()
        tbase = pl.multiple_of(Apad - R - c * R, 128)
        pltpu.make_async_copy(
            tir_hbm.at[pl.ds(row0, BT), pl.ds(tbase, W + R)],
            tbuf.at[slot], sems.at[slot, 1],
        ).start()

    def wait_dma(slot, c):
        pltpu.make_async_copy(
            si_hbm.at[pl.ds(row0, BT), pl.ds(c * R, W + R)],
            sbuf.at[slot], sems.at[slot, 0],
        ).wait()
        tbase = pl.multiple_of(Apad - R - c * R, 128)
        pltpu.make_async_copy(
            tir_hbm.at[pl.ds(row0, BT), pl.ds(tbase, W + R)],
            tbuf.at[slot], sems.at[slot, 1],
        ).wait()

    if with_dirs:
        # two antidiagonal steps pack into one byte (low nibble = even
        # step of the packed row, high nibble = odd) — halves the HBM
        # write, the D2H transfer, and the VMEM staging of the dominant
        # with_dirs cost (~W bytes per DP cell otherwise)
        def dirs_dma(slot, c):
            # dirs plane is ROW-MAJOR [r, b2, x]; the [R/2, BT, W] chunk
            # lands at packed rows [c*R/2, (c+1)*R/2), pair cols
            # [row0, row0+BT) — each row's [BT, W] block is contiguous
            return pltpu.make_async_copy(
                dbuf.at[slot],
                dirs_hbm.at[
                    pl.ds(pl.multiple_of(c * (R // 2), R // 2), R // 2),
                    pl.ds(row0, BT), :,
                ],
                sems.at[slot, 2],
            )

    start_dma(0, 0)

    # carries at loop entry represent state at a = -1 (H1, E, F) and
    # a = -2 (H2).  The (0, 0) = 0 boundary for global-like modes is
    # injected through H2: sub at (0, 0) is deterministic (both chars
    # PAD -> mm or poison), so seeding H2[k0] = -sub00 makes the a = 0
    # recurrence produce exactly H(0,0) = 0, and the E/F chains then
    # grow the gap boundary rays automatically.
    need_corner_seed = not (flags.local_start or flags.free_start_edges)
    if uniform is not None:
        sub00 = uniform[1] + 2.0 * gd   # drifted pad-mismatch constant
    else:
        sub00 = -1.0 + 2.0 * gd
    if need_corner_seed:
        k00 = -dmin0   # lane of (0,0) for pair 0 (even: a=0, k even)
        k01 = -dmin1
        seed = jnp.where(
            (karange == k00) | (karange == k01), -sub00, NEG
        ).astype(jnp.float32)
        H2_0 = seed
    else:
        H2_0 = jnp.full((BT, W), NEG)

    track_local = flags.local_end
    track_rays = flags.free_end_edges
    track_corner = not (track_local or track_rays)

    def chunk_body(c, carry):
        if with_dirs:
            H2, H1, E, F, Ma, Mb, Aa, Ab = carry
        else:
            H2, H1, E, F, Ma, Mb = carry
        slot = c % 2

        @pl.when(c + 1 < n_chunks)
        def _():
            start_dma(1 - slot, c + 1)

        if with_dirs and strip not in (12, 14):
            # the slot's previous dirs write-out must have landed before
            # this chunk overwrites dbuf[slot]
            @pl.when(c >= 2)
            def _():
                dirs_dma(slot, c - 2).wait()

        wait_dma(slot, c)
        nib = None  # low nibble of the pending packed dirs byte
        # streams are int8 in HBM/VMEM (4x less DMA + prep traffic); cast
        # the whole chunk once — int8 sub-tile value slicing trips a
        # Mosaic relayout bug, i32 slices are fine.
        #
        # Window access: an unaligned [BT, W] slice of a [BT, W+R] value
        # costs ~5 vector ops in Mosaic (measured: the two per-step
        # slices were >half the kernel's runtime).  Instead carry the
        # whole chunk as a register value and ROLL it one lane per step;
        # the window is then the vreg-aligned [:, :W] view (free).  The
        # s window slides forward (roll left), the t window backward
        # (roll right, pre-rolled to its chunk-end start); wrapped lanes
        # never enter the [:, :W] view within a chunk.
        # i8win (uniform fast path only): keep the chunks int8 — the two
        # per-step rolls then move 4x fewer vregs (the permute unit is
        # the kernel's dominant cost; see docs/kernels.md ceiling
        # analysis) and the eq compare runs at i8 width; the where()
        # producing the f32 sub plane runs at full chunk width so the
        # [:, :W] view stays vreg-aligned (free).
        if i8win and uniform is not None:
            s_chunk = sbuf[slot]
            t_chunk = pltpu.roll(tbuf[slot], W + 1, 1)
        else:
            s_chunk = sbuf[slot].astype(jnp.int32)
            t_chunk = pltpu.roll(tbuf[slot].astype(jnp.int32), W + 1, 1)
        if subst_planes:
            # general-substitution PLANES path (protein-scale A): the
            # per-step A^2 select chain amortizes to one per-chunk
            # build of A t-VALUE planes (plane a = subst[a, t_chunk],
            # PAD poisoned), and the per-step cost drops to A plane
            # rolls + an A-way select on the s window — O(A) per step
            # instead of O(A^2) (round-4; see docs/kernels.md)
            poison = jnp.float32(-1.0 + 2.0 * gd)
            planes = []
            for a_ in range(A):
                rowv = jnp.full(t_chunk.shape, srows[a_][0], jnp.float32)
                for bb in range(1, A):
                    rowv = jnp.where(t_chunk == bb, srows[a_][bb], rowv)
                planes.append(jnp.where(t_chunk < 0, poison, rowv))
        elif subst_packed:
            # packed planes: P = ceil(A/4) planes, each holding 4
            # s-letters' integer code rows as base-32 digits; t-PAD
            # lanes carry the 31 sentinel in every digit.  The s side
            # precomputes, per chunk, the per-lane plane index (qidx =
            # s // 4, -1 for s-PAD) and the digit-extraction scale
            # (2^-5m for m = s % 4); both roll with the s window.
            poison = jnp.float32(-1.0 + 2.0 * gd)
            pplanes = []
            for p in range(PP):
                rowv = jnp.full(t_chunk.shape, pcrows[p][0], jnp.float32)
                for bb in range(1, A):
                    rowv = jnp.where(t_chunk == bb, pcrows[p][bb], rowv)
                pplanes.append(jnp.where(t_chunk < 0, PACK_SENT, rowv))
            sfq = (s_chunk.astype(jnp.float32)
                   * jnp.float32(0.25)).astype(jnp.int32)  # floor, s >= 0
            qidx = jnp.where(s_chunk < 0, -1, sfq)
            mrem = s_chunk - 4 * sfq                       # s % 4
            pscale = jnp.where(
                mrem == 1, jnp.float32(2.0 ** -5),
                jnp.where(mrem == 2, jnp.float32(2.0 ** -10),
                          jnp.where(mrem == 3, jnp.float32(2.0 ** -15),
                                    jnp.float32(1.0))))
        a0 = c * R
        ga0 = (c * (R * gd)).astype(jnp.float32) if gd else jnp.float32(0)

        for r in range(R):
            a = a0 + r                      # traced (c) + static (r)
            if strip in (1, 2):  # perf diagnostics: no window rolls / sub
                sub = jnp.float32(-1.0 + 2.0 * gd)
            elif strip == 3:  # diagnostics: rolls with shift 1 only
                # (garbage scores — measures whether roll cost scales
                # with the shift amount's binary stages)
                sub = sub_score(s_chunk[:, :W], t_chunk[:, :W])
                if r + 1 < R:
                    s_chunk = pltpu.roll(s_chunk, 1, 1)
                    t_chunk = pltpu.roll(t_chunk, 1, 1)
            elif i8win and uniform is not None:
                m_u, mm_u = uniform
                sub = jnp.where(
                    s_chunk == t_chunk,
                    jnp.float32(m_u + 2.0 * gd),
                    jnp.float32(mm_u + 2.0 * gd),
                )[:, :W]
                if r + 1 < R:
                    s_chunk = pltpu.roll(s_chunk, W + R - 1, 1)
                    t_chunk = pltpu.roll(t_chunk, 1, 1)
            elif subst_planes:
                # A-way select over the prebuilt value planes; s PAD
                # (-1) matches no letter and keeps the poison default
                s_win = s_chunk[:, :W]
                sub = jnp.full((BT, W), poison, jnp.float32)
                for a_ in range(A):
                    sub = jnp.where(s_win == a_, planes[a_][:, :W], sub)
                if r + 1 < R:
                    s_chunk = pltpu.roll(s_chunk, W + R - 1, 1)
                    planes = [pltpu.roll(p, 1, 1) for p in planes]
            elif subst_packed:
                # P-way packed-plane select + exact base-32 digit
                # extraction (see the chunk-entry comment); code 31 =
                # t-PAD, qidx < 0 = s-PAD, both -> poison
                qw = qidx[:, :W]
                pk = pplanes[0][:, :W]
                for p in range(1, PP):
                    pk = jnp.where(qw == p, pplanes[p][:, :W], pk)
                vi = (pk * pscale[:, :W]).astype(jnp.int32)
                low = vi & 31
                subv = (low.astype(jnp.float32) * jnp.float32(pack_g)
                        + jnp.float32(pack_vmin + 2.0 * gd))
                sub = jnp.where((low == 31) | (qw < 0), poison, subv)
                if r + 1 < R:
                    qidx = pltpu.roll(qidx, W + R - 1, 1)
                    pscale = pltpu.roll(pscale, W + R - 1, 1)
                    pplanes = [pltpu.roll(p, 1, 1) for p in pplanes]
            else:
                sub = sub_score(s_chunk[:, :W], t_chunk[:, :W])
                if r + 1 < R:
                    s_chunk = pltpu.roll(s_chunk, W + R - 1, 1)
                    t_chunk = pltpu.roll(t_chunk, 1, 1)

            ga = ga0 + jnp.float32(gd * r)   # scalar drift at step a
            HpGo = H1 + go
            if with_dirs:
                # gap-extension flags BEFORE the chain update (dest cell
                # (i,j) reads its source's choice), rolled with the same
                # lane shift as the chain itself; pre-weighted 4.0/8.0 so
                # the byte pack below is two adds.  Ties prefer extension
                # (matches the lax engine's P == shift(P) convention).
                if strip == 10:   # diagnostics: no gap-extend flags
                    e4 = jnp.zeros((BT, W), jnp.float32)
                    f8 = jnp.zeros((BT, W), jnp.float32)
                else:
                    e4 = pltpu.roll(
                        jnp.where(E >= HpGo, 4.0, 0.0), W - 1, 1
                    )
                    f8 = pltpu.roll(jnp.where(F >= HpGo, 8.0, 0.0), 1, 1)
            E = pltpu.roll(jnp.maximum(HpGo, E), W - 1, 1) + wrapmask_E
            F = pltpu.roll(jnp.maximum(HpGo, F), 1, 1) + wrapmask_F
            diag_cand = H2 + sub
            H_new = jnp.maximum(jnp.maximum(diag_cand, E), F)
            if flags.local_start:
                H_new = jnp.maximum(H_new, ga)
            if flags.free_start_edges:
                # boundary rays i == 0 (k = -dmin' - a) and j == 0
                # (k = a - dmin') are free starts: H = max(H, 0) there.
                ray = (
                    (karange == (-dmin0 - a)) | (karange == (a - dmin0))
                    | (karange == (-dmin1 - a)) | (karange == (a - dmin1))
                )
                H_new = jnp.maximum(H_new, jnp.where(ray, ga, NEG))
            if with_dirs:
                # direction byte (same bit semantics as the row kernel /
                # lax engine: bits 0-1 H-source 0=stop/1=diag/2=E/3=F,
                # bit 2 E-extend, bit 3 F-extend), in the ANTIDIAGONAL
                # layout dirs[a, b2, x] (row-major): cell (i, j) of pair p sits at
                # a = i+j, x = (i-j) - dmin'_p.  Every (a, x) slot
                # belongs to exactly ONE pair (all walk moves preserve
                # (a + x) mod 2), so the two packed pairs share the byte
                # plane without masking; out-of-band slots hold garbage
                # the walker never reads.  Comparisons use the pre-mask
                # H_new (the additive lane mask below would break the
                # equality tests).
                if strip == 11:   # diagnostics: no H-source select chain
                    d = jnp.full((BT, W), 1.0, jnp.float32)
                else:
                    d = jnp.where(
                        H_new == diag_cand, 1.0,
                        jnp.where(H_new == E, 2.0, 3.0),
                    )
                    if flags.local_start:
                        # fresh local start: value == the drifted zero
                        # and the diag source lost (mirrors the lax
                        # override)
                        d = jnp.where(
                            (H_new == ga) & (diag_cand < ga), 0.0, d
                        )
                byte = d + e4 + f8
                if strip == 12:   # diagnostics: no nibble pack/store/DMA
                    pass
                elif r % 2 == 0:
                    nib = byte
                else:
                    # full-tile aligned [BT, W] store (row-major dbuf)
                    dbuf[slot, r // 2, :, :] = (
                        nib + 16.0 * byte
                    ).astype(jnp.int32).astype(jnp.uint8)
            H_new = H_new + (
                lane_okf_aeven if r % 2 == 0 else lane_okf_aodd
            )

            if track_local:
                tracked = H_new
            elif track_rays:
                # overlap ends: i == slen ray (k = 2 slen - dmin' - a,
                # gated to j in range) and j == tlen ray
                # (k = a - dmin' - 2 tlen, gated to i in range)
                cond = (
                    ((karange == (2 * sl0 - dmin0 - a)) & (a >= sl0)
                     & (a <= sltl0))
                    | ((karange == (a - dmin0 - 2 * tl0)) & (a >= tl0)
                       & (a <= sltl0))
                    | ((karange == (2 * sl1 - dmin1 - a)) & (a >= sl1)
                       & (a <= sltl1))
                    | ((karange == (a - dmin1 - 2 * tl1)) & (a >= tl1)
                       & (a <= sltl1))
                )
                tracked = jnp.where(cond, H_new, NEG)
            else:
                cond = (
                    ((a == sltl0) & (karange == kc0))
                    | ((a == sltl1) & (karange == kc1))
                )
                tracked = jnp.where(cond, H_new, NEG)
            # accumulators drift +2*gd per own update so maxima
            # across steps compare drift-consistently
            if strip == 2:
                pass
            elif r % 2 == 0:
                Ms = Ma + (2.0 * gd)
                if with_dirs and strip != 13:
                    # per-lane step-of-max: a strict win records step a
                    # (end-cell recovery: lane argmax post-loop + this)
                    Aa = jnp.where(tracked > Ms, a, Aa)
                Ma = jnp.maximum(Ms, tracked)
            else:
                Ms = Mb + (2.0 * gd)
                if with_dirs and strip != 13:
                    Ab = jnp.where(tracked > Ms, a, Ab)
                Mb = jnp.maximum(Ms, tracked)

            H2 = H1
            H1 = H_new
        if with_dirs:
            if strip not in (12, 14):
                dirs_dma(slot, c).start()
            return (H2, H1, E, F, Ma, Mb, Aa, Ab)
        return (H2, H1, E, F, Ma, Mb)

    neg = jnp.full((BT, W), NEG)
    init = (H2_0, neg, neg, neg, neg, neg)
    if with_dirs:
        zi = jnp.full((BT, W), -1, jnp.int32)
        init = init + (zi, zi)
        out = jax.lax.fori_loop(0, n_chunks, chunk_body, init)
        Ma, Mb, Aa, Ab = out[4], out[5], out[6], out[7]
        # drain the last two dirs write-outs
        if strip not in (12, 14):
            if n_chunks >= 2:
                dirs_dma((n_chunks - 2) % 2, n_chunks - 2).wait()
            dirs_dma((n_chunks - 1) % 2, n_chunks - 1).wait()
        aa_ref[:] = Aa
        ab_ref[:] = Ab
    else:
        _, _, _, _, Ma, Mb = jax.lax.fori_loop(
            0, n_chunks, chunk_body, init
        )

    # undo the drift: after its last update at step a, an accumulator
    # holds gd*a + max H; Ma's last update was a = Apad - 2, Mb's Apad - 1
    Ma = Ma - jnp.float32(gd * (Apad - 2))
    Mb = Mb - jnp.float32(gd * (Apad - 1))
    if with_dirs:
        ma_ref[:] = Ma
        mb_ref[:] = Mb
    # pair p's slots have (a + k) ≡ p: even-step accumulator Ma holds
    # pair 0 on even lanes / pair 1 on odd lanes; Mb the reverse.
    p0 = jnp.maximum(jnp.where(even_k, Ma, NEG), jnp.where(even_k, NEG, Mb))
    p1 = jnp.maximum(jnp.where(even_k, Mb, NEG), jnp.where(even_k, NEG, Ma))
    # clamp: the additive lane masks push dead lanes below NEG (they
    # accumulate -1e30 per step); report dead results as exactly NEG
    score0_ref[:] = jnp.maximum(jnp.max(p0, axis=1, keepdims=True), NEG)
    score1_ref[:] = jnp.maximum(jnp.max(p1, axis=1, keepdims=True), NEG)


def _shift_stream(codes, shifts, valid_len, out_len, pad):
    """out[b, x] = codes[b, x + shifts[b]] if 0 <= x+shift < valid_len
    else pad — batched variable shift as a binary-decomposed roll chain
    (XLA gathers are ~3x a whole DP kernel on TPU; rolls are pure VPU).
    """
    B, L = codes.shape
    if out_len > L:
        codes = jnp.pad(codes, ((0, 0), (0, out_len - L)),
                        constant_values=pad)
    else:
        codes = codes[:, :out_len]
    rot = jnp.mod(shifts, out_len)        # roll left by `shifts`
    out = codes
    bit = 1
    while bit < out_len:
        out = jnp.where(
            (rot & bit)[:, None] != 0, jnp.roll(out, -bit, axis=1), out
        )
        bit <<= 1
    xx = jnp.arange(out_len, dtype=jnp.int32)[None, :]
    src = xx + shifts[:, None]
    return jnp.where((src >= 0) & (src < valid_len[:, None]), out, pad)


def _int_grid(subst_np, max_code: int = 30):
    """``(vmin, g)`` if every entry is ``vmin + g * k`` with integer
    ``k`` in ``[0, max_code]`` (g found by float Euclid over the unique
    offsets), else None.  All standard biological matrices (BLOSUM,
    PAM, unit match/mismatch) are integer grids; the packed-planes
    kernel path needs one to encode values as base-32 digits."""
    vals = np.unique(subst_np.astype(np.float64))
    vmin = float(vals[0])
    diffs = vals[1:] - vmin
    if diffs.size == 0:
        return None                      # constant matrix
    g = 0.0
    for d in diffs:                      # float gcd (Euclid with tol;
        a, b = float(d), g               # a % b swaps a < b on entry)
        while b > 1e-6:
            a, b = b, a % b
        g = a
    if g <= 1e-6:
        return None
    k = diffs / g
    if not np.allclose(k, np.round(k), atol=1e-4):
        return None
    if float(np.max(k)) > max_code:
        return None
    return vmin, float(g)


def banded_dp_pallas_ad(s_codes, t_codes, s_lens, t_lens, dmin, *, W: int,
                        subst, go: float, ge: float, flags: ModeFlags,
                        w_eff=None, A: int = 4, block_b: int = 128,
                        interpret: bool = False, r_chunk: int = _R,
                        with_dirs: bool = False, _strip: int = 0,
                        _i8win: bool = False, _subst_planes: bool = None,
                        _subst_packed: bool = None):
    """Antidiagonal dual-pair banded DP.

    Same contract as :func:`biseqt_tpu.ops.banded_dp.banded_dp`.  By
    default score-only (``dirs`` is a 0-size array; ``end_i``/``end_j``
    are -1 sentinels).  With ``with_dirs=True`` the kernel additionally
    streams direction nibbles to HBM in the **packed antidiagonal
    layout** ``dirs[a // 2, b2, x]`` — plane column ``b2`` holds pairs
    ``(2 b2, 2 b2+1)``, cell (i, j) of pair p sits at step ``a = i+j``,
    lane ``x = (i-j) - dmin'_p`` with ``dmin'_p`` the parity-adjusted
    band start (``dmin + (p - dmin) % 2``), and steps ``2r``/``2r+1``
    occupy the low/high nibble of byte row ``r`` (halving the dirs
    plane's HBM + D2H traffic).  The packed-row dimension is MAJOR so
    the kernel's per-row store is a whole aligned [BT, W] u8 tile
    (pair-major planes forced masked single-sublane stores — measured
    ~47 ms/batch at B=4096, the entire dirs-vs-score gap).  Walk it with
    :func:`biseqt_tpu.native.traceback_batch_ad`.  ``end_i``/``end_j``
    are then real per-pair end cells.  Requires ``w_eff <= W - 1`` (one
    lane of slack absorbs the per-pair parity adjustment of dmin).
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
        # the uniform fast path scores PAD chars as a mismatch; that is
        # only safe when mismatches decay (virtual off-matrix cells must
        # never accumulate score)
        if uniform[1] >= 0:
            uniform = None
    # general-substitution path choice (measured, docs/kernels.md): the
    # A^2 select chain wins at small alphabets (A=4: 45.8, A=8: 22.7
    # GCUPS); at protein scale the O(A)/step paths win — packed planes
    # (base-32 digit packing, needs an integer-grid matrix) over plain
    # value planes whenever applicable.
    grid_pack = _int_grid(subst_np) if uniform is None else None
    if _subst_packed is None:
        # an explicit _subst_planes choice (True OR False) pins the
        # legacy paths — auto-packed must not override a test/probe
        # that asks for a specific path
        subst_packed = (uniform is None and grid_pack is not None
                        and A >= 8 and _subst_planes is None)
    else:
        subst_packed = bool(_subst_packed) and uniform is None
        if subst_packed and grid_pack is None:
            raise ValueError(
                "_subst_packed=True needs an integer-grid substitution "
                "matrix (entries = vmin + g*k, k in [0, 30])")
    if _subst_planes is None:
        subst_planes = (uniform is None and not subst_packed and A >= 14)
    else:
        subst_planes = (bool(_subst_planes) and uniform is None
                        and not subst_packed)
    pv, pg = grid_pack if subst_packed else (0.0, 1.0)
    return _banded_dp_pallas_ad_jit(
        s_codes, t_codes, s_lens, t_lens, dmin,
        jnp.asarray(subst_np), w_eff, W=W, go=float(go), ge=float(ge),
        flags=flags, A=A, block_b=block_b, interpret=interpret,
        uniform=uniform, r_chunk=int(r_chunk), strip=int(_strip),
        with_dirs=bool(with_dirs), i8win=bool(_i8win),
        subst_planes=subst_planes, subst_packed=subst_packed,
        pack_vmin=pv, pack_g=pg,
    )


@functools.partial(
    jax.jit,
    static_argnames=("W", "go", "ge", "flags", "block_b", "interpret", "A",
                     "uniform", "r_chunk", "strip", "with_dirs", "i8win",
                     "subst_planes", "subst_packed", "pack_vmin", "pack_g"),
)
def _banded_dp_pallas_ad_jit(s_codes, t_codes, s_lens, t_lens, dmin, subst,
                             w_eff, *, W: int, go: float, ge: float,
                             flags: ModeFlags, A: int, block_b: int,
                             interpret: bool, uniform, r_chunk: int = _R,
                             strip: int = 0, with_dirs: bool = False,
                             i8win: bool = False,
                             subst_planes: bool = False,
                             subst_packed: bool = False,
                             pack_vmin: float = 0.0, pack_g: float = 1.0):
    B, LS = s_codes.shape
    LT = t_codes.shape[1]
    if w_eff is None:
        w_eff = jnp.full((B,), W - 1, jnp.int32)
    # <= W-1 is load-bearing: one lane of slack absorbs the per-pair
    # parity adjustment of dmin (dminq = dmin + up drops the bottom lane)
    w_eff = jnp.minimum(w_eff.astype(jnp.int32), W - 1)
    s_lens = s_lens.astype(jnp.int32)
    t_lens = t_lens.astype(jnp.int32)
    dmin = dmin.astype(jnp.int32)
    s_codes = s_codes.astype(jnp.int32)
    t_codes = t_codes.astype(jnp.int32)

    # pair up: tile row b2 holds pairs (2 b2, 2 b2 + 1)
    BT = block_b
    B2 = (B + 1) // 2
    Bp2 = _round_up(B2, BT)
    Bp = 2 * Bp2

    def padb(x, fill):
        return jnp.pad(x, ((0, Bp - B),), constant_values=fill)

    s_codes = jnp.pad(s_codes, ((0, Bp - B), (0, 0)), constant_values=PAD_S)
    t_codes = jnp.pad(t_codes, ((0, Bp - B), (0, 0)), constant_values=PAD_T)
    s_lens_p = padb(s_lens, 1)
    t_lens_p = padb(t_lens, 1)
    dmin_p = padb(dmin, 0)
    weff_p = padb(w_eff, 1)

    # per-pair parity adjustment: pair p needs dmin' ≡ p (mod 2) so the
    # two pairs occupy complementary sublattice slots.  Adjust UPWARD:
    # the effective band is the top w_eff diagonals, so dropping the
    # bottom lane is free (requires w_eff <= W - 1).
    pair_id = jnp.arange(Bp, dtype=jnp.int32) % 2
    dminq = parity_adjusted_dmin(dmin_p, pair_id)   # dmin' (parity p)
    up = dminq - dmin_p                             # in {0, 1}

    Apad = _round_up(LS + LT + 2, r_chunk)
    # the half-stream ring must cover the LONGER sequence too: with
    # skewed lengths ((Apad + W)/2 < max(LS, LT)) the modular roll in
    # _shift_stream would serve wrapped characters under a passing
    # validity mask — silently wrong scores exactly when a short read
    # bands deep into a long reference (repro: T = S[481:581] of a
    # 600-char S at dmin=480 scored 9 instead of 100).  The flip-side
    # t addressing shifts by the extra half-slots (delta below).
    Mlen = _round_up(max((Apad + W) // 2, LS, LT), 128)
    SLEN = 2 * Mlen
    delta = Mlen - (Apad + W) // 2

    # interleaved streams: SI[z] = S_{z%2}[(z + dmin')/2 - 1] etc.
    s_shift = jnp.where(pair_id == 0, dminq // 2 - 1,
                        (dminq + 1) // 2 - 1)
    # the t stream is indexed by x = u + W (u = a - k can reach -(W-1)),
    # so its per-pair shift carries an extra -W/2 half-slots
    t_shift = jnp.where(pair_id == 0, -(dminq // 2) - 1,
                        (1 - dminq) // 2 - 1) - (W // 2) - delta
    s_half = _shift_stream(s_codes.astype(jnp.int8), s_shift, s_lens_p,
                           Mlen, PAD_S)
    t_half = _shift_stream(t_codes.astype(jnp.int8), t_shift, t_lens_p,
                           Mlen, PAD_T)
    # interleave pairs (2i, 2i+1) element-wise: [B2p, Mlen, 2] -> flat
    si = jnp.stack(
        [s_half[0::2], s_half[1::2]], axis=2
    ).reshape(Bp2, SLEN)
    ti = jnp.stack(
        [t_half[0::2], t_half[1::2]], axis=2
    ).reshape(Bp2, SLEN)
    tir = jnp.flip(ti, axis=1)

    def col(x):
        return x.reshape(Bp2, 2)

    dmin2 = col(dminq)
    lo2 = col(W - up - weff_p)              # live lanes [lo, hi)
    hi2 = col(W - up)
    sl2 = col(s_lens_p)
    tl2 = col(t_lens_p)

    subst_flat = subst.reshape(1, A * A)
    grid = (Bp2 // BT,)
    kernel = functools.partial(
        _kernel, W=W, Apad=Apad, BT=BT, A=A, go=float(go), ge=float(ge),
        flags=flags, uniform=uniform, R=r_chunk, strip=strip,
        with_dirs=with_dirs, i8win=i8win, subst_planes=subst_planes,
        subst_packed=subst_packed, pack_vmin=pack_vmin, pack_g=pack_g,
    )
    vspec = lambda shape: pl.BlockSpec(
        shape, lambda b: (b, 0), memory_space=pltpu.VMEM
    )
    scalar_ins = [
        dmin2[:, 0:1], dmin2[:, 1:2], lo2[:, 0:1], lo2[:, 1:2],
        hi2[:, 0:1], hi2[:, 1:2], sl2[:, 0:1], sl2[:, 1:2],
        tl2[:, 0:1], tl2[:, 1:2],
    ]
    out_specs = [vspec((BT, 1)), vspec((BT, 1))]
    out_shape = [
        jax.ShapeDtypeStruct((Bp2, 1), jnp.float32),
        jax.ShapeDtypeStruct((Bp2, 1), jnp.float32),
    ]
    scratch = [
        pltpu.VMEM((2, BT, W + r_chunk), jnp.int8),    # si buffer
        pltpu.VMEM((2, BT, W + r_chunk), jnp.int8),    # tir buffer
        pltpu.SemaphoreType.DMA((2, 2)),
    ]
    if with_dirs:
        out_specs = out_specs + [
            pl.BlockSpec(memory_space=pl.ANY),       # dirs (HBM)
            vspec((BT, W)), vspec((BT, W)),             # Ma / Mb
            vspec((BT, W)), vspec((BT, W)),             # Aa / Ab
        ]
        assert r_chunk % 2 == 0, "nibble-packed dirs need an even r_chunk"
        out_shape = out_shape + [
            # nibble-packed: steps (2r, 2r+1) share byte row r (low/high).
            # ROW-MAJOR layout [r, b2, x]: the in-kernel store then writes
            # a full [BT, W] u8 tile per packed row — the pair-major
            # [b2, r, x] layout's [BT, 1, W] stores were masked
            # partial-tile writes costing ~47 ms/batch at B=4096, the
            # entire dirs-vs-score gap (round-4 strip-14 attribution)
            jax.ShapeDtypeStruct((Apad // 2, Bp2, W), jnp.uint8),
            jax.ShapeDtypeStruct((Bp2, W), jnp.float32),
            jax.ShapeDtypeStruct((Bp2, W), jnp.float32),
            jax.ShapeDtypeStruct((Bp2, W), jnp.int32),
            jax.ShapeDtypeStruct((Bp2, W), jnp.int32),
        ]
        scratch = [
            scratch[0], scratch[1],
            # row-major staging: store target dbuf[slot, r] is a whole
            # aligned [BT, W] tile (BT = 128 sublanes = 4 full (32, 128)
            # u8 tiles), not a masked single-sublane write
            pltpu.VMEM((2, r_chunk // 2, BT, W), jnp.uint8),  # dirs buffer
            pltpu.SemaphoreType.DMA((2, 3)),
        ]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[vspec((BT, 1))] * 10 + [
            pl.BlockSpec((1, A * A), lambda b: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),   # si (HBM)
            pl.BlockSpec(memory_space=pl.ANY),   # tir (HBM)
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*scalar_ins, subst_flat, si, tir)
    score = jnp.stack([out[0][:, 0], out[1][:, 0]], axis=1).reshape(Bp)[:B]
    if not with_dirs:
        sent = jnp.full((B,), -1, jnp.int32)
        return DPResult(score=score, end_i=sent, end_j=sent,
                        dirs=jnp.zeros((), jnp.uint8))

    # end-cell recovery: pair p's per-lane maxima live on even lanes of
    # its even-step accumulator and odd lanes of the odd-step one (slot
    # parity (a + k) ≡ p); the step-of-max arrays follow the same split.
    dirs_hbm, Ma, Mb, Aa, Ab = out[2], out[3], out[4], out[5], out[6]
    lane_even = (jnp.arange(W, dtype=jnp.int32) % 2) == 0
    v0 = jnp.where(lane_even[None, :], Ma, Mb)
    v1 = jnp.where(lane_even[None, :], Mb, Ma)
    A0 = jnp.where(lane_even[None, :], Aa, Ab)
    A1 = jnp.where(lane_even[None, :], Ab, Aa)

    def ends(v, Astep, pair_slot):
        k_star = jnp.argmax(v, axis=1).astype(jnp.int32)       # [Bp2]
        a_star = jnp.take_along_axis(
            Astep, k_star[:, None], axis=1
        )[:, 0]
        dq = dmin2[:, pair_slot]
        d_star = dq + k_star
        return (a_star + d_star) // 2, (a_star - d_star) // 2

    if flags.local_end or flags.free_end_edges:
        ei0, ej0 = ends(v0, A0, 0)
        ei1, ej1 = ends(v1, A1, 1)
        end_i = jnp.stack([ei0, ei1], axis=1).reshape(Bp)[:B]
        end_j = jnp.stack([ej0, ej1], axis=1).reshape(Bp)[:B]
    else:
        end_i = s_lens
        end_j = t_lens
    return DPResult(score=score, end_i=end_i, end_j=end_j, dirs=dirs_hbm)
