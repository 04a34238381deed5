"""Pallas TPU kernel: batched banded affine-gap DP (score mode).

The TPU-native replacement for the reference's C hot loop
(``biseqt/pwlib — dptable_solve`` in BANDED_MODE) — the component the
north-star GCUPS target measures.

Kernel design (see :mod:`.banded_dp` for the shared recurrence):

  * One grid step owns a tile of ``block_b`` alignment pairs; the whole
    band state (H, F — two [block_b, W] f32 registersful) lives in VMEM
    scratch across the sequential row loop, so HBM traffic is just the
    int32 code streams (8 bytes/row/pair) — the kernel is compute-bound.
  * Rows advance with a ``fori_loop``; each row is pure VPU work on
    [block_b, W] tiles: a handful of selects/max's plus a log2(W)-step
    shifted prefix-max for the affine-gap within-row chain.  No per-cell
    scalar work anywhere.
  * The mutate sequence is pre-skewed into the band frame (T2[y] =
    T[y - dmax]) by the XLA wrapper, so every pair's row window lives at
    the same dynamic offset — one unaligned VMEM slice per row for the
    whole tile instead of per-pair gathers.
  * Mode trackers (corner / best-cell / edge maxima) are tiny [block_b, 1]
    scratch vectors updated with masked maxes — lane-dynamic gathers are
    re-expressed as ``where(lane == k*, H, -inf)`` reductions.

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

from .banded_dp import (
    NEG, DPResult, ModeFlags, _row_update,
)

__all__ = ["banded_dp_pallas"]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _masked_lane_value(H, karange, k_target, cell_valid):
    """H[b, k_target[b]] as a masked-max (avoids lane-dynamic gathers)."""
    pick = (karange == k_target) & cell_valid
    return jnp.max(jnp.where(pick, H, NEG), axis=1, keepdims=True)


def _kernel(s_ref, t2_ref, dmax_ref, slen_ref, tlen_ref, weff_ref,
            subst_ref, score_ref, ei_ref, ek_ref,
            H, F, best, bi, bk, corner,
            *, W: int, LSp: int, A: int, go: float, ge: float,
            flags: ModeFlags):
    BT = H.shape[0]
    karange = jax.lax.broadcasted_iota(jnp.int32, (BT, W), 1)
    dmax = dmax_ref[:, :1]
    slen = slen_ref[:, :1]
    tlen = tlen_ref[:, :1]
    weff = weff_ref[:, :1]

    # init row (i = 0)
    j0 = karange - dmax
    valid0 = (j0 >= 0) & (j0 <= tlen) & (karange < weff)
    jf0 = j0.astype(jnp.float32)
    if flags.local_start or flags.free_start_edges:
        h0 = jnp.zeros((BT, W), jnp.float32)
    else:
        h0 = jnp.where(j0 > 0, go + ge * jf0, 0.0)
    H[:] = jnp.where(valid0, h0, NEG)
    F[:] = jnp.full((BT, W), NEG)
    best[:] = jnp.full((BT, 1), NEG)
    bi[:] = jnp.zeros((BT, 1), jnp.int32)
    bk[:] = jnp.zeros((BT, 1), jnp.int32)
    corner[:] = jnp.full((BT, 1), NEG)

    def subst_select(s_char, t_win):
        out = jnp.zeros((BT, W), jnp.float32)
        for a in range(A):
            row = jnp.zeros((BT, W), jnp.float32)
            for b in range(A):
                row = jnp.where(t_win == b, subst_ref[0, a * A + b], row)
            out = jnp.where(s_char == a, row, out)
        return out

    def body(i, _):
        row_valid = i <= slen                       # [BT, 1] bool
        j_idx = karange + (i - dmax)
        cell_valid = (
            (j_idx >= 0) & (j_idx <= tlen) & row_valid & (karange < weff)
        )
        # Mosaic requires lane-aligned vector loads: fetch the aligned
        # 128-superset of the sliding window, then rotate it into place
        # (tpu dynamic rotate) and statically slice.
        base = pl.multiple_of(((i - 1) // 128) * 128, 128)
        off = (i - 1) - base
        t_chunk = t2_ref[:, pl.ds(base, W + 128)]
        t_win = pltpu.roll(t_chunk, -off, axis=1)[:, :W]
        s_chunk = s_ref[:, pl.ds(base, 128)]
        s_char = pltpu.roll(s_chunk, -off, axis=1)[:, :1]  # [BT, 1] int32
        sub = subst_select(s_char, t_win)

        H_new, F_new, _ = _row_update(
            H[:], F[:], sub, cell_valid, j_idx, go, ge,
            up_shift=1, diag_shift=0,
            local_start=flags.local_start,
            free_start_col=flags.free_start_edges,
            want_dirs=False,
        )
        H_new = jnp.where(row_valid, H_new, H[:])
        F_new = jnp.where(row_valid, F_new, F[:])

        masked = jnp.where(cell_valid, H_new, NEG)
        rowmax = jnp.max(masked, axis=1, keepdims=True)
        rowarg = jnp.argmax(masked, axis=1).astype(jnp.int32)[:, None]
        is_last = i == slen

        if flags.local_end:
            better = row_valid & (rowmax > best[:])
            bi[:] = jnp.where(better, i, bi[:])
            bk[:] = jnp.where(better, rowarg, bk[:])
            best[:] = jnp.where(better, rowmax, best[:])
        if flags.free_end_edges:
            kcol = tlen - i + dmax
            colval = _masked_lane_value(H_new, karange, kcol, cell_valid)
            better = row_valid & (colval > best[:])
            bi[:] = jnp.where(better, i, bi[:])
            bk[:] = jnp.where(better, kcol, bk[:])
            best[:] = jnp.where(better, colval, best[:])
            better = is_last & (rowmax > best[:])
            bi[:] = jnp.where(better, i, bi[:])
            bk[:] = jnp.where(better, rowarg, bk[:])
            best[:] = jnp.where(better, rowmax, best[:])
        # corner (i == |S|, j == |T|) for global-like extraction
        kcorner = tlen - i + dmax
        cval = _masked_lane_value(H_new, karange, kcorner, cell_valid)
        corner[:] = jnp.where(is_last, cval, corner[:])

        H[:] = H_new
        F[:] = F_new
        return 0

    jax.lax.fori_loop(1, LSp + 1, body, 0)

    if flags.local_end or flags.free_end_edges:
        score_ref[:] = best[:]
        ei_ref[:] = bi[:]
        ek_ref[:] = bk[:]
    else:
        score_ref[:] = corner[:]
        ei_ref[:] = slen
        ek_ref[:] = tlen - slen + dmax


@functools.partial(
    jax.jit,
    static_argnames=("W", "go", "ge", "flags", "block_b", "interpret", "A"),
)
def banded_dp_pallas(s_codes, t_codes, s_lens, t_lens, dmin, *, W: int,
                     subst, go: float, ge: float, flags: ModeFlags,
                     w_eff=None, A: int = 4, block_b: int = 8,
                     interpret: bool = False):
    """Pallas-backed batched banded DP; same contract as
    :func:`biseqt_tpu.ops.banded_dp.banded_dp` (score mode, dirs=()).

    ``go``/``ge`` are static floats here (baked into the kernel); ``W``
    must be a multiple of 128 and the batch is padded to ``block_b``.
    """
    B, LS = s_codes.shape
    LT = t_codes.shape[1]
    assert W % 128 == 0, "pad band width to a multiple of 128"
    LSp = _round_up(LS, 128)
    Bp = _round_up(B, block_b)

    s_codes = s_codes.astype(jnp.int32)
    t_codes = t_codes.astype(jnp.int32)
    dmin = dmin.astype(jnp.int32)
    if w_eff is None:
        w_eff = jnp.full((B,), W, jnp.int32)
    dmax = dmin + (W - 1)

    # pad batch with degenerate pairs
    def padb(x, fill):
        return jnp.pad(x, ((0, Bp - B),) + ((0, 0),) * (x.ndim - 1),
                       constant_values=fill)

    s_codes = jnp.pad(s_codes, ((0, Bp - B), (0, LSp - LS)),
                      constant_values=0)
    s_lens_p = padb(s_lens.astype(jnp.int32), 1)
    t_lens_p = padb(t_lens.astype(jnp.int32), 1)
    dmax_p = padb(dmax, 0)
    weff_p = padb(w_eff.astype(jnp.int32), W)

    # band frame: T2[b, y] = T[b, y - dmax_b] for y in [0, LSp + W)
    Y = LSp + W
    yy = jnp.arange(Y, dtype=jnp.int32)[None, :]
    src = yy - dmax_p[:, None]
    t_codes_p = jnp.pad(t_codes, ((0, Bp - B), (0, 0)), constant_values=0)
    t2 = jnp.where(
        (src >= 0) & (src < t_lens_p[:, None]),
        jnp.take_along_axis(t_codes_p, jnp.clip(src, 0, LT - 1), axis=1),
        -1,
    )

    subst_flat = jnp.asarray(subst, jnp.float32).reshape(1, A * A)

    grid = (Bp // block_b,)
    kernel = functools.partial(
        _kernel, W=W, LSp=LSp, A=A, go=float(go), ge=float(ge), flags=flags,
    )
    row_spec = lambda shape: pl.BlockSpec(
        shape, lambda b: (b, 0), memory_space=pltpu.VMEM
    )
    score, ei, ek = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            row_spec((block_b, LSp)),
            row_spec((block_b, Y)),
            row_spec((block_b, 1)),
            row_spec((block_b, 1)),
            row_spec((block_b, 1)),
            row_spec((block_b, 1)),
            pl.BlockSpec((1, A * A), lambda b: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            row_spec((block_b, 1)),
            row_spec((block_b, 1)),
            row_spec((block_b, 1)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, 1), jnp.float32),
            jax.ShapeDtypeStruct((Bp, 1), jnp.int32),
            jax.ShapeDtypeStruct((Bp, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_b, W), jnp.float32),   # H
            pltpu.VMEM((block_b, W), jnp.float32),   # F
            pltpu.VMEM((block_b, 1), jnp.float32),   # best
            pltpu.VMEM((block_b, 1), jnp.int32),     # bi
            pltpu.VMEM((block_b, 1), jnp.int32),     # bk
            pltpu.VMEM((block_b, 1), jnp.float32),   # corner
        ],
        interpret=interpret,
    )(s_codes, t2, dmax_p[:, None], s_lens_p[:, None], t_lens_p[:, None],
      weff_p[:, None], subst_flat)

    score = score[:B, 0]
    ei = ei[:B, 0]
    ek = ek[:B, 0]
    ej = ei - dmax + ek
    return DPResult(score=score, end_i=ei, end_j=ej,
                    dirs=jnp.zeros((), jnp.uint8))
