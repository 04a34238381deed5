"""Pallas TPU kernel: batched banded affine-gap DP (score mode).

The TPU-native replacement for the reference's C hot loop
(``biseqt/pwlib — dptable_solve`` in BANDED_MODE) — the component the
north-star GCUPS target measures.

Kernel design (see :mod:`.banded_dp` for the recurrence derivation):

  * One grid step owns a tile of ``block_b`` alignment pairs; the whole
    band state (H, F — two [block_b, W] f32 tiles) lives in VMEM scratch
    across the sequential row loop, so HBM traffic is just the int8 code
    streams — the kernel is compute-bound VPU work.
  * Rows are processed in chunks of 128: one *aligned* VMEM load pulls the
    chunk's origin codes and the band-frame window superset, then 128 rows
    unroll statically so every sliding-window access is a compile-time
    register slice — no dynamic rotates, no per-row loop overhead.
    (Mosaic requires lane-aligned vector loads; the chunking turns the
    per-row unaligned slide into one aligned load per 128 rows.)
  * The row body is minimal: invalid cells are poisoned through the
    substitution score (PAD chars score -1e30) instead of explicit
    validity masks — gap chains only ever decay monotonically (ge <= 0,
    go <= 0), so poisoned lanes can never win a max against live ones.
  * The within-row affine-gap chain is the closed-form prefix max
    (log2(W) shifted maxes) — the only superlinear-in-W cost per row.

Mode handling mirrors :class:`.banded_dp.ModeFlags`; corner extraction for
global-like modes happens once after the loop (frozen rows keep each
pair's final row in place).  This kernel returns scores + end cell of the
optimum; traceback is served by the lax backend or the native host engine.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .banded_dp import NEG, DPResult, ModeFlags, shift_lanes

__all__ = ["banded_dp_pallas"]

_R = 128  # row chunk (static unroll factor; also the load alignment)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(s_ref, t2_ref, dmax_ref, slen_ref, tlen_ref, weff_ref,
            subst_ref, score_ref, ei_ref, ek_ref,
            H_sc, F_sc, best_sc,
            *, W: int, LSp: int, A: int, go: float, ge: float,
            flags: ModeFlags, uniform: tuple):
    BT = H_sc.shape[0]
    karange = jax.lax.broadcasted_iota(jnp.int32, (BT, W), 1)
    kf = karange.astype(jnp.float32)
    gek = ge * kf
    cgek = (go + ge) - gek
    dmax = dmax_ref[:, :1]
    slen = slen_ref[:, :1]
    tlen = tlen_ref[:, :1]
    weff = weff_ref[:, :1]
    lane_ok = karange < weff

    # init row (i = 0)
    j0 = karange - dmax
    valid0 = (j0 >= 0) & (j0 <= tlen) & lane_ok
    if flags.local_start or flags.free_start_edges:
        h0 = jnp.zeros((BT, W), jnp.float32)
    else:
        h0 = jnp.where(j0 > 0, go + ge * j0.astype(jnp.float32), 0.0)
    H_sc[:] = jnp.where(valid0, h0, NEG)
    F_sc[:] = jnp.full((BT, W), NEG)
    best_sc[:] = jnp.full((BT, 1), NEG)

    if uniform is None:
        srows = [
            [subst_ref[0, a * A + b] for b in range(A)] for a in range(A)
        ]

    def sub_score(s_char, t_win):
        """Substitution score; PAD (-1) positions poisoned to NEG."""
        if uniform is not None:
            m, mm = uniform
            base = jnp.where(s_char == t_win, m, mm)
        else:
            base = jnp.zeros(t_win.shape, jnp.float32)
            for a in range(A):
                row = jnp.full(t_win.shape, srows[a][0], jnp.float32)
                for b in range(1, A):
                    row = jnp.where(t_win == b, srows[a][b], row)
                base = jnp.where(s_char == a, row, base)
        return jnp.where(t_win < 0, NEG, base)

    track_col = flags.free_end_edges
    track_row = flags.local_end

    def do_chunk(c, _):
        base = pl.multiple_of(c * _R, _R)
        s_chunk = s_ref[:, pl.ds(base, _R)]
        t_chunk = t2_ref[:, pl.ds(base, W + _R)]
        H = H_sc[:]
        F = F_sc[:]
        best = best_sc[:]
        for r in range(_R):
            i = base + (r + 1)                      # dynamic scalar row id
            t_win = t_chunk[:, r:r + W]
            s_char = s_chunk[:, r:r + 1]
            sub = sub_score(s_char, t_win)

            diag_cand = H + sub
            F_new = shift_lanes(
                jnp.maximum(H + go, F), -1, NEG
            ) + ge
            H_pre = jnp.maximum(diag_cand, F_new)
            if flags.local_start:
                H_pre = jnp.maximum(H_pre, 0.0)
            if flags.free_start_edges:
                j_idx = karange + (i - dmax)
                H_pre = jnp.where(
                    j_idx == 0, jnp.maximum(H_pre, 0.0), H_pre
                )
            H_pre = jnp.where(lane_ok, H_pre, NEG)

            # E chain: closed-form prefix max (log2 W shifted maxes)
            P = shift_lanes(H_pre, 1, NEG) + cgek
            s = 1
            while s < W:
                P = jnp.maximum(P, shift_lanes(P, s, NEG))
                s *= 2
            H_new = jnp.maximum(H_pre, P + gek)

            row_valid = i <= slen
            H = jnp.where(row_valid, H_new, H)
            F = jnp.where(row_valid, F_new, F)

            if track_row:
                rowmax = jnp.max(
                    jnp.where(row_valid, H_new, NEG), axis=1, keepdims=True
                )
                best = jnp.maximum(best, rowmax)
            if track_col:
                kcol = tlen - i + dmax
                colval = jnp.max(
                    jnp.where(
                        (karange == kcol) & row_valid & lane_ok, H_new, NEG
                    ),
                    axis=1, keepdims=True,
                )
                best = jnp.maximum(best, colval)
        H_sc[:] = H
        F_sc[:] = F
        best_sc[:] = best
        return 0

    jax.lax.fori_loop(0, LSp // _R, do_chunk, 0, unroll=False)

    # post-loop extraction: frozen rows mean H_sc holds each pair's last
    # real row, so corner / last-row maxima come from one masked reduce.
    H = H_sc[:]
    kcorner = tlen - slen + dmax
    corner = jnp.max(
        jnp.where((karange == kcorner) & lane_ok, H, NEG),
        axis=1, keepdims=True,
    )
    if flags.free_end_edges:
        lastrow = jnp.max(jnp.where(lane_ok, H, NEG), axis=1, keepdims=True)
        score = jnp.maximum(best_sc[:], lastrow)
    elif flags.local_end:
        score = best_sc[:]
    else:
        score = corner
    score_ref[:] = score
    ei_ref[:] = slen
    ek_ref[:] = kcorner


def banded_dp_pallas(s_codes, t_codes, s_lens, t_lens, dmin, *, W: int,
                     subst, go: float, ge: float, flags: ModeFlags,
                     w_eff=None, A: int = 4, block_b: int = 32,
                     interpret: bool = False):
    """Pallas-backed batched banded DP; score-mode contract of
    :func:`biseqt_tpu.ops.banded_dp.banded_dp` (``dirs`` empty; ``end_i``/
    ``end_j`` meaningful for global-like modes only).

    ``go``/``ge`` are static floats (baked into the kernel); ``W`` must be
    a multiple of 128; ``go <= 0`` and ``ge <= 0`` are required by the
    poisoned-lane validity scheme.  ``subst`` must be a concrete (host)
    array — uniform match/mismatch matrices compile to a 2-op fast path.
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
        uniform=uniform,
    )


@functools.partial(
    jax.jit,
    static_argnames=("W", "go", "ge", "flags", "block_b", "interpret", "A",
                     "uniform"),
)
def _banded_dp_pallas_jit(s_codes, t_codes, s_lens, t_lens, dmin, subst,
                          w_eff, *, W: int, go: float, ge: float,
                          flags: ModeFlags, A: int, block_b: int,
                          interpret: bool, uniform):
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

    subst_flat = subst.reshape(1, A * A)

    grid = (Bp // block_b,)
    kernel = functools.partial(
        _kernel, W=W, LSp=LSp, A=A, go=float(go), ge=float(ge),
        flags=flags, uniform=uniform,
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
