"""End-to-end discover-then-extend pipeline (the framework's "model").

The full seed-and-extend flow the reference composes by hand
(``KmerIndex`` -> ``SeedIndex`` -> ``WordBlot.similar_segments`` ->
``pw.Aligner`` banded extension), packaged as one call with the TPU
execution plan:

  1. Word-Blot discovers candidate similar segments (device seed join +
     band statistics; sparse assembly at genome scale).
  2. Every candidate band becomes one row of a *batched* banded-DP
     problem: the (d, a) rectangle is cut out of both sequences, the band
     geometry is normalized per pair, and a single kernel launch extends
     all candidates (lax backend everywhere, Pallas on TPU).

This is the "flagship model" of the framework: discovery O(#seeds),
extension O(band x length) on the MXU-free VPU path, everything batched.
"""

from __future__ import annotations

import functools
from typing import Dict, List

import numpy as np
import jax
import jax.numpy as jnp

from .sequence import Sequence
from .blot import WordBlot, band_radius
from .ops.banded_dp import banded_dp, ModeFlags

__all__ = ["discover_and_extend", "extend_segments"]


# the round-5 lane-packed walk pads the plane's pair axis to 128
# lanes — only worth it when the batch is at least half a lane block
# wide (<=2x padding).  Module-level so interpret-mode tests can
# lower it and exercise the lane-packed pipeline path on tiny batches.
_LANE_WALK_MIN_B2 = 64


# unbounded on purpose: each entry holds a jax.jit wrapper whose
# compiled executables are exactly what must survive — evicting one
# forces a remote recompile (seconds to minutes in this environment)
# the next time its (W, bb, flags, ...) family recurs, and a serving
# loop cycling through >maxsize shape families would thrash.  Entries
# are small (a closure + jit cache); key diversity is bounded by the
# workload's shape-bucket diversity.
@functools.lru_cache(maxsize=None)
def _dp_walk_fused_fn(subst_key, W: int, block_b: int,
                      walk_block_b: int, lane_packed: bool,
                      flags: ModeFlags, go: float, ge: float,
                      interpret: bool, r_chunk: int = 128,
                      walk_r_rows: int = None):
    """Build the fused DP + on-device-traceback dispatch.

    Each Python-level jit call through this environment's tunnel costs
    ~32 ms+ before returning, so DP kernel and walk go out as ONE
    jitted dispatch — and the dirs plane (the largest buffer in a
    transcript launch) becomes an XLA intermediate, freed when the
    walk consumes it instead of surviving as a held output.
    ``lane_packed`` selects the round-5 lane-axis walk (2.7x the
    sublane one; pads the plane's pair axis to 128 lanes, so callers
    gate it on batch width).  ``subst_key`` is ``(bytes, shape)`` of
    the f32 substitution matrix — the kernel wrapper inspects it
    concretely at trace time, so it rides as a closure constant; the
    lru cache keeps the jit cache stable across launches.
    """
    from .ops.pallas_dp_ad import banded_dp_pallas_ad
    from .ops.pallas_walk import (traceback_sweep_fused,
                                  traceback_sweep_t_fused)

    subst = np.frombuffer(subst_key[0], np.float32).reshape(subst_key[1])

    @jax.jit
    def f(s_codes, t_codes, s_lens, t_lens, dmin, w_eff, dminq, real):
        res = banded_dp_pallas_ad(
            s_codes, t_codes, s_lens, t_lens, dmin, W=W, subst=subst,
            go=go, ge=ge, flags=flags, w_eff=w_eff, with_dirs=True,
            block_b=block_b, interpret=interpret, r_chunk=r_chunk,
        )
        ei = jnp.where(real, res.end_i.astype(jnp.int32), -1)
        ej = jnp.where(real, res.end_j.astype(jnp.int32), -1)
        wr = {} if walk_r_rows is None else {"r_rows": walk_r_rows}
        if lane_packed:
            walk = traceback_sweep_t_fused(res.dirs, dminq, ei, ej, W=W,
                                           interpret=interpret, **wr)
        else:
            walk = traceback_sweep_fused(res.dirs, dminq, ei, ej, W=W,
                                         block_b=walk_block_b,
                                         interpret=interpret, **wr)
        return res.score, walk

    return f


def _bucket(n, mini=128):
    """Round up to a half-power-of-two grid (1M, 1.5M, 2M, 3M, ...).

    Coarse on purpose: every distinct bucketed shape is a separate XLA
    compile, and in this environment compiles are remote round-trips
    that cost minutes at genome shapes while the wasted band cells cost
    fractions of a second — two variants per octave is the sweet spot
    (measured: a warm 5 Mbp run re-compiled its extension because the
    second genome's segments fell in adjacent 1/8-granularity buckets).
    """
    n = max(int(n), 1)
    if n <= mini:
        return mini
    step = max(mini, 1 << (max(n.bit_length(), 2) - 2))
    return ((n + step - 1) // step) * step


def extend_segments(S: Sequence, T: Sequence, segments: List[Dict], *,
                    subst=None, go_score=-3.0, ge_score=-1.0,
                    use_pallas: bool = None, pad_radius: int = 16,
                    pad_a: int = 512, with_transcripts: bool = False,
                    device_walk: bool = True,
                    _dirs_budget: int = 512 << 20,
                    _interpret: bool = False, _r_chunk: int = 128,
                    _walk_r_rows: int = None):
    """Batched banded extension of Word-Blot candidate segments.

    Each segment's (d, a) rectangle maps to subsequences
    ``S[i_lo:i_hi], T[j_lo:j_hi]`` and a diagonal band (relative to the
    cutouts); all segments align in ONE batched banded-DP launch (local
    mode: the alignment starts/ends wherever the homology does).  Returns
    the segments with the banded-DP ``score`` attached.

    With ``with_transcripts=True`` the launch also emits direction bytes
    (the Pallas kernel streams them to HBM chunk-by-chunk) and every
    segment gains ``transcript`` (MSID string) + ``origin_start`` /
    ``mutate_start`` (coordinates in the FULL S/T) — walked on device by
    default (``device_walk``).  NOTE: in transcript mode the output may
    hold MORE rows than ``segments``: a segment whose antidiagonal span
    exceeds the direction-plane budget is split into overlapping
    a-windows, each aligned independently.  Every output row carries
    ``source_index`` (its position in the input list) — join on that,
    not on row order.  Score-only mode is always 1:1.
    """
    if not segments:
        return []
    A = len(S.alphabet)
    if subst is None:
        subst = np.where(np.eye(A, dtype=bool), 1.0, -1.0).astype(np.float32)
    s_arr = S.to_array()
    t_arr = T.to_array()

    if with_transcripts:
        # every transcript route compacts traces with the C++ tier —
        # fail HERE with a clear message instead of deep in _finish
        # after device launches are already in flight
        from . import native

        if not native.available():
            raise RuntimeError(
                "extend_segments(with_transcripts=True) compacts op "
                "traces with the native C++ tier, which is unavailable "
                "(no prebuilt libpwnative.so and the build failed — is "
                "a C++ toolchain installed?); run score-only "
                "(with_transcripts=False) or build biseqt_tpu/native")

        # transcript launches allocate a dirs plane of ~(a-range / 2) * W
        # bytes per pair-row on device.  Discovery merges consecutive
        # in-order blocks into multi-Mbp segments (a 4 Mbp segment at
        # W = 1536 is a 3.2 GB plane — OOMed the 5 Mbp genome run), so
        # oversized segments are split into overlapping a-windows sized
        # to a plane budget; each window is extended and aligned
        # independently and yields its own transcripted output row.
        DIRS_BUDGET = int(_dirs_budget)
        split = []
        src_idx = []
        for k, seg in enumerate(segments):
            (d_lo, d_hi), (a_lo, a_hi) = seg["segment"]
            # size the estimate with the SAME bucketing the launch uses
            # for W, so the budget is an actual upper bound on the plane
            # (the raw width underestimates by the bucket margin)
            W_est = _bucket(d_hi - d_lo + 1 + 2 * pad_radius, mini=128)
            max_a = max(2 * DIRS_BUDGET // W_est, 8 * pad_a)
            span = a_hi - a_lo + 1
            if span <= max_a:
                split.append(seg)
                src_idx.append(k)
                continue
            n_win = -(-span // max_a)
            step = -(-span // n_win)
            for w in range(n_win):
                lo = a_lo + w * step
                hi = min(lo + step + 2 * pad_a, a_hi)
                sub = dict(seg)
                sub["segment"] = ((d_lo, d_hi), (lo, hi))
                split.append(sub)
                src_idx.append(k)
        segments = split
    else:
        src_idx = list(range(len(segments)))

    cut = []
    for seg in segments:
        (d_lo, d_hi), (a_lo, a_hi) = seg["segment"]
        # grow the rectangle: discovery quantizes to coarse cells and the
        # true alignment should be free to extend past the seed-dense core
        d_lo -= pad_radius
        d_hi += pad_radius
        a_lo -= pad_a
        a_hi += pad_a
        # rectangle corners in (i, j)
        i_lo = max((a_lo + d_lo) // 2, 0)
        i_hi = min((a_hi + d_hi + 1) // 2 + 1, len(S))
        j_lo = max((a_lo - d_hi) // 2, 0)
        j_hi = min((a_hi - d_lo + 1) // 2 + 1, len(T))
        i_hi = max(i_hi, i_lo + 1)
        j_hi = max(j_hi, j_lo + 1)
        # band relative to the cutouts: d' = d - (i_lo - j_lo)
        off = i_lo - j_lo
        cut.append((i_lo, i_hi, j_lo, j_hi, d_lo - off, d_hi - off))

    B = len(cut)
    # local mode: the optimal alignment starts/ends wherever the homology
    # does, independent of the (padded) rectangle rim
    flags = ModeFlags(local_start=True, local_end=True)
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)

    # Group segments by bucketed cutout shape and launch per group:
    # genome-scale candidate lists mix ~megabase block homologies with
    # short spurious hits, so padding every segment to the global max is
    # O(max/typical) wasted memory and compute (a 5 Mbp run OOMed exactly
    # there), while per-shape launches still amortize compiles over 1-2
    # variants.  Within a group, batches are additionally capped so the
    # kernel's char streams stay ~< 1 GB per launch.
    groups: Dict[tuple, List[int]] = {}
    for idx, c in enumerate(cut):
        key = (_bucket(c[1] - c[0]), _bucket(c[3] - c[2]),
               _bucket(c[5] - c[4] + 1, mini=128))
        groups.setdefault(key, []).append(idx)

    from .profiling import Phase

    scores = np.zeros((B,), np.float32)
    ops = [""] * B
    si_all = np.zeros((B,), np.int32)
    sj_all = np.zeros((B,), np.int32)
    subst = np.asarray(subst, np.float32)
    STREAM_CHAR_BUDGET = 400_000_000   # per-launch char budget (~0.8 GB)

    # Launches are PIPELINED: device work (DP kernel + sweep walk) is
    # dispatched for as many launch groups as an in-flight HBM budget
    # allows before the oldest launch's results are materialized —
    # host-side compaction and D2H then overlap later groups' compute
    # (one serialized launch otherwise pays the full dispatch + D2H
    # latency per group; the 5 Mbp transcripts run spends most of its
    # warm time exactly there).  The budget counts the dominant
    # allocation (the nibble-packed dirs plane per launch).
    PIPELINE_BYTES = 3 << 30
    pending = []
    inflight = [0]

    def _finish(rec):
        inflight[0] -= rec["bytes"]
        idxs, n = rec["idxs"], rec["n"]
        res = rec["res"]
        scores[idxs] = np.asarray(rec["score"])[:n]
        if not with_transcripts:
            return
        from . import native

        s_codes, t_codes = rec["s_codes"], rec["t_codes"]
        s_lens, t_lens = rec["s_lens"], rec["t_lens"]
        dmin, W = rec["dmin"], rec["W"]
        if rec["ad"]:
            from .ops.pallas_dp_ad import parity_adjusted_dmin

            if rec["walk"] is not None:
                from .ops.pallas_walk import (split_sweep_fused,
                                              split_sweep_t_fused)

                # ONE D2H for the whole walk result (traces + cursors):
                # this environment's tunnel charges a fixed ~22 ms floor
                # per transfer, so the four separate materializations
                # cost three extra floors per launch
                if rec["walk_t"]:
                    tr, fi, fj = split_sweep_t_fused(
                        np.asarray(rec["walk"]), n
                    )
                    g_ops, g_si, g_sj = native.compact_sweep_ops_t(
                        tr, fi, fj, s_codes[:n], t_codes[:n], flags,
                    )
                else:
                    tr0, tr1, fi, fj = split_sweep_fused(
                        np.asarray(rec["walk"]), n
                    )
                    g_ops, g_si, g_sj = native.compact_sweep_ops(
                        tr0, tr1, fi, fj, s_codes[:n], t_codes[:n],
                        flags,
                    )
            else:
                dminq = parity_adjusted_dmin(
                    dmin[:n], np.arange(n, dtype=np.int32) % 2
                )
                g_ops, g_si, g_sj = native.traceback_batch_ad(
                    np.asarray(res.dirs), dminq, s_codes[:n],
                    t_codes[:n], s_lens[:n], t_lens[:n],
                    np.asarray(res.end_i)[:n],
                    np.asarray(res.end_j)[:n], flags,
                )
        else:
            g_ops, g_si, g_sj = native.traceback_batch(
                np.asarray(res.dirs), dmin[:n] + (W - 1), s_codes[:n],
                t_codes[:n], s_lens[:n], t_lens[:n],
                np.asarray(res.end_i)[:n],
                np.asarray(res.end_j)[:n], flags,
            )
        for b, idx in enumerate(idxs):
            ops[idx] = g_ops[b]
            si_all[idx] = g_si[b]
            sj_all[idx] = g_sj[b]

    def _launch(idxs, LS, LT, W):
        # bucket the batch dim too (pad with inert length-1 rows):
        # distinct n would otherwise be distinct jit shapes, and every
        # distinct shape is a remote compile in this environment.
        # Transcript launches bucket at mini=2: every padded pair-row
        # allocates a FULL dirs plane (~(LS+LT)*W/4 bytes — 640 MB per
        # row for 625 kbp segments at W=1024), and rounding 1-2 genome
        # segments up to 8 rows OOMed the 5 Mbp transcripts run
        n = len(idxs)
        n_pad = _bucket(n, mini=2 if with_transcripts else 8)
        b2 = (n_pad + 1) // 2           # dual-pair plane rows
        bb = min(128, max(8, -(-b2 // 8) * 8))
        # lane-packed vs sublane walk: see _LANE_WALK_MIN_B2 — narrow
        # genome-segment launches keep the sublane walk
        lane_walk = (use_pallas and with_transcripts and device_walk
                     and b2 >= _LANE_WALK_MIN_B2
                     and W % 128 == 0)
        est = n_pad * (LS + LT)
        if with_transcripts:
            # the dirs plane is allocated for the kernel's FULL padded
            # tile grid: Bp2 rounds ceil(n_pad / 2) up to the tile size
            # (minimum 8 rows) — a "single-pair" genome launch still
            # allocates 8 planes
            b2r = -(-b2 // bb) * bb
            if lane_walk:
                # the lane-packed walk's transpose+pad materializes a
                # second, 128-lane-rounded copy of the plane
                b2r += -(-b2r // 128) * 128
            est += b2r * (((LS + LT + 2 + 127) // 128) * 64) * W
        # drain BEFORE dispatching: this launch's dirs planes must fit
        # alongside whatever is still in flight (a genome-segment
        # launch can be most of the budget by itself)
        while pending and inflight[0] + est > PIPELINE_BYTES:
            _finish(pending.pop(0))
        s_codes = np.zeros((n_pad, LS), np.int8)
        t_codes = np.zeros((n_pad, LT), np.int8)
        s_lens = np.ones((n_pad,), np.int32)
        t_lens = np.ones((n_pad,), np.int32)
        dmin = np.zeros((n_pad,), np.int32)
        w_eff = np.ones((n_pad,), np.int32)
        for b, idx in enumerate(idxs):
            i_lo, i_hi, j_lo, j_hi, dl, dh = cut[idx]
            s_lens[b] = i_hi - i_lo
            t_lens[b] = j_hi - j_lo
            s_codes[b, : s_lens[b]] = s_arr[i_lo:i_hi]
            t_codes[b, : t_lens[b]] = t_arr[j_lo:j_hi]
            # pad on the dmin side to the shared W (lane mask trims it)
            dmin[b] = dh - W + 1
            w_eff[b] = min(dh - dl + 1, W)
        ad = False
        res = None
        walk = None
        if use_pallas and with_transcripts and device_walk:
            # the antidiagonal dual-pair kernel + on-device sweep walk
            # in ONE jitted dispatch (_dp_walk_fused): the walk ships a
            # 2-bit-per-step op trace instead of the W/2-byte dirs
            # plane — the D2H that dominated transcript mode (see
            # ops/pallas_walk.py) — and the plane itself becomes an
            # XLA intermediate, freed when the walk consumes it.
            # Padding pairs are masked out (-1 ends) on device.
            # Dispatched HERE so this launch overlaps the next
            # launches' kernels.
            from .ops.pallas_dp_ad import parity_adjusted_dmin

            ad = True
            w_eff = np.minimum(w_eff, W - 1)
            dminq_p = parity_adjusted_dmin(
                dmin, np.arange(n_pad, dtype=np.int32) % 2
            )
            fused_fn = _dp_walk_fused_fn(
                (subst.tobytes(), subst.shape), W, bb,
                min(64, bb), bool(lane_walk), flags, float(go_score),
                float(ge_score), bool(_interpret), int(_r_chunk),
                _walk_r_rows,
            )
            score_dev, walk = fused_fn(
                jnp.asarray(s_codes), jnp.asarray(t_codes),
                jnp.asarray(s_lens), jnp.asarray(t_lens),
                jnp.asarray(dmin), jnp.asarray(w_eff),
                jnp.asarray(dminq_p),
                jnp.asarray(np.arange(n_pad, dtype=np.int32) < n),
            )
        else:
            if use_pallas:
                # the antidiagonal dual-pair kernel (the throughput
                # path), score-only or with direction bytes.  It needs
                # w_eff <= W - 1 (one lane of parity slack); extension
                # bands are padded discovery rectangles, so dropping
                # one diagonal is immaterial.
                from .ops.pallas_dp_ad import banded_dp_pallas_ad

                ad = True
                fn = banded_dp_pallas_ad
                w_eff = np.minimum(w_eff, W - 1)
                # shrink the tile to the actual batch (the default
                # 256-row tile would round a handful of megabase
                # segments up to 512)
                extra = {"with_dirs": with_transcripts, "block_b": bb,
                         "interpret": bool(_interpret),
                         "r_chunk": int(_r_chunk)}
            else:
                fn = banded_dp
                extra = {"with_dirs": with_transcripts}
            res = fn(
                jnp.asarray(s_codes), jnp.asarray(t_codes),
                jnp.asarray(s_lens), jnp.asarray(t_lens),
                jnp.asarray(dmin), W=W, subst=subst,
                go=float(go_score), ge=float(ge_score), flags=flags,
                w_eff=jnp.asarray(w_eff), **extra,
            )
            score_dev = res.score
        pending.append(dict(
            idxs=idxs, n=n, res=res, score=score_dev,
            s_codes=s_codes, t_codes=t_codes,
            s_lens=s_lens, t_lens=t_lens, dmin=dmin, W=W, ad=ad,
            walk=walk, walk_t=bool(lane_walk), bytes=est,
        ))
        inflight[0] += est

    total_cells = sum(
        int(c[5] - c[4] + 1) * int(c[1] - c[0]) for c in cut
    )
    with Phase("pipeline.extend", cells=total_cells):
        for (LS, LT, W), idxs in sorted(groups.items()):
            per_pair = LS + LT + 2 * W
            if with_transcripts:
                # the dominant allocation is then the direction plane
                # (nibble-packed: ~(LS+LT) * W / 4 bytes per pair — the
                # plane is Apad/2 x W bytes per dual-pair row), not the
                # char streams — budget it or genome-scale transcript
                # runs exhaust HBM
                per_pair += (LS + LT + 2 * W) * W // 4
            cap = max(2, 2 * (STREAM_CHAR_BUDGET // max(per_pair, 1)))
            for k in range(0, len(idxs), cap):
                _launch(idxs[k:k + cap], LS, LT, W)
        while pending:
            _finish(pending.pop(0))

    out = []
    for b, seg in enumerate(segments):
        seg = dict(seg)
        seg["source_index"] = src_idx[b]
        seg["score"] = float(scores[b])
        seg["band_cells"] = int(
            (cut[b][5] - cut[b][4] + 1) * (cut[b][1] - cut[b][0])
        )
        if with_transcripts:
            seg["transcript"] = ops[b]
            seg["origin_start"] = int(cut[b][0] + si_all[b])
            seg["mutate_start"] = int(cut[b][2] + sj_all[b])
        out.append(seg)
    return out


def discover_and_extend(S: Sequence, T: Sequence, *, wordlen: int = 8,
                        K_min: int = 100, p_min: float = 0.6,
                        g_max: float = 0.2, subst=None,
                        go_score=-3.0, ge_score=-1.0,
                        use_pallas: bool = None,
                        with_transcripts: bool = False):
    """Word-Blot discovery + batched banded extension, one call.

    Returns the discovered segments with DP ``score`` attached (plus
    MSID ``transcript`` / start coordinates when ``with_transcripts``),
    sorted by score descending.
    """
    wb = WordBlot(S, T, wordlen=wordlen, g_max=g_max)
    segments = list(wb.similar_segments(K_min=K_min, p_min=p_min))
    extended = extend_segments(
        S, T, segments, subst=subst, go_score=go_score,
        ge_score=ge_score, use_pallas=use_pallas,
        with_transcripts=with_transcripts,
    )
    return sorted(extended, key=lambda s: -s["score"])
