"""Band-sharded antidiagonal DP: halo exchange every C steps, no gather.

Second-generation band-axis model parallelism (giant single pairs, the
~5 Mbp genome config).  The first engine (:mod:`.sharded_dp`) shards the
*row* recurrence, whose within-row affine E-chain couples every lane —
forcing a per-row ``all_gather`` + two-level scan (a latency wall on real
ICI: one collective per DP row).  This engine iterates **antidiagonals**
(a = i + j), exactly like the single-chip throughput kernel
(:mod:`biseqt_tpu.ops.pallas_dp_ad`): every DP predecessor then lives in
a previous wavefront, so the only cross-shard coupling is the two
boundary lanes — and those are *chunked*:

  each device carries a halo of C extra lanes on each side of its Wl
  owned lanes; C antidiagonal steps run with NO communication (halo
  staleness creeps inward one lane per step, never reaching the
  interior); then one ``ppermute`` per direction refreshes the halos
  (2 sends of [4-state, B, C] per C steps, nearest-neighbor over ICI).

Communication drops from O(rows) collectives to O((LS+LT)/C) pairwise
sends: with C = 128 a 5 Mbp pair needs ~80 k neighbor exchanges
(~0.2 s of ICI latency) instead of ~5 M all_gathers (~minutes).

The per-step math mirrors the antidiagonal kernel (corner-seed boundary
injection, validity by poisoning, parity lane masks — here the odd
sublattice is simply masked dead instead of hosting a second pair) and
is verified against the unsharded row engine on a virtual CPU mesh.
Score mode (traceback at genome scale goes through the pipeline's
per-segment batched path instead; direction emission would need
O((LS+LT)·Wl) bytes per device either way).

Replaces (at scale) the reference's single-threaded banded
``dptable_solve`` (SURVEY.md §2 pwlib; §5.7 long-context analog).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..ops.banded_dp import NEG, ModeFlags, shift_lanes, \
    _check_gap_scores
from ..ops.pallas_dp_ad import _shift_stream, PAD_S, PAD_T
from .mesh import BAND_AXIS

__all__ = ["banded_dp_band_sharded_ad"]


def _band_shard_ad_fn(s_exp, t_flip, s_lens, t_lens, dmin, w_eff, subst,
                      *, W: int, Wl: int, C: int, Apad: int,
                      go: float, ge: float, flags: ModeFlags, A: int):
    """Per-device body: owns global lanes [me*Wl, (me+1)*Wl), carries a
    C-lane halo each side (state width Wle = Wl + 2C)."""
    nb = jax.lax.axis_size(BAND_AXIS)
    me = jax.lax.axis_index(BAND_AXIS)
    B = s_lens.shape[0]
    Wle = Wl + 2 * C
    g0 = me * Wl                      # first owned global lane
    kg = (
        jax.lax.broadcasted_iota(jnp.int32, (B, Wle), 1) + g0 - C
    )                                  # global lane ids incl. halo
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, Wle), 1)
    interior = (lane >= C) & (lane < C + Wl)

    dmin_c = dmin[:, None]
    sl_c = s_lens[:, None]
    tl_c = t_lens[:, None]
    sltl = sl_c + tl_c
    kc = sl_c - tl_c - dmin_c          # global corner lane (i=sl, j=tl)

    # live lanes: the top w_eff diagonals of the band (engine-wide
    # convention), plus lattice parity — cell (i, j) sits on lane
    # kg = d - dmin only when (a + dmin + kg) is even; the odd
    # sublattice is dead (the single-chip kernel hosts a second pair
    # there; here it is simply masked).  Additive float masks.
    live = (kg >= (W - w_eff[:, None])) & (kg < W)
    par_even = ((kg + dmin_c) % 2) == 0
    okf_a_even = jnp.where(live & par_even, 0.0, NEG)
    okf_a_odd = jnp.where(live & ~par_even, 0.0, NEG)

    subst = subst.astype(jnp.float32)

    def sub_score(s_win, t_win):
        # small-table selects, not a gather: XLA gathers are ~3x a whole
        # DP kernel on TPU (CLAUDE.md) and this runs every antidiagonal
        s_c = jnp.clip(s_win, 0, A - 1)
        t_c = jnp.clip(t_win, 0, A - 1)
        val = jnp.zeros(t_win.shape, jnp.float32)
        for a in range(A):
            row = jnp.full(t_win.shape, subst[a, 0], jnp.float32)
            for bb in range(1, A):
                row = jnp.where(t_c == bb, subst[a, bb], row)
            val = jnp.where(s_c == a, row, val)
        # pads never match; poison so off-matrix cells only decay
        return jnp.where((s_win < 0) | (t_win < 0), jnp.float32(-1.0), val)

    # corner-seed boundary injection (kernel contract): sub at (0, 0)
    # reads PAD chars -> the poison constant -1.0, so seeding
    # H2[kc(0,0)] = +1.0 makes the a = 0 step produce H(0,0) = 0 and the
    # E/F chains grow the gap boundary rays from it.
    need_corner_seed = not (flags.local_start or flags.free_start_edges)
    if need_corner_seed:
        H2_0 = jnp.where(kg == -dmin_c, jnp.float32(1.0), NEG)
    else:
        H2_0 = jnp.full((B, Wle), NEG)

    track_local = flags.local_end
    track_rays = flags.free_end_edges

    right_perm = [(i, i - 1) for i in range(1, nb)]
    left_perm = [(i, i + 1) for i in range(nb - 1)]

    def refresh_halos(X):
        """X: [4, B, Wle] stacked (H2, H1, E, F).  Neighbors' interior
        edge lanes become this device's halos.  ppermute zero-fills
        non-addressed edges — mask back to NEG (mesh-edge halos are
        outside the global band)."""
        if nb == 1:
            return X
        to_right = X[:, :, Wl:C + Wl]        # my interior rightmost C
        to_left = X[:, :, C:2 * C]           # my interior leftmost C
        got_l = jax.lax.ppermute(to_right, BAND_AXIS, left_perm)
        got_r = jax.lax.ppermute(to_left, BAND_AXIS, right_perm)
        got_l = jnp.where(me == 0, NEG, got_l)
        got_r = jnp.where(me == nb - 1, NEG, got_r)
        X = jnp.concatenate([got_l, X[:, :, C:C + Wl], got_r], axis=2)
        return X

    n_chunks = Apad // C

    def step(carry, a):
        H2, H1, E, F, M = carry
        # windows: s_exp[x] = S[(x - C + dmin)/2 - 1], window offset
        # a + g0; t_flip[x] = T[((Apad + C - x) - dmin)/2 - 1], offset
        # Apad - a + g0 (see builder below for the stream derivations)
        s_win = jax.lax.dynamic_slice(
            s_exp, (jnp.int32(0), a + g0), (B, Wle)
        ).astype(jnp.int32)
        t_win = jax.lax.dynamic_slice(
            t_flip, (jnp.int32(0), Apad - a + g0), (B, Wle)
        ).astype(jnp.int32)
        sub = sub_score(s_win, t_win)

        HpGo = H1 + go
        E = shift_lanes(jnp.maximum(HpGo, E), -1, NEG) + ge
        F = shift_lanes(jnp.maximum(HpGo, F), 1, NEG) + ge
        H_new = jnp.maximum(jnp.maximum(H2 + sub, E), F)
        if flags.local_start:
            H_new = jnp.maximum(H_new, 0.0)
        if flags.free_start_edges:
            ray = (kg == (-dmin_c - a)) | (kg == (a - dmin_c))
            H_new = jnp.maximum(H_new, jnp.where(ray, 0.0, NEG))
        H_new = H_new + jnp.where((a % 2) == 0, okf_a_even, okf_a_odd)

        if track_local:
            tracked = H_new
        elif track_rays:
            cond = (
                ((kg == (2 * sl_c - dmin_c - a)) & (a >= sl_c)
                 & (a <= sltl))
                | ((kg == (a - dmin_c - 2 * tl_c)) & (a >= tl_c)
                   & (a <= sltl))
            )
            tracked = jnp.where(cond, H_new, NEG)
        else:
            tracked = jnp.where((a == sltl) & (kg == kc), H_new, NEG)
        M = jnp.maximum(M, tracked)
        return (H1, H_new, E, F, M), None

    def chunk(carry, c):
        H2, H1, E, F, M = carry
        X = refresh_halos(jnp.stack([H2, H1, E, F]))
        H2, H1, E, F = X[0], X[1], X[2], X[3]
        (H2, H1, E, F, M), _ = jax.lax.scan(
            step, (H2, H1, E, F, M),
            c * C + jnp.arange(C, dtype=jnp.int32),
        )
        return (H2, H1, E, F, M), None

    neg = jnp.full((B, Wle), NEG)
    init = (H2_0, neg, neg, neg, neg)
    (_, _, _, _, M), _ = jax.lax.scan(
        chunk, init, jnp.arange(n_chunks, dtype=jnp.int32)
    )

    # extract: interior lanes only (halo trackers are the neighbors'
    # business), clamp dead-lane accumulation back to NEG
    score = jnp.max(jnp.where(interior, M, NEG), axis=1)
    return jax.lax.pmax(score, BAND_AXIS)


@functools.partial(
    jax.jit,
    static_argnames=("W", "go", "ge", "flags", "mesh", "halo", "A"),
)
def banded_dp_band_sharded_ad(s_codes, t_codes, s_lens, t_lens, dmin, *,
                              W: int, subst, go: float, ge: float,
                              flags: ModeFlags, mesh, w_eff=None,
                              halo: int = 64, A: int = 4):
    """Banded DP, band axis sharded, antidiagonal iteration (score mode).

    Same contract as :func:`biseqt_tpu.ops.banded_dp.banded_dp` (score
    only, full ``w_eff <= W`` supported — no dual-pair parity margin in
    this engine).  ``W`` must divide by the band-axis size.  Inputs are
    REPLICATED over the data axis: this engine exists for giant single
    pairs; batch parallelism belongs to the data-axis engines.
    ``halo`` = C, the steps between neighbor exchanges (communication =
    2 nearest-neighbor sends of [4, B, C] floats per C antidiagonal
    steps).
    """
    _check_gap_scores(go, ge)
    nb = mesh.shape[BAND_AXIS]
    assert W % nb == 0, "W must divide by band-axis size"
    Wl = W // nb
    C = int(min(halo, Wl))
    B, LS = s_codes.shape
    LT = t_codes.shape[1]
    s_lens = s_lens.astype(jnp.int32)
    t_lens = t_lens.astype(jnp.int32)
    dmin = dmin.astype(jnp.int32)
    if w_eff is None:
        w_eff = jnp.full((B,), W, jnp.int32)
    # full W allowed: this engine has no dual-pair parity packing (the
    # odd sublattice is masked dead), and its lane shifts use NEG-filled
    # shift_lanes, not circular rolls — no dead-lane margin needed
    w_eff = jnp.minimum(w_eff.astype(jnp.int32), W)

    # steps 0..LS+LT inclusive (corner cell sits at a = sl + tl),
    # rounded up to whole halo chunks
    Aend = LS + LT + 1
    Apad = ((Aend + C - 1) // C) * C

    # char streams (replicated; windows are per-device dynamic slices):
    #   cell at (lane kg, step a) is (i, j) = ((a+d)/2, (a-d)/2) with
    #   d = dmin + kg; its chars are S[i-1], T[j-1].  With x = a + kg
    #   (s) / the flipped coordinate (t), each stream is a 2x-repeated
    #   sequence under a per-pair constant shift — one roll-chain each:
    #     s_exp[x]  = S[(x - C + dmin)/2 - 1]  = rep2(S)[x + dmin - 2 - C]
    #     t_flip[x] = T[((Apad + C - x) - dmin)/2 - 1]
    #               = flip(rep2(T)[y - dmin - W'..])  (see t_tmp shift)
    # ring length: must fit the max slice offset + Wle AND the longest
    # 2x-repeated sequence — a shorter ring would serve modular-wrapped
    # characters under a passing validity mask at skewed lengths (same
    # bug class as the single-chip kernel's half-stream ring)
    Zs = max(Apad + W + 2 * C, 2 * LS + 2, 2 * LT + 2)
    rep2s = jnp.repeat(s_codes.astype(jnp.int8), 2, axis=1)
    rep2t = jnp.repeat(t_codes.astype(jnp.int8), 2, axis=1)
    s_exp = _shift_stream(rep2s, dmin - 2 - C, 2 * s_lens, Zs, PAD_S)
    t_tmp = _shift_stream(
        rep2t, -dmin - (Zs - Apad - C) - 1, 2 * t_lens, Zs, PAD_T
    )
    t_flip = jnp.flip(t_tmp, axis=1)

    subst = jnp.asarray(subst, jnp.float32)
    fn = shard_map(
        functools.partial(
            _band_shard_ad_fn, W=W, Wl=Wl, C=C, Apad=Apad,
            go=float(go), ge=float(ge), flags=flags, A=A,
        ),
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(s_exp, t_flip, s_lens, t_lens, dmin, w_eff, subst)
