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
  (2 sends of [4-state, B2, C] per C steps, nearest-neighbor over ICI).

Communication drops from O(rows) collectives to O((LS+LT)/C) pairwise
sends: with C = 128 a 5 Mbp pair needs ~80 k neighbor exchanges
(~0.2 s of ICI latency) instead of ~5 M all_gathers (~minutes).

**Dual-pair parity packing** (round 3, mirroring the single-chip
kernel): a cell (i, j) exists on lane d = i - j only when (a + d) is
even, which would idle half the lanes.  Here — as in
:mod:`..ops.pallas_dp_ad` — the odd sublattice hosts a *second pair*:
stream row b2 carries pairs (2 b2, 2 b2 + 1), pair p's band start is
parity-adjusted so dmin' ≡ p (mod 2), and interleaved char streams
SI[z] = S_{z mod 2}[(z + dmin')/2 - 1] feed both pairs from one sliding
window.  100% lane utilization — 2x multi-chip cells/step over the
round-2 masked-sublattice version.  Requires ``w_eff <= W - 1`` (one
lane of slack absorbs the parity adjustment), the same contract as the
single-chip kernel.

The per-step math mirrors the antidiagonal kernel (corner-seed boundary
injection, validity by poisoning, per-pair parity lane masks) and is
verified against the unsharded engine on a virtual CPU mesh.  Score
mode (traceback at genome scale goes through the pipeline's per-segment
batched path instead; direction emission would need O((LS+LT)·Wl)
bytes per device either way).

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
from ..ops.pallas_dp_ad import _shift_stream, parity_adjusted_dmin, \
    PAD_S, PAD_T
from .mesh import BAND_AXIS

__all__ = ["banded_dp_band_sharded_ad"]


def _band_shard_ad_fn(s_exp, t_flip, dminq2, sl2, tl2, lo2, hi2, subst,
                      *, W: int, Wl: int, C: int, Apad: int,
                      go: float, ge: float, flags: ModeFlags, A: int):
    """Per-device body: owns global lanes [me*Wl, (me+1)*Wl), carries a
    C-lane halo each side (state width Wle = Wl + 2C).  Batch rows are
    dual-pair planes: row b2 = pairs (2 b2, 2 b2 + 1); per-pair scalars
    arrive as [B2, 2] columns."""
    nb = jax.lax.axis_size(BAND_AXIS)
    me = jax.lax.axis_index(BAND_AXIS)
    B2 = dminq2.shape[0]
    Wle = Wl + 2 * C
    g0 = me * Wl                      # first owned global lane
    kg = (
        jax.lax.broadcasted_iota(jnp.int32, (B2, Wle), 1) + g0 - C
    )                                  # global lane ids incl. halo
    lane = jax.lax.broadcasted_iota(jnp.int32, (B2, Wle), 1)
    interior = (lane >= C) & (lane < C + Wl)
    kg_even = (kg % 2) == 0

    d0, d1 = dminq2[:, 0:1], dminq2[:, 1:2]
    sl0, sl1 = sl2[:, 0:1], sl2[:, 1:2]
    tl0, tl1 = tl2[:, 0:1], tl2[:, 1:2]
    lo0, lo1 = lo2[:, 0:1], lo2[:, 1:2]
    hi0, hi1 = hi2[:, 0:1], hi2[:, 1:2]
    sltl0 = sl0 + tl0
    sltl1 = sl1 + tl1
    kc0 = sl0 - tl0 - d0               # global corner lane (i=sl, j=tl)
    kc1 = sl1 - tl1 - d1

    # pair p owns slots with (a + kg) ≡ p (mod 2) (dmin'_p ≡ p by
    # construction): at even a, even lanes are pair 0; at odd a they
    # swap.  Live lanes are each pair's top-w_eff diagonals [lo, hi).
    # Additive float masks (0 live / NEG dead) — one add per step.
    okf0 = jnp.where((kg >= lo0) & (kg < hi0), 0.0, NEG)
    okf1 = jnp.where((kg >= lo1) & (kg < hi1), 0.0, NEG)
    okf_a_even = jnp.where(kg_even, okf0, okf1)
    okf_a_odd = jnp.where(kg_even, okf1, okf0)

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
    # E/F chains grow the gap boundary rays from it.  One seed lane per
    # pair (they never collide: -d0 is even, -d1 odd).
    need_corner_seed = not (flags.local_start or flags.free_start_edges)
    if need_corner_seed:
        H2_0 = jnp.where((kg == -d0) | (kg == -d1), jnp.float32(1.0), NEG)
    else:
        H2_0 = jnp.full((B2, Wle), NEG)

    track_local = flags.local_end
    track_rays = flags.free_end_edges

    right_perm = [(i, i - 1) for i in range(1, nb)]
    left_perm = [(i, i + 1) for i in range(nb - 1)]

    def refresh_halos(X):
        """X: [4, B2, Wle] stacked (H2, H1, E, F).  Neighbors' interior
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
        H2, H1, E, F, Me, Mo = carry
        # windows (see builder): s_exp[x] = SI[x - C] with
        # SI[z] = S_{z%2}[(z + dmin'_{z%2})/2 - 1]; slot (kg, a) reads
        # SI[a + kg] = s_exp[a + g0 + lane].  t_flip[x] = TI[Apad+C-x]
        # with TI[u] = T_{u%2}[(u - dmin'_{u%2})/2 - 1]; slot reads
        # TI[a - kg] = t_flip[Apad + g0 - a + lane].
        s_win = jax.lax.dynamic_slice(
            s_exp, (jnp.int32(0), a + g0), (B2, Wle)
        ).astype(jnp.int32)
        t_win = jax.lax.dynamic_slice(
            t_flip, (jnp.int32(0), Apad + g0 - a), (B2, Wle)
        ).astype(jnp.int32)
        sub = sub_score(s_win, t_win)

        HpGo = H1 + go
        E = shift_lanes(jnp.maximum(HpGo, E), -1, NEG) + ge
        F = shift_lanes(jnp.maximum(HpGo, F), 1, NEG) + ge
        H_new = jnp.maximum(jnp.maximum(H2 + sub, E), F)
        if flags.local_start:
            H_new = jnp.maximum(H_new, 0.0)
        if flags.free_start_edges:
            # boundary rays i == 0 / j == 0 per pair are free starts
            ray = (
                (kg == (-d0 - a)) | (kg == (a - d0))
                | (kg == (-d1 - a)) | (kg == (a - d1))
            )
            H_new = jnp.maximum(H_new, jnp.where(ray, 0.0, NEG))
        a_even = (a % 2) == 0
        H_new = H_new + jnp.where(a_even, okf_a_even, okf_a_odd)

        if track_local:
            tracked = H_new
        elif track_rays:
            # overlap ends per pair: i == slen ray and j == tlen ray
            # (slots are pair-disjoint by parity, so one OR is safe)
            cond = (
                ((kg == (2 * sl0 - d0 - a)) & (a >= sl0) & (a <= sltl0))
                | ((kg == (a - d0 - 2 * tl0)) & (a >= tl0) & (a <= sltl0))
                | ((kg == (2 * sl1 - d1 - a)) & (a >= sl1) & (a <= sltl1))
                | ((kg == (a - d1 - 2 * tl1)) & (a >= tl1) & (a <= sltl1))
            )
            tracked = jnp.where(cond, H_new, NEG)
        else:
            cond = (
                ((a == sltl0) & (kg == kc0))
                | ((a == sltl1) & (kg == kc1))
            )
            tracked = jnp.where(cond, H_new, NEG)
        # per-step-parity accumulators (pair p's values sit on lanes
        # kg ≡ p at even a and kg ≢ p at odd a; the post-loop lane-parity
        # split recovers per-pair maxima exactly — kernel contract)
        Me = jnp.where(a_even, jnp.maximum(Me, tracked), Me)
        Mo = jnp.where(a_even, Mo, jnp.maximum(Mo, tracked))
        return (H1, H_new, E, F, Me, Mo), None

    def chunk(carry, c):
        H2, H1, E, F, Me, Mo = carry
        X = refresh_halos(jnp.stack([H2, H1, E, F]))
        H2, H1, E, F = X[0], X[1], X[2], X[3]
        (H2, H1, E, F, Me, Mo), _ = jax.lax.scan(
            step, (H2, H1, E, F, Me, Mo),
            c * C + jnp.arange(C, dtype=jnp.int32),
        )
        return (H2, H1, E, F, Me, Mo), None

    neg = jnp.full((B2, Wle), NEG)
    init = (H2_0, neg, neg, neg, neg, neg)
    (_, _, _, _, Me, Mo), _ = jax.lax.scan(
        chunk, init, jnp.arange(n_chunks, dtype=jnp.int32)
    )

    # per-pair separation by lane parity, interior lanes only (halo
    # trackers are the neighbors' business)
    v0 = jnp.where(kg_even, Me, Mo)
    v1 = jnp.where(kg_even, Mo, Me)
    s0 = jnp.max(jnp.where(interior, v0, NEG), axis=1)
    s1 = jnp.max(jnp.where(interior, v1, NEG), axis=1)
    out = jnp.stack([s0, s1], axis=1)          # [B2, 2]
    return jax.lax.pmax(out, BAND_AXIS)


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
    only).  ``w_eff <= W - 1``: one lane of slack absorbs the per-pair
    parity adjustment of dmin — the dual-pair packing contract shared
    with the single-chip kernel (values above are clamped).  ``W`` must
    divide by the band-axis size.  Inputs are REPLICATED over the data
    axis: this engine exists for giant single pairs; batch parallelism
    belongs to the data-axis engines.  Pairs (2b2, 2b2+1) share one
    dual-pair lane plane (odd B is padded with an inert pair).
    ``halo`` = C, the steps between neighbor exchanges (communication =
    2 nearest-neighbor sends of [4, B2, C] floats per C antidiagonal
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
        w_eff = jnp.full((B,), W - 1, jnp.int32)
    # <= W - 1 is load-bearing: the parity adjustment drops each pair's
    # bottom lane (dminq = dmin + up), exactly as in the single-chip
    # dual-pair kernel
    w_eff = jnp.minimum(w_eff.astype(jnp.int32), W - 1)

    # pair up: plane b2 holds pairs (2 b2, 2 b2 + 1); odd B pads one
    # inert length-1 pair
    Bp = ((B + 1) // 2) * 2
    B2 = Bp // 2

    def padb(x, fill):
        return jnp.pad(x, ((0, Bp - B),), constant_values=fill)

    s_codes = jnp.pad(s_codes.astype(jnp.int8), ((0, Bp - B), (0, 0)),
                      constant_values=PAD_S)
    t_codes = jnp.pad(t_codes.astype(jnp.int8), ((0, Bp - B), (0, 0)),
                      constant_values=PAD_T)
    s_lens_p = padb(s_lens, 1)
    t_lens_p = padb(t_lens, 1)
    dmin_p = padb(dmin, 0)
    weff_p = padb(w_eff, 1)

    pair_id = jnp.arange(Bp, dtype=jnp.int32) % 2
    dminq = parity_adjusted_dmin(dmin_p, pair_id)   # dmin' ≡ pair (mod 2)
    up = dminq - dmin_p                             # in {0, 1}

    # steps 0..LS+LT inclusive (corner cell sits at a = sl + tl),
    # rounded up to whole halo chunks
    Aend = LS + LT + 1
    Apad = ((Aend + C - 1) // C) * C

    # interleaved char streams (replicated; windows are per-device
    # dynamic slices).  Slot (global lane kg, step a) of pair p is cell
    # (i, j) = ((a + d)/2, (a - d)/2), d = dmin'_p + kg; its chars are
    # S_p[i-1], T_p[j-1].  With z = a + kg (parity z ≡ p):
    #   SI[z] = S_{z%2}[(z + dmin'_{z%2})/2 - 1]   (per-pair shift below)
    #   TI[u] = T_{u%2}[(u - dmin'_{u%2})/2 - 1],  u = a - kg
    # u is NEGATIVE for valid cells whenever dmin' < 0 (down to
    # dmin' + 2, the j = 1 column at i = 0-adjacent lanes), so — exactly
    # as in the single-chip kernel — the t stream is stored at the
    # shifted index x = u + W (ti[x] = TI[x - W], extra -W/2 half-slot
    # shift per pair; W is even so parity is preserved).  s_exp prepends
    # C pads so the per-step slice offset (a + g0) stays nonnegative; t
    # is served flipped (u decreases as the lane grows).
    # Ring rule (round-2 bug class): each half stream's ring must cover
    # its max valid source index (>= LS / LT), or the modular roll in
    # _shift_stream serves wrapped chars under a passing validity mask.
    Mlen = max((Apad + W + 2 * C) // 2 + 2, LS, LT + W // 2)
    Mlen = ((Mlen + 127) // 128) * 128
    s_shift = jnp.where(pair_id == 0, dminq // 2 - 1,
                        (dminq + 1) // 2 - 1)
    t_shift = jnp.where(pair_id == 0, -(dminq // 2) - 1,
                        (1 - dminq) // 2 - 1) - (W // 2)
    s_half = _shift_stream(s_codes, s_shift, s_lens_p, Mlen, PAD_S)
    t_half = _shift_stream(t_codes, t_shift, t_lens_p, Mlen, PAD_T)
    si = jnp.stack([s_half[0::2], s_half[1::2]], axis=2).reshape(
        B2, 2 * Mlen
    )
    ti = jnp.stack([t_half[0::2], t_half[1::2]], axis=2).reshape(
        B2, 2 * Mlen
    )
    s_exp = jnp.pad(si, ((0, 0), (C, 0)), constant_values=PAD_S)
    # t_flip[y] = ti[Apad + C + W - y] = TI[Apad + C - y]; tail pads
    # cover y up to Apad + W + 2C - 1 (top halo lanes of the last shard)
    t_flip = jnp.pad(
        jnp.flip(ti[:, :Apad + C + W + 1], axis=1),
        ((0, 0), (0, C)), constant_values=PAD_T,
    )

    def col(x):
        return x.reshape(B2, 2)

    dminq2 = col(dminq)
    sl2 = col(s_lens_p)
    tl2 = col(t_lens_p)
    lo2 = col(W - up - weff_p)              # live lanes [lo, hi) per pair
    hi2 = col(W - up)

    subst = jnp.asarray(subst, jnp.float32)
    fn = shard_map(
        functools.partial(
            _band_shard_ad_fn, W=W, Wl=Wl, C=C, Apad=Apad,
            go=float(go), ge=float(ge), flags=flags, A=A,
        ),
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    out = fn(s_exp, t_flip, dminq2, sl2, tl2, lo2, hi2, subst)
    return out.reshape(Bp)[:B]
