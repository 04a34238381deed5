"""On-device traceback walk over packed antidiagonal direction planes.

The transcript path previously materialized the whole nibble-packed
direction plane on the host and walked it in C++
(:func:`biseqt_tpu.native.traceback_batch_ad`).  The walk itself is
fast; the device-to-host transfer is not — the plane is ~W/2 bytes per
antidiagonal step per pair-row (config-1 geometry: ~1.3 GB per 1024
pairs), and it dominates transcript-mode end-to-end even on production
PCIe.  This kernel walks ON DEVICE and ships only a 2-bit-per-step packed op
trace (4 antidiagonal steps per byte: ~128x less transfer), which a
tiny C++ pass compacts into MSID transcripts
(:func:`biseqt_tpu.native.compact_sweep_ops`).

Mirrors the reference contract of ``pwlib — dptable_traceback`` (every
alignment gets an edit transcript) with a TPU-shaped algorithm:

* **Lockstep descending-``a`` sweep.**  Every backtrack move from a
  cell on antidiagonal ``a = i + j`` lands on ``a - 1`` (gap) or
  ``a - 2`` (diagonal), so all walks can be advanced by one global
  sweep ``a = Apad-1 .. 0``: a walk acts exactly when its cursor sits
  on the current antidiagonal.  No gathers, no per-pair control flow —
  just masked vector updates, the only data-dependent-control-flow
  shape XLA/Mosaic runs well.
* **Fused gap-entry.**  The scalar walker enters state E/F without
  moving and re-reads the same byte to emit the first gap op.  Fusing
  entry+emit means every action emits exactly one op and decreases
  ``a``, so one sub-step per antidiagonal suffices and an op trace
  indexed by ``a`` never collides.
* **One-hot lane extraction.**  A walk's byte lives at lane
  ``x = i - j - dmin'`` of the current plane row; ``(iota == x)``
  select + lane-max reads all BT pair-rows' bytes in ~4 vector ops —
  per-lane dynamic addressing without a gather.
* **Streamed planes.**  Direction rows are double-buffered HBM->VMEM
  DMA in descending chunks (``pl.multiple_of`` on the descending
  offsets), the per-chunk op traces are register values scattered by
  the static unroll index and DMA'd out once per chunk.

Both nibble-packed pairs of a plane row walk simultaneously (parity
slot p reads lanes with ``(a + x) % 2 == p``).  Op codes in the trace:
0 none, 1 diagonal (M/S split done host-side against the chars),
2 insertion (consumes t), 3 deletion (consumes s).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

OP_NONE, OP_DIAG, OP_INS, OP_DEL = 0, 1, 2, 3

_RC = 64     # packed dirs rows per DMA chunk (= 128 antidiagonal steps)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _lane_block(B2: int, W: int, col_block: int) -> int:
    """Lane-block width for the lane-packed walk (traceback_sweep_t).

    The VMEM working set scales as RC*W*BL: dbuf holds 2 chunks of
    [RC, W, BL] uint8 and the unrolled body materializes their i32
    nibble splits (single-assignment stack slots — see CLAUDE.md).
    ``col_block`` calibrates the census shape (W=128, BL=1024, ~60 MB
    under the 100 MB vmem_limit); wider bands reach this path through
    the pipeline's W % 128 == 0 lane gate (bucketed 256/384/512...),
    so shrink the lane block proportionally to keep the same budget
    instead of failing the compile with a Mosaic VMEM OOM."""
    cb_eff = max(128, (int(col_block) * 128 // max(W, 128)) // 128 * 128)
    return min(_round_up(B2, 128), cb_eff)


def _kernel(dq0_ref, dq1_ref, ei0_ref, ei1_ref, ej0_ref, ej1_ref,
            dirs_hbm,
            fi0_ref, fi1_ref, fj0_ref, fj1_ref, tr0_hbm, tr1_hbm,
            dbuf, obuf, sems, osems,
            *, W: int, Rp: int, BT: int, RC: int, G: int = 1,
            strip: int = 0):
    b = pl.program_id(0)
    row0 = b * BT
    GB = BT // G               # plane rows per interleave group
    n_chunks = Rp // RC
    lanes = jax.lax.broadcasted_iota(jnp.int32, (GB, W), 1)
    # op codes are 2 bits — pack 4 antidiagonal steps per trace byte
    # (the trace D2H is the transcript path's remaining transfer).
    # Mosaic requires 128-aligned trailing slices, so the packed bytes
    # accumulate in a [GB, 128] register value carried across a GROUP
    # of 4 chunks (4 * 2*RC steps = 128 bytes) and flush once per group
    # with a synchronous ~8 KB DMA at the group's low chunk.
    steps_q = jax.lax.broadcasted_iota(jnp.int32, (GB, 128), 1)
    assert 256 % RC == 0 and RC % 2 == 0, (
        "RC must be an even divisor of 256 (the caller clamps r_rows "
        "to a power of two <= 256); got %r" % (RC,))
    GPC = 256 // RC            # chunks per 128-byte trace group

    # merged-parity extraction constants (round-4 op-count squeeze): at
    # antidiagonal a, lane l serves parity slot (a + l) % 2 — an ACTIVE
    # cursor's lane parity always matches its slot's, so ONE compare
    # against a slot-selected cursor vector replaces the two per-slot
    # one-hots, and a static {1, 16} weight vector replaces the
    # slot-1 nibble multiply.  Two variants, chosen by a % 2 at the
    # static unroll step.
    lane_par = lanes & 1
    m1_by_par = (lane_par == 1, lane_par == 0)   # slot-1 mask, a even/odd
    wv_by_par = (jnp.where(m1_by_par[0], 16, 1),
                 jnp.where(m1_by_par[1], 16, 1))

    def gsl(ref, g):
        return ref[g * GB:(g + 1) * GB, :1]

    # per-pair walker state is PARITY-PACKED [GB, 2] (lane p = parity
    # slot p): the scalar update logic is identical for both slots, so
    # one vector op serves both — the census showed per-op overhead
    # (not vreg volume) dominating the [GB, 1] scalar ops, and packing
    # halves the op count (round-4 redesign)
    iota2 = jax.lax.broadcasted_iota(jnp.int32, (GB, 2), 1)

    def pack2(c0, c1):
        return jnp.where(iota2 == 0, c0, c1)

    def col0(v):
        return v[:, :1]

    def col1(v):
        # lane 1 without an unaligned slice: both lanes sum minus lane 0
        return jnp.sum(v, axis=1, keepdims=True) - v[:, :1]

    dq = [pack2(gsl(dq0_ref, g), gsl(dq1_ref, g)) for g in range(G)]

    def start_dma(slot, c):
        base = pl.multiple_of(c * RC, RC)
        pltpu.make_async_copy(
            dirs_hbm.at[pl.ds(base, RC), pl.ds(row0, BT), :],
            dbuf.at[slot], sems.at[slot],
        ).start()

    def wait_dma(slot, c):
        base = pl.multiple_of(c * RC, RC)
        pltpu.make_async_copy(
            dirs_hbm.at[pl.ds(base, RC), pl.ds(row0, BT), :],
            dbuf.at[slot], sems.at[slot],
        ).wait()

    def out_dma(g, par):
        base = pl.multiple_of(g * 128, 128)
        hbm = tr0_hbm if par == 0 else tr1_hbm
        return pltpu.make_async_copy(
            obuf.at[par],
            hbm.at[pl.ds(row0, BT), pl.ds(base, 128)],
            osems.at[par],
        )

    start_dma(0, n_chunks - 1)

    def extract2(nib_row, x0, x1, m1, wv):
        """Both parity slots' bytes from one plane row in ONE compare +
        ONE lane reduction.

        ACTIVE cursors sit on complementary lane parities (slot p owns
        lanes with ``(a + x) % 2 == p``), so lane l only ever needs to
        compare against ONE slot's cursor — ``m1`` selects it — and the
        static ``wv`` = {1, 16} weight vector pre-scales slot 1's
        nibble so the SUM-reduce packs ``byte0 + 16 * byte1`` exactly.
        Callers MUST pass inactive cursors as an impossible lane
        (e.g. -1): an inactive slot's stale cursor has arbitrary parity
        and a lane collision would corrupt the ACTIVE slot's sum.
        """
        xsel = jnp.where(m1, x1, x0)
        payload = jnp.where(lanes == xsel, nib_row * wv, 0)
        # lane reduction stays on the VPU: an MXU dot (payload @ ones)
        # measured 85.6 ms vs 77.8 — each step's byte feeds the very
        # next scalar update, so the matmul's latency lands on the
        # serial chain instead of pipelining (round-4 measurement)
        both = jnp.sum(payload, axis=1, keepdims=True)
        b0 = both & 15
        # >> 4 without a vector shift: exact for values < 2^20 via f32
        b1 = ((both - b0).astype(jnp.float32)
              * jnp.float32(1.0 / 16.0)).astype(jnp.int32)
        return b0, b1

    def step_walk(byte, act, A, X, I, J, ST):
        """One fused walker action for one interleave group's walks,
        BOTH parity slots at once.

        All inputs [GB, 2] i32 (``act`` bool), lane p = parity slot p.
        Carries: ``A = i + j`` (-2 once done — the DN flag of the
        round-3 kernel is folded in), ``X = i - j - dmin'`` (the plane
        lane), ``I``/``J`` the cursor, ``ST`` the gap state encoded AS
        the op it emits (0 = H, 2 = in-E/INS, 3 = in-F/DEL) so the
        effective op is one select and the move deltas fall out of the
        op code arithmetically: ``di = OP & 1`` (diag/del consume s),
        ``dj = ((OP+1) & 2) != 0`` (diag/ins consume t),
        ``dx = dj - di``.  The gap-state update exploits an invariant:
        a walker with ``ST != 0`` is active at EVERY antidiagonal until
        its run ends (gap moves decrement a by exactly 1), so inactive
        walkers always have ``ST == 0`` and the update needs no
        act-gating: ``ST2 = where(cont, OP, 0)``.
        """
        if strip == 23:   # diagnostics: no scalar walker-state logic
            return byte & 3, A, X, I, J, ST
        src = byte & 3
        stn = ST != 0
        eff = jnp.where(stn, ST, src)
        # in H: i==0 / j==0 (band/edge start) or src==0 (local start)
        # ends the walk without emitting; gap-entry (src 2/3) is fused
        # with its first emit — the scalar walker re-reads the same byte
        stop = (jnp.minimum(I, J) == 0) | (src == 0)
        keep = stn | ~stop            # stop applies in H only
        emit = act & keep
        OP = jnp.where(emit, eff, 0)
        di = OP & 1
        dj = jnp.where(((OP + 1) & 2) != 0, 1, 0)
        I2 = I - di
        J2 = J - dj
        X2 = X + (dj - di)
        A2 = jnp.where(act & ~keep, -2, A - di - dj)
        is_e = OP == OP_INS
        gbit = jnp.where(is_e, byte & 4, byte & 8)
        live = jnp.where(is_e, J2, I2)
        cont = ((OP & 2) != 0) & (gbit != 0) & (live > 0)
        ST2 = jnp.where(cont, OP, 0)
        return OP, A2, X2, I2, J2, ST2

    # carry layout: G repetitions of (A, X, I, J, ST, acc0, acc1); the
    # cursor state is parity-packed [GB, 2], accs are [GB, 128].
    NC = 7

    def chunk_body(cc, carry):
        c = n_chunks - 1 - cc
        slot = cc % 2
        gs = [list(carry[NC * g:NC * g + NC]) for g in range(G)]

        @pl.when(cc + 1 < n_chunks)
        def _():
            start_dma(1 - slot, c - 1)

        wait_dma(slot, c)
        chunk = dbuf[slot].astype(jnp.int32)      # [RC, BT, W]
        lo = chunk & 15
        # high nibble without a vector shift (Mosaic has no vector shl,
        # and shr is equally unsupported): exact for byte values via f32
        hi = ((chunk - lo).astype(jnp.float32)
              * jnp.float32(1.0 / 16.0)).astype(jnp.int32)

        # trace byte lane within this chunk's 128-byte group
        lane0 = (c % GPC) * (RC // 2)
        # per-byte op accumulators [GB, 1]: the wide [GB, 128] trace
        # accs are touched once per BYTE (4 steps), not once per step —
        # the ops of a byte's 4 steps sum in tiny registers first
        # (round-4 squeeze: saves ~4 wide ops/step; byte boundaries
        # align with the descending unroll because 2*RC % 4 == 0)
        bacc = [[None, None] for _ in range(G)]
        for rr in reversed(range(2 * RC)):
            r, q = rr // 2, rr % 2
            a = c * (2 * RC) + rr
            # a % 2 == rr % 2 (2*RC is even), so the parity variant is
            # static per unrolled step even though a itself is traced
            m1 = m1_by_par[rr % 2]
            wv = wv_by_par[rr % 2]
            w = 1 << (2 * (rr % 4))   # 2-bit field (rr % 4) of the byte
            for g in range(G):
                nib_row = (hi if q else lo)[r, g * GB:(g + 1) * GB, :]
                A, X, I, J, ST, acc0, acc1 = gs[g]
                # parity slot p owns lanes with (a + x) % 2 == p; both
                # slots act at every a, on complementary lanes — one
                # fused extraction serves both (inactive cursors
                # masked to -1)
                act = A == a
                Xm = jnp.where(act, X, -1)
                if strip == 22:   # diagnostics: no byte extraction
                    BY = jnp.full((GB, 2), 1, jnp.int32)
                else:
                    byte0, byte1 = extract2(nib_row, col0(Xm), col1(Xm),
                                            m1, wv)
                    BY = pack2(byte0, byte1)
                OP, A, X, I, J, ST = step_walk(BY, act, A, X, I, J, ST)
                if strip != 20:   # 20 = no trace accumulation
                    op0 = col0(OP)
                    op1 = (op0 if strip == 21   # 21 = single parity
                           else col1(OP))
                    if rr % 4 == 3:
                        bacc[g] = [op0 * w, op1 * w]
                    else:
                        bacc[g] = [bacc[g][0] + op0 * w,
                                   bacc[g][1] + op1 * w]
                    if rr % 4 == 0:
                        sel = steps_q == lane0 + rr // 4
                        acc0 = jnp.where(sel, acc0 + bacc[g][0], acc0)
                        acc1 = jnp.where(sel, acc1 + bacc[g][1], acc1)
                gs[g] = [A, X, I, J, ST, acc0, acc1]

        # flush at the group's LOW chunk (processing order is
        # descending, so c % GPC == 0 closes its group); ~8 KB,
        # synchronous — negligible once per GPC chunks
        @pl.when(c % GPC == 0)
        def _():
            for g in range(G):
                obuf[0, g * GB:(g + 1) * GB] = gs[g][5].astype(jnp.uint8)
                obuf[1, g * GB:(g + 1) * GB] = gs[g][6].astype(jnp.uint8)
            out_dma(c // GPC, 0).start()
            out_dma(c // GPC, 1).start()
            out_dma(c // GPC, 0).wait()
            out_dma(c // GPC, 1).wait()

        flushed = (c % GPC) == 0
        zero = jnp.zeros((GB, 128), jnp.int32)
        for g in range(G):
            gs[g][5] = jnp.where(flushed, zero, gs[g][5])
            gs[g][6] = jnp.where(flushed, zero, gs[g][6])
        return tuple(x for g in range(G) for x in gs[g])

    zacc = jnp.zeros((GB, 128), jnp.int32)

    def ginit(g):
        EI = pack2(gsl(ei0_ref, g), gsl(ei1_ref, g))
        EJ = pack2(gsl(ej0_ref, g), gsl(ej1_ref, g))
        # A = i + j, or -2 once done (-1 end cells mean "skip": their
        # A is negative from the start, so they never activate)
        A0 = jnp.where(EI < 0, -2, EI + EJ)
        X0 = EI - EJ - dq[g]
        return (A0, X0, EI, EJ, jnp.zeros((GB, 2), jnp.int32),
                zacc, zacc)

    init = tuple(x for g in range(G) for x in ginit(g))
    fin = jax.lax.fori_loop(0, n_chunks, chunk_body, init)
    for g in range(G):
        fi0_ref[g * GB:(g + 1) * GB, :] = col0(fin[NC * g + 2])
        fj0_ref[g * GB:(g + 1) * GB, :] = col0(fin[NC * g + 3])
        fi1_ref[g * GB:(g + 1) * GB, :] = col1(fin[NC * g + 2])
        fj1_ref[g * GB:(g + 1) * GB, :] = col1(fin[NC * g + 3])


@functools.partial(
    jax.jit,
    static_argnames=("W", "block_b", "r_rows", "interpret", "groups",
                     "_strip"),
)
def traceback_sweep(dirs, dminq, end_i, end_j, *, W: int,
                    block_b: int = 64, r_rows: int = _RC,
                    interpret: bool = False, groups: int = 2,
                    _strip: int = 0):
    """Walk all pairs' tracebacks on device over the packed dirs plane.

    Args: ``dirs`` [Rp, B2, W] uint8 (the AD kernel's row-major
    nibble-packed plane), ``dminq`` the parity-adjusted band starts
    [B], ``end_i`` /
    ``end_j`` [B] end cells (pass -1 to skip a pair).  B = 2 * B2,
    pair b on plane b // 2, parity slot b % 2.

    Returns ``(trace0, trace1, fin_i, fin_j)``: 2-bit-packed op traces
    [B2, Rp // 2] uint8 — antidiagonal ``a``'s op code (OP_*) sits in
    bits ``2*(a % 4)`` of byte ``a // 4`` — and the walk's final cursor
    [B] (the alignment start cell; anchored-start I/D tails are the
    compactor's job).  Feed to
    :func:`biseqt_tpu.native.compact_sweep_ops`.
    """
    Rp, B2, Wd = dirs.shape          # row-major plane [a // 2, b2, x]
    assert Wd == W and W % 128 == 0
    B = dminq.shape[0]        # may be < 2*B2 (the DP kernel pads planes)
    assert B <= 2 * B2 and end_i.shape == (B,) and end_j.shape == (B,)
    if B2 == 0 or Rp == 0:
        # degenerate plane: no steps to walk — without this guard the
        # unconditional first start_dma would read HBM at offset
        # RC * (n_chunks - 1) = -RC and never be waited on
        return (jnp.zeros((B2, 0), jnp.uint8), jnp.zeros((B2, 0), jnp.uint8),
                end_i.astype(jnp.int32), end_j.astype(jnp.int32))
    # the trace-group flush logic needs RC | 256 (a 128-byte group is a
    # whole number of chunks) and RC even (nibble pairs) — clamp the
    # requested r_rows DOWN to the largest power of two <= min(r_rows,
    # Rp) instead of asserting on nondefault r_rows (advisor round 3)
    RC = min(max(int(r_rows), 2), max(Rp, 2), 256)
    RC = 1 << (RC.bit_length() - 1)
    Rpp = _round_up(Rp, RC)
    if Rpp != Rp:
        dirs = jnp.pad(dirs, ((0, Rpp - Rp), (0, 0), (0, 0)))
    # trace bytes per plane row (4 steps/byte), padded to whole
    # 128-byte flush groups
    TRb = _round_up(Rpp // 2, 128)
    # G interleave groups of block_b rows run per program: the walk is
    # latency-bound on each step's extract->update chain (round-4
    # census: 78 ms measured vs ~23 ms issue estimate), and independent
    # groups give the scheduler chains to overlap.  Small batches skip
    # the interleave rather than padding up to G * block_b rows.
    G = int(groups) if B2 > block_b else 1
    BT = block_b * G
    Bp2 = _round_up(B2, BT)
    if Bp2 != B2:
        dirs = jnp.pad(dirs, ((0, 0), (0, Bp2 - B2), (0, 0)))

    def prep(v, fill):
        v = v.astype(jnp.int32)
        v = jnp.pad(v, ((0, 2 * Bp2 - B),), constant_values=fill)
        return v.reshape(Bp2, 2)

    dq2 = prep(dminq, 0)
    ei2 = prep(end_i, -1)
    ej2 = prep(end_j, -1)

    vspec = lambda: pl.BlockSpec((BT, 1), lambda b: (b, 0),
                                 memory_space=pltpu.VMEM)
    kernel = functools.partial(_kernel, W=W, Rp=Rpp, BT=BT, RC=RC,
                               G=G, strip=int(_strip))
    out = pl.pallas_call(
        kernel,
        grid=(Bp2 // BT,),
        in_specs=[vspec()] * 6 + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[vspec()] * 4 + [
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp2, 1), jnp.int32),
            jax.ShapeDtypeStruct((Bp2, 1), jnp.int32),
            jax.ShapeDtypeStruct((Bp2, 1), jnp.int32),
            jax.ShapeDtypeStruct((Bp2, 1), jnp.int32),
            jax.ShapeDtypeStruct((Bp2, TRb), jnp.uint8),
            jax.ShapeDtypeStruct((Bp2, TRb), jnp.uint8),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, RC, BT, W), jnp.uint8),       # dirs chunks
            pltpu.VMEM((2, BT, 128), jnp.uint8),         # trace groups
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(dq2[:, 0:1], dq2[:, 1:2], ei2[:, 0:1], ei2[:, 1:2],
      ej2[:, 0:1], ej2[:, 1:2], dirs)
    fi = jnp.stack([out[0][:, 0], out[1][:, 0]], axis=1).reshape(-1)[:B]
    fj = jnp.stack([out[2][:, 0], out[3][:, 0]], axis=1).reshape(-1)[:B]
    return out[4][:B2], out[5][:B2], fi, fj


@functools.partial(
    jax.jit,
    static_argnames=("W", "block_b", "r_rows", "interpret", "groups"),
)
def traceback_sweep_fused(dirs, dminq, end_i, end_j, *, W: int,
                          block_b: int = 64, r_rows: int = _RC,
                          interpret: bool = False, groups: int = 2):
    """:func:`traceback_sweep` with all four outputs FUSED into one
    uint8 array, so the host materializes the whole walk result in ONE
    device-to-host transfer.

    This environment's tunnel charges a ~22-32 ms fixed floor PER
    transfer on top of ~60 MB/s streaming (measured round 4), so the
    separate tr0/tr1/fi/fj materializations cost three extra floors per
    batch — more than the 16 bytes of cursor payload by 4 orders of
    magnitude.  Returns uint8 ``[B2, 2 * TRb + 16]``: trace0 | trace1 |
    (fi0, fi1, fj0, fj1) int32 little-endian per plane row.  Split with
    :func:`split_sweep_fused`.
    """
    tr0, tr1, fi, fj = traceback_sweep(
        dirs, dminq, end_i, end_j, W=W, block_b=block_b, r_rows=r_rows,
        interpret=interpret, groups=groups,
    )
    B2 = tr0.shape[0]
    B = fi.shape[0]
    # pad fi/fj to 2*B2 then de-interleave into per-plane-row columns
    fi_p = jnp.full((2 * B2,), -1, jnp.int32).at[:B].set(fi)
    fj_p = jnp.full((2 * B2,), -1, jnp.int32).at[:B].set(fj)
    cur = jnp.stack([fi_p[0::2], fi_p[1::2], fj_p[0::2], fj_p[1::2]],
                    axis=1)                          # [B2, 4] int32
    cur_u8 = jax.lax.bitcast_convert_type(
        cur, jnp.uint8).reshape(B2, 16)
    return jnp.concatenate([tr0, tr1, cur_u8], axis=1)


def split_sweep_fused(fused: np.ndarray, B: int):
    """Host-side inverse of :func:`traceback_sweep_fused`: returns
    ``(trace0, trace1, fin_i, fin_j)`` numpy views/copies for ``B``
    real pairs."""
    fused = np.asarray(fused)
    B2, total = fused.shape
    TRb = (total - 16) // 2
    tr0 = fused[:, :TRb]
    tr1 = fused[:, TRb:2 * TRb]
    cur = fused[:, 2 * TRb:].copy().view(np.int32).reshape(B2, 4)
    fi = np.empty((2 * B2,), np.int32)
    fj = np.empty((2 * B2,), np.int32)
    fi[0::2], fi[1::2] = cur[:, 0], cur[:, 1]
    fj[0::2], fj[1::2] = cur[:, 2], cur[:, 3]
    return tr0, tr1, fi[:B], fj[:B]


# ---------------------------------------------------------------------------
# Lane-packed walk over the TRANSPOSED plane (round 5)
# ---------------------------------------------------------------------------
#
# The sublane-packed kernel above pays Mosaic's fixed ~4-7-cycle per-op
# overhead once per (grid program x interleave group) for every one of
# its ~40 small ops per antidiagonal — with 4 programs x 2 groups at the
# census shape that is ~320 op-issues per antidiagonal, and the round-4
# census measured the walk 3.2x above its issue floor, op-COUNT-bound.
# Flipping the plane chunk to [x, b2] (lanes = plane columns) packs the
# walkers into the LANE axis instead:
#   * extraction's one-hot runs over SUBLANES ([W, B] compare against a
#     lane-packed cursor row) and its reduce is a sublane fold — one
#     extraction serves EVERY plane row at once;
#   * the ~30-op walker update chain runs ONCE per antidiagonal for all
#     walkers ([2, B] state, sublane = parity slot) instead of once per
#     program x group;
#   * trace bytes build as [1, B] lane rows and concatenate into full
#     [RC/2, B] tiles per chunk — no per-step wide accumulators at all.


def _kernel_t(dq_ref, ei_ref, ej_ref, dirs_hbm, fi_ref, fj_ref, tr_hbm,
              dbuf, obuf, sems, osems, *, W: int, Rp: int, BL: int,
              RC: int):
    cb = pl.program_id(0)
    col0 = cb * BL
    n_chunks = Rp // RC
    nb = RC // 2                    # trace bytes per chunk (4 steps/byte)
    xsub = jax.lax.broadcasted_iota(jnp.int32, (W, BL), 0)
    iota2 = jax.lax.broadcasted_iota(jnp.int32, (2, BL), 0)
    # slot(x) = (a + x) % 2; the slot-1 mask and the {1, 16} nibble
    # weights are static per a-parity (lo rows are even a, hi rows odd)
    sub_par = xsub & 1
    slot1 = (sub_par == 1, sub_par == 0)            # a even / a odd
    wv = (jnp.where(slot1[0], 16, 1), jnp.where(slot1[1], 16, 1))

    def start_dma(slot, c):
        base = pl.multiple_of(c * RC, RC)
        pltpu.make_async_copy(
            dirs_hbm.at[pl.ds(base, RC), :, pl.ds(col0, BL)],
            dbuf.at[slot], sems.at[slot],
        ).start()

    def wait_dma(slot, c):
        base = pl.multiple_of(c * RC, RC)
        pltpu.make_async_copy(
            dirs_hbm.at[pl.ds(base, RC), :, pl.ds(col0, BL)],
            dbuf.at[slot], sems.at[slot],
        ).wait()

    def out_dma(oslot, c):
        base = pl.multiple_of(c * nb, nb)
        return pltpu.make_async_copy(
            obuf.at[oslot],
            tr_hbm.at[:, pl.ds(base, nb), pl.ds(col0, BL)],
            osems.at[oslot],
        )

    start_dma(0, n_chunks - 1)

    def step_walk(byte, act, A, X, I, J, ST):
        """One fused walker action, BOTH parity slots at once — same
        semantics as the sublane kernel's step_walk (see above), on
        lane-packed [2, BL] state (sublane p = parity slot p)."""
        src = byte & 3
        stn = ST != 0
        eff = jnp.where(stn, ST, src)
        stop = (jnp.minimum(I, J) == 0) | (src == 0)
        keep = stn | ~stop
        emit = act & keep
        OP = jnp.where(emit, eff, 0)
        di = OP & 1
        dj = jnp.where(((OP + 1) & 2) != 0, 1, 0)
        I2 = I - di
        J2 = J - dj
        X2 = X + (dj - di)
        A2 = jnp.where(act & ~keep, -2, A - di - dj)
        is_e = OP == OP_INS
        gbit = jnp.where(is_e, byte & 4, byte & 8)
        live = jnp.where(is_e, J2, I2)
        cont = ((OP & 2) != 0) & (gbit != 0) & (live > 0)
        ST2 = jnp.where(cont, OP, 0)
        return OP, A2, X2, I2, J2, ST2

    def chunk_body(cc, carry):
        c = n_chunks - 1 - cc
        slot = cc % 2
        A, X, I, J, ST = carry

        @pl.when(cc + 1 < n_chunks)
        def _():
            start_dma(1 - slot, c - 1)

        # the slot's previous trace write-out must have landed before
        # this chunk rebuilds obuf[slot]
        @pl.when(cc >= 2)
        def _():
            out_dma(slot, c + 2).wait()

        wait_dma(slot, c)
        chunk = dbuf[slot].astype(jnp.int32)      # [RC, W, BL]
        lo = chunk & 15
        hi = ((chunk - lo).astype(jnp.float32)
              * jnp.float32(1.0 / 16.0)).astype(jnp.int32)

        bacc = None
        blist = []          # per-chunk trace bytes, descending byte idx
        for rr in reversed(range(2 * RC)):
            r, q = rr // 2, rr % 2
            a = c * (2 * RC) + rr
            nib = (hi if q else lo)[r]            # [W, BL]
            act = A == a
            Xm = jnp.where(act, X, -1)
            # one [W, BL] one-hot serves both slots: sublane x compares
            # against slot(x)'s cursor; slot-1 bytes pre-scale by 16 so
            # the sublane SUM-reduce packs byte0 + 16*byte1 exactly
            xsel = jnp.where(slot1[rr % 2], Xm[1:2, :], Xm[0:1, :])
            payload = jnp.where(xsub == xsel, nib * wv[rr % 2], 0)
            packed = jnp.sum(payload, axis=0, keepdims=True)  # [1, BL]
            b0 = packed & 15
            b1 = ((packed - b0).astype(jnp.float32)
                  * jnp.float32(1.0 / 16.0)).astype(jnp.int32)
            BY = jnp.where(iota2 == 0, b0, b1)                # [2, BL]
            OP, A, X, I, J, ST = step_walk(BY, act, A, X, I, J, ST)
            w = 1 << (2 * (rr % 4))
            bacc = OP * w if rr % 4 == 3 else bacc + OP * w
            if rr % 4 == 0:
                blist.append(bacc)
        # bytes were built descending; stack ascending per parity slot
        # into whole [nb, BL] tiles (no per-step wide accumulators)
        basc = blist[::-1]
        obuf[slot, 0] = jnp.concatenate(
            [b[0:1, :] for b in basc], axis=0).astype(jnp.uint8)
        obuf[slot, 1] = jnp.concatenate(
            [b[1:2, :] for b in basc], axis=0).astype(jnp.uint8)
        out_dma(slot, c).start()
        return (A, X, I, J, ST)

    EI = ei_ref[:, :]                               # [2, BL]
    EJ = ej_ref[:, :]
    A0 = jnp.where(EI < 0, -2, EI + EJ)
    X0 = EI - EJ - dq_ref[:, :]
    init = (A0, X0, EI, EJ, jnp.zeros((2, BL), jnp.int32))
    fin = jax.lax.fori_loop(0, n_chunks, chunk_body, init)
    # drain the last two trace write-outs
    if n_chunks >= 2:
        out_dma(n_chunks % 2, 1).wait()
    out_dma((n_chunks - 1) % 2, 0).wait()
    fi_ref[:, :] = fin[2]
    fj_ref[:, :] = fin[3]


@functools.partial(
    jax.jit,
    static_argnames=("W", "col_block", "r_rows", "interpret",
                     "transposed"),
)
def traceback_sweep_t(dirs, dminq, end_i, end_j, *, W: int,
                      col_block: int = 1024, r_rows: int = 32,
                      interpret: bool = False, transposed: bool = False):
    """Lane-packed on-device traceback walk (round 5).

    Same contract as :func:`traceback_sweep` but walkers live in the
    LANE axis, so the whole batch shares one extraction + one update
    chain per antidiagonal.  ``dirs``: the AD kernel's [Rp, B2, W]
    plane (transposed on device to [Rp, W, B2] unless
    ``transposed=True`` says it already is).

    Returns ``(trace, fin_i, fin_j)``: ``trace`` [2, TRb, B2] uint8 —
    parity slot p's plane is ``trace[p]``, antidiagonal ``a``'s op code
    in bits ``2*(a % 4)`` of byte row ``a // 4``, pair column ``b // 2``
    — and the final cursors [B].  Feed to
    :func:`biseqt_tpu.native.compact_sweep_ops_t`.
    """
    if not transposed:
        dirs = jnp.swapaxes(dirs, 1, 2)        # [Rp, W, B2]
    Rp, Wd, B2 = dirs.shape
    assert Wd == W and W % 128 == 0
    B = dminq.shape[0]
    assert B <= 2 * B2 and end_i.shape == (B,) and end_j.shape == (B,)
    if B2 == 0 or Rp == 0:
        return (jnp.zeros((2, 0, B2), jnp.uint8),
                end_i.astype(jnp.int32), end_j.astype(jnp.int32))
    BL = _lane_block(B2, W, col_block)
    RC = min(max(int(r_rows), 4), max(Rp, 4), 256)
    RC = 1 << (RC.bit_length() - 1)            # power of two, >= 4
    # second VMEM guard: _lane_block floors BL at 128 lanes, so at
    # extreme W the RC*W*BL working set can still exceed the census
    # calibration (r_rows=32, W=128, BL=1024 ~ 60 MB) — halve the row
    # chunk until it fits (RC >= 4 keeps the trace tile >= 2 byte rows)
    while RC > 4 and RC * W * BL > 32 * 128 * 1024:
        RC //= 2
    Rpp = _round_up(Rp, RC)
    if Rpp != Rp:
        dirs = jnp.pad(dirs, ((0, Rpp - Rp), (0, 0), (0, 0)))
    Bcols = _round_up(B2, BL)
    if Bcols != B2:
        dirs = jnp.pad(dirs, ((0, 0), (0, 0), (0, Bcols - B2)))
    TRb = Rpp // 2

    def prep(v, fill):
        v = v.astype(jnp.int32)
        v = jnp.pad(v, ((0, 2 * Bcols - B),), constant_values=fill)
        # de-interleave pairs into slot rows: [2, Bcols]
        return v.reshape(Bcols, 2).T

    dq2 = prep(dminq, 0)
    ei2 = prep(end_i, -1)
    ej2 = prep(end_j, -1)

    vspec = lambda: pl.BlockSpec((2, BL), lambda cb: (0, cb),
                                 memory_space=pltpu.VMEM)
    kernel = functools.partial(_kernel_t, W=W, Rp=Rpp, BL=BL, RC=RC)
    out = pl.pallas_call(
        kernel,
        grid=(Bcols // BL,),
        in_specs=[vspec()] * 3 + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[vspec(), vspec(),
                   pl.BlockSpec(memory_space=pl.ANY)],
        out_shape=[
            jax.ShapeDtypeStruct((2, Bcols), jnp.int32),
            jax.ShapeDtypeStruct((2, Bcols), jnp.int32),
            jax.ShapeDtypeStruct((2, TRb, Bcols), jnp.uint8),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, RC, W, BL), jnp.uint8),       # dirs chunks
            pltpu.VMEM((2, 2, RC // 2, BL), jnp.uint8),  # trace tiles
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(dq2, ei2, ej2, dirs)
    fi = out[0].T.reshape(-1)[:B]
    fj = out[1].T.reshape(-1)[:B]
    return out[2][:, :, :B2], fi, fj


@functools.partial(
    jax.jit,
    static_argnames=("W", "col_block", "r_rows", "interpret",
                     "transposed"),
)
def traceback_sweep_t_fused(dirs, dminq, end_i, end_j, *, W: int,
                            col_block: int = 1024, r_rows: int = 32,
                            interpret: bool = False,
                            transposed: bool = False):
    """:func:`traceback_sweep_t` with trace + cursors FUSED into one
    uint8 array (one D2H transfer; see :func:`traceback_sweep_fused`
    for why this environment charges per-transfer floors).

    Returns uint8 ``[2 * TRb + 16, B2]``: plane-0 trace rows | plane-1
    trace rows | 16 rows of int32 little-endian cursors (fi plane 0,
    fi plane 1, fj plane 0, fj plane 1 — 4 byte-rows each).  Split with
    :func:`split_sweep_t_fused`.
    """
    tr, fi, fj = traceback_sweep_t(
        dirs, dminq, end_i, end_j, W=W, col_block=col_block,
        r_rows=r_rows, interpret=interpret, transposed=transposed,
    )
    _, TRb, B2 = tr.shape
    B = fi.shape[0]
    fi_p = jnp.full((2 * B2,), -1, jnp.int32).at[:B].set(fi)
    fj_p = jnp.full((2 * B2,), -1, jnp.int32).at[:B].set(fj)
    cur = jnp.stack([fi_p[0::2], fi_p[1::2], fj_p[0::2], fj_p[1::2]],
                    axis=0)                          # [4, B2] int32
    cur_u8 = jnp.moveaxis(
        jax.lax.bitcast_convert_type(cur, jnp.uint8),  # [4, B2, 4]
        2, 1).reshape(16, B2)
    return jnp.concatenate([tr.reshape(2 * TRb, B2), cur_u8], axis=0)


def split_sweep_t_fused(fused: np.ndarray, B: int):
    """Host-side inverse of :func:`traceback_sweep_t_fused`: returns
    ``(trace [2, TRb, B2], fin_i [B], fin_j [B])`` ready for
    :func:`biseqt_tpu.native.compact_sweep_ops_t`."""
    fused = np.asarray(fused)
    total, B2 = fused.shape
    TRb = (total - 16) // 2
    tr = fused[:2 * TRb].reshape(2, TRb, B2)
    cur = np.ascontiguousarray(
        np.moveaxis(fused[2 * TRb:].reshape(4, 4, B2), 1, 2)
    ).view(np.int32).reshape(4, B2)
    fi = np.empty((2 * B2,), np.int32)
    fj = np.empty((2 * B2,), np.int32)
    fi[0::2], fi[1::2] = cur[0], cur[1]
    fj[0::2], fj[1::2] = cur[2], cur[3]
    return tr, fi[:B], fj[:B]
