"""Serialized real-chip smoke test: one command, JSON summary.

Re-verifies on actual TPU hardware (everything else in tests/ runs
CPU-forced) that:
  1. the Pallas row kernel matches the lax engine (scores, small shapes);
  2. direction bytes from the kernel walk to the same transcripts;
  3. the antidiagonal dual-pair kernel matches both;
  4. the sorted all-vs-all engine finds planted overlaps;
  5. bench-scale throughput is sane (quick, 1 iteration).

Run via ``make tpu-smoke``.  Keep SERIAL: concurrent processes through
the TPU tunnel have crashed the worker (CLAUDE.md).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from biseqt_tpu.ops.banded_dp import banded_dp, ModeFlags
    from biseqt_tpu.ops.pallas_dp import banded_dp_pallas
    from biseqt_tpu.ops.pallas_dp_ad import banded_dp_pallas_ad
    from biseqt_tpu.ops.banded_dp import traceback_path

    t_start = time.time()
    out = {"backend": jax.default_backend(), "checks": {}}
    ok_all = True

    def check(name, cond, detail=""):
        nonlocal ok_all
        out["checks"][name] = {"ok": bool(cond), "detail": str(detail)}
        ok_all &= bool(cond)

    rng = np.random.default_rng(0xC0FFEE)
    B, L, W = 8, 384, 128
    subst = np.where(np.eye(4, dtype=bool), 1.0, -1.0).astype(np.float32)
    ss = rng.integers(0, 4, (B, L), dtype=np.int8)
    ts = ss.copy()
    mask = rng.random((B, L)) < 0.15
    ts[mask] = (ts[mask] + 1 + rng.integers(0, 3, mask.sum())) % 4
    lens = jnp.asarray(np.full((B,), 350, np.int32))
    dmin = jnp.asarray(np.full((B,), -64, np.int32))
    w_eff = jnp.asarray(np.full((B,), 100, np.int32))
    args = (jnp.asarray(ss), jnp.asarray(ts), lens, lens, dmin)

    for name, fl in (("local", ModeFlags(local_start=True, local_end=True)),
                     ("global", ModeFlags()),
                     ("overlap", ModeFlags(free_start_edges=True,
                                           free_end_edges=True))):
        kw = dict(W=W, subst=subst, go=-2.0, ge=-1.0, flags=fl, w_eff=w_eff)
        ref = np.asarray(banded_dp(*args, **kw).score)
        row = np.asarray(banded_dp_pallas(*args, block_b=8, **kw).score)
        ad = np.asarray(banded_dp_pallas_ad(*args, block_b=8, **kw).score)
        check(f"row_kernel_vs_lax_{name}", np.allclose(ref, row, atol=1e-2),
              f"max|d|={np.abs(ref-row).max():.2g}")
        check(f"ad_kernel_vs_lax_{name}", np.allclose(ref, ad, atol=1e-2),
              f"max|d|={np.abs(ref-ad).max():.2g}")

    # dirs parity: kernel bytes walk to the lax engine's transcripts
    fl = ModeFlags(local_start=True, local_end=True)
    kw = dict(W=W, subst=subst, go=-2.0, ge=-1.0, flags=fl, w_eff=w_eff)
    ref = banded_dp(*args, with_dirs=True, **kw)
    got = banded_dp_pallas(*args, block_b=8, with_dirs=True, **kw)
    dirs_ok = True
    for b in range(B):
        tx_l, i_l, j_l = traceback_path(
            np.asarray(ref.dirs[b]), ss[b], ts[b],
            int(ref.end_i[b]), int(ref.end_j[b]),
            banded=True, dmax=int(dmin[b]) + W - 1, flags=fl)
        tx_p, i_p, j_p = traceback_path(
            np.asarray(got.dirs[b]), ss[b], ts[b],
            int(got.end_i[b]), int(got.end_j[b]),
            banded=True, dmax=int(dmin[b]) + W - 1, flags=fl)
        dirs_ok &= (tx_l, i_l, j_l) == (tx_p, i_p, j_p)
    check("dirs_traceback_parity", dirs_ok)

    # AD-kernel dirs: antidiagonal-layout bytes walked by the native AD
    # tracer must rescore to exactly the kernel's DP score
    from biseqt_tpu import native

    def rescore(ops, s, t, si, sj):
        sc, i, j, prev = 0.0, si, sj, None
        for op in ops:
            if op in "MS":
                sc += subst[s[i], t[j]]
                i += 1
                j += 1
            elif op == "I":
                sc += -1.0 + (-2.0 if prev != "I" else 0.0)
                j += 1
            else:
                sc += -1.0 + (-2.0 if prev != "D" else 0.0)
                i += 1
            prev = op
        return sc

    ad_dirs_ok = True
    for mname, fl in (("local", ModeFlags(local_start=True, local_end=True)),
                      ("global", ModeFlags()),
                      ("overlap", ModeFlags(free_start_edges=True,
                                            free_end_edges=True))):
        kw = dict(W=W, subst=subst, go=-2.0, ge=-1.0, flags=fl,
                  w_eff=w_eff)
        res = banded_dp_pallas_ad(*args, block_b=8, with_dirs=True, **kw)
        sc = np.asarray(res.score)
        from biseqt_tpu.ops.pallas_dp_ad import parity_adjusted_dmin

        dminq = parity_adjusted_dmin(
            np.asarray(dmin), np.arange(B, dtype=np.int32) % 2
        )
        ops_l, si_l, sj_l = native.traceback_batch_ad(
            np.asarray(res.dirs), dminq, ss, ts,
            np.asarray(lens), np.asarray(lens),
            np.asarray(res.end_i), np.asarray(res.end_j), fl)
        for b in range(B):
            if sc[b] < -1e29:
                continue
            got = rescore(ops_l[b], ss[b], ts[b], si_l[b], sj_l[b])
            ad_dirs_ok &= abs(got - sc[b]) < 1e-2
    check("ad_dirs_rescore", ad_dirs_ok)

    # sorted all-vs-all on planted overlapping reads
    from biseqt_tpu.ops.allvsall_sorted import overlap_stats_sorted
    glen, rlen, n_reads = 2000, 600, 8
    genome = rng.integers(0, 4, glen, dtype=np.int8)
    reads = np.zeros((n_reads, 768), np.int8)
    step = (glen - rlen) // (n_reads - 1)
    for k in range(n_reads):
        r = genome[k * step:k * step + rlen].copy()
        m = rng.random(rlen) < 0.1
        r[m] = (r[m] + 1) % 4
        reads[k, :rlen] = r
    st = overlap_stats_sorted(
        jnp.asarray(reads), jnp.asarray(np.full((n_reads,), rlen, np.int32)),
        wordlen=8, n_reads=n_reads, bucket=32)
    s0 = np.asarray(st["s0"])
    check("sorted_allvsall_overlaps",
          all(s0[q, q + 1] > 25 for q in range(n_reads - 1))
          and s0[0, n_reads - 1] < 25)

    # quick throughput sanity (1 iteration, fresh inputs)
    Bb, Lb, BW = 2048, 10240, 100
    rr = np.random.default_rng(int(time.time()))
    bargs = [jnp.asarray(x) for x in (
        rr.integers(0, 4, (Bb, Lb), dtype=np.int8),
        rr.integers(0, 4, (Bb, Lb), dtype=np.int8),
        np.full((Bb,), 10000, np.int32), np.full((Bb,), 10000, np.int32),
        np.full((Bb,), -(BW // 2), np.int32))]
    kwb = dict(W=128, subst=subst, go=-2.0, ge=-1.0,
               flags=ModeFlags(local_start=True, local_end=True),
               w_eff=jnp.full((Bb,), BW, jnp.int32), block_b=128)
    _ = np.asarray(banded_dp_pallas_ad(*bargs, **kwb).score)  # compile
    # FRESH contents for the timed run: the tunnel caches identical
    # executions, so re-timing the warmup inputs (even round-tripped
    # through numpy) can be served from the cache and measure nothing
    rr2 = np.random.default_rng(int(time.time()) ^ 0x5EED)
    bargs2 = [jnp.asarray(x) for x in (
        rr2.integers(0, 4, (Bb, Lb), dtype=np.int8),
        rr2.integers(0, 4, (Bb, Lb), dtype=np.int8),
        np.full((Bb,), 10000, np.int32), np.full((Bb,), 10000, np.int32),
        np.full((Bb,), -(BW // 2), np.int32))]
    jax.block_until_ready(bargs2)
    t0 = time.time()
    _ = np.asarray(banded_dp_pallas_ad(*bargs2, **kwb).score)
    gcups = Bb * 10000 * BW / (time.time() - t0) / 1e9
    # one SERIALIZED launch (a single ~32 ms dispatch floor rides on
    # ~70 ms of compute) measures ~0.6-0.7x the pipelined 58-GCUPS
    # headline; the bar catches a silent 2x hardware/toolchain
    # regression without flaking on the tunnel's run-to-run variance
    check("ad_kernel_throughput", gcups > 30, f"{gcups:.1f} GCUPS")
    out["gcups_quick"] = round(gcups, 1)

    # transcript-mode launch at bench-like scale: nibble-packed dirs
    # plane streamed to HBM, D2H'd, walked by the C++ AD tracer.  The
    # gate is deliberately loose — this environment's tunnel D2H
    # (~GB/s) dominates the end-to-end time — but it catches the plane
    # going missing, the walk erroring, or a 10x kernel-side regression.
    Bt = 512
    rr3 = np.random.default_rng(int(time.time()) ^ 0xD1B5)
    targs = [jnp.asarray(x) for x in (
        rr3.integers(0, 4, (Bt, Lb), dtype=np.int8),
        rr3.integers(0, 4, (Bt, Lb), dtype=np.int8),
        np.full((Bt,), 10000, np.int32), np.full((Bt,), 10000, np.int32),
        np.full((Bt,), -(BW // 2), np.int32))]
    kwt = dict(kwb)
    kwt["w_eff"] = jnp.full((Bt,), BW, jnp.int32)
    kwt["block_b"] = 128
    from biseqt_tpu.ops.pallas_walk import traceback_sweep

    dminq_t = parity_adjusted_dmin(
        np.full((Bt,), -(BW // 2), np.int32),
        np.arange(Bt, dtype=np.int32) % 2,
    )
    rest = banded_dp_pallas_ad(*targs, with_dirs=True, **kwt)
    _ = np.asarray(rest.score)  # compile
    _ = np.asarray(traceback_sweep(       # compile the sweep walker too
        rest.dirs, jnp.asarray(dminq_t), rest.end_i.astype(jnp.int32),
        rest.end_j.astype(jnp.int32), W=128)[0])
    rr4 = np.random.default_rng(int(time.time()) ^ 0xFADE)
    targs2 = [jnp.asarray(x) for x in (
        rr4.integers(0, 4, (Bt, Lb), dtype=np.int8),
        rr4.integers(0, 4, (Bt, Lb), dtype=np.int8),
        np.full((Bt,), 10000, np.int32), np.full((Bt,), 10000, np.int32),
        np.full((Bt,), -(BW // 2), np.int32))]
    jax.block_until_ready(targs2)
    t0 = time.time()
    rest = banded_dp_pallas_ad(*targs2, with_dirs=True, **kwt)
    dirs_h = np.asarray(rest.dirs)
    opst, _, _ = native.traceback_batch_ad(
        dirs_h, dminq_t, np.asarray(targs2[0]), np.asarray(targs2[1]),
        np.full((Bt,), 10000, np.int32), np.full((Bt,), 10000, np.int32),
        np.asarray(rest.end_i), np.asarray(rest.end_j),
        ModeFlags(local_start=True, local_end=True))
    gcups_tx = Bt * 10000 * BW / (time.time() - t0) / 1e9
    # the dirs-D2H host walk is the LEGACY transcript path (the device
    # sweep below is the product path): correctness-gated only — its
    # end-to-end rate is this environment's ~20 MB/s tunnel D2H, not a
    # kernel property (production PCIe is ~500x faster)
    check("ad_dirs_hostwalk",
          sum(len(o) for o in opst) > 0,
          f"{gcups_tx:.2f} GCUPS end-to-end transcripts (tunnel D2H)")
    out["gcups_transcripts"] = round(gcups_tx, 2)

    # on-device sweep walk: transcripts must match the C++ walker byte
    # for byte on the same dirs planes, and the end-to-end path (kernel
    # + sweep + trace D2H + compaction) must clear a bar the dirs-D2H
    # path cannot (it measures ~0.03 GCUPS through this tunnel)
    # correctness on the SAME planes as the C++ walker above
    tr0, tr1, fi, fj = traceback_sweep(
        rest.dirs, jnp.asarray(dminq_t), rest.end_i.astype(jnp.int32),
        rest.end_j.astype(jnp.int32), W=128)
    ops_dev, si_dev, sj_dev = native.compact_sweep_ops(
        np.asarray(tr0), np.asarray(tr1), np.asarray(fi), np.asarray(fj),
        np.asarray(targs2[0]), np.asarray(targs2[1]),
        ModeFlags(local_start=True, local_end=True))
    check("device_walk_transcripts", list(ops_dev) == list(opst))
    # lane-packed walk (round 5, the bench's production path): same
    # planes, byte-identical transcripts through the fused output +
    # column-major compactor
    from biseqt_tpu.ops.pallas_walk import (traceback_sweep_t_fused,
                                            split_sweep_t_fused)
    fused_t = traceback_sweep_t_fused(
        rest.dirs, jnp.asarray(dminq_t), rest.end_i.astype(jnp.int32),
        rest.end_j.astype(jnp.int32), W=128)
    tr_t, fi_t, fj_t = split_sweep_t_fused(np.asarray(fused_t), Bt)
    ops_t, _, _ = native.compact_sweep_ops_t(
        tr_t, fi_t, fj_t, np.asarray(targs2[0]), np.asarray(targs2[1]),
        ModeFlags(local_start=True, local_end=True))
    check("lane_packed_walk_transcripts", list(ops_t) == list(opst))
    # throughput on FRESH inputs (the tunnel caches identical launches)
    rr5 = np.random.default_rng(int(time.time()) ^ 0xBEEF)
    targs3 = [jnp.asarray(x) for x in (
        rr5.integers(0, 4, (Bt, Lb), dtype=np.int8),
        rr5.integers(0, 4, (Bt, Lb), dtype=np.int8),
        np.full((Bt,), 10000, np.int32), np.full((Bt,), 10000, np.int32),
        np.full((Bt,), -(BW // 2), np.int32))]
    # chars on host OUTSIDE the timed region (they were born on host;
    # timing their D2H would charge the walk for a 10 MB transfer no
    # real flow pays — and make this number incomparable with
    # walk_probe's identically-named metric)
    hs3, ht3 = np.asarray(targs3[0]), np.asarray(targs3[1])
    jax.block_until_ready(targs3)
    t0 = time.time()
    rest2 = banded_dp_pallas_ad(*targs3, with_dirs=True, **kwt)
    tr0, tr1, fi, fj = traceback_sweep(
        rest2.dirs, jnp.asarray(dminq_t), rest2.end_i.astype(jnp.int32),
        rest2.end_j.astype(jnp.int32), W=128)
    ops_dev2, _, _ = native.compact_sweep_ops(
        np.asarray(tr0), np.asarray(tr1), np.asarray(fi), np.asarray(fj),
        hs3, ht3, ModeFlags(local_start=True, local_end=True))
    gcups_dw = Bt * 10000 * BW / (time.time() - t0) / 1e9
    # bar: ~17x the dirs-D2H host-walk path (measured 0.03); kept well
    # under the 1.3-4.0 GCUPS observed range because the tunnel's D2H
    # rate swings 2-3x run to run
    check("device_walk_throughput", gcups_dw > 0.5,
          f"{gcups_dw:.1f} GCUPS")
    out["gcups_transcripts_device_walk"] = round(gcups_dw, 2)

    out["ok"] = ok_all
    out["elapsed_s"] = round(time.time() - t_start, 1)
    print(json.dumps(out))
    return 0 if ok_all else 1


if __name__ == "__main__":
    sys.exit(main())
