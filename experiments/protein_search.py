"""BASELINE config 7p: end-to-end two-tier protein search on the chip.

Workload: B query x ref banded local alignments of 1 kb-residue protein
pairs under BLOSUM62 (go=-11, ge=-1, band 100) — the reference served
this through the same ``pw.Aligner`` contract at full scalar speed
(``pwlib — alnscores`` takes any matrix).  The single-pass TPU kernel
runs A=20 at ~0.42x the uniform-DNA rate (packed planes, 5/step);
the two-tier path (biseqt_tpu/protein.py) filters under Dayhoff-6
(2 planes) and rescores survivors under full BLOSUM62, recovering
effective throughput.

Planted truth: 10% of pairs are homologs (25% residue substitutions);
the rest are unrelated.  Reported: filter/full/two-tier GCUPS,
effective-vs-full-only speedup, survivor fraction, homolog recall, and
exact-score agreement of the rescore tier with a full-only run.

Usage: python experiments/protein_search.py [--quick] [--murphy10]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bench import steady_runs
from biseqt_tpu.matrices import (BLOSUM62, DAYHOFF6_GROUPS,
                                 MURPHY4_GROUPS, MURPHY10_GROUPS,
                                 reduced_matrix, compression_map)
from biseqt_tpu.ops.banded_dp import ModeFlags
from biseqt_tpu.ops.pallas_dp_ad import banded_dp_pallas_ad
from biseqt_tpu.protein import (_bucket_up, compress_codes,
                                null_threshold, two_tier_scores)

# bench.py's uniform-DNA headline under the SAME steady-state-median
# convention (round 5: 64.9, runs 61.9-66.6) — the denominator of
# eff_vs_uniform_dna.  Update when the bench headline moves.
UNIFORM_DNA_STEADY = 64.9


def mk_batch(rng, B, L, hom_frac=0.1, sub_rate=0.25):
    ss = rng.integers(0, 20, (B, L), dtype=np.int8)
    ts = rng.integers(0, 20, (B, L), dtype=np.int8)
    n_hom = int(B * hom_frac)
    hom = rng.permutation(B)[:n_hom]
    ts[hom] = ss[hom]
    m = rng.random((n_hom, L)) < sub_rate
    ts[hom] = np.where(
        m, rng.integers(0, 20, (n_hom, L), dtype=np.int8), ts[hom])
    is_hom = np.zeros(B, bool)
    is_hom[hom] = True
    return ss, ts, is_hom


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--murphy10", action="store_true")
    ap.add_argument("--murphy4", action="store_true")
    ap.add_argument("--B", type=int, default=16384)
    ap.add_argument("--L", type=int, default=2048)
    args = ap.parse_args()
    B, L = (1024, 512) if args.quick else (args.B, args.L)
    BW, W = 100, 128
    groups = (MURPHY4_GROUPS if args.murphy4
              else MURPHY10_GROUPS if args.murphy10
              else DAYHOFF6_GROUPS)
    go, ge = -11.0, -1.0
    flags = ModeFlags(local_start=True, local_end=True)
    lens = np.full((B,), L, np.int32)
    dmin = np.full((B,), -(BW // 2), np.int32)
    w_eff = np.full((B,), BW, np.int32)
    kw = dict(W=W, go=go, ge=ge, flags=flags)
    cells = B * L * BW
    rng = np.random.default_rng(11)

    def run_pallas(a, b, mat):
        A = int(np.asarray(mat).shape[0])
        # force packed planes for 4 < A < 8 exactly like the production
        # filter tier (protein.two_tier_scores) — the kernel's auto
        # choice would put Dayhoff-6 on the A^2 select chain and this
        # harness would time a path production never runs
        return banded_dp_pallas_ad(
            jnp.asarray(a), jnp.asarray(b), jnp.asarray(lens),
            jnp.asarray(lens), jnp.asarray(dmin), subst=mat, A=A,
            _subst_packed=True if 4 < A < 8 else None,
            w_eff=jnp.asarray(w_eff), block_b=128, **kw)

    # ---- null calibration (shuffled pairs, reduced tier) ----
    cmap = compression_map(groups)
    red = reduced_matrix(BLOSUM62, groups)
    ns, nt, _ = mk_batch(rng, B, L, hom_frac=0.0)
    null = run_pallas(compress_codes(ns, cmap), compress_codes(nt, cmap),
                      red)
    thr = null_threshold(np.asarray(null.score), margin=5.0)

    out = {"config": "7p", "B": B, "L": L, "BW": BW,
           "groups": ("murphy4" if args.murphy4
                      else "murphy10" if args.murphy10 else "dayhoff6"),
           "threshold": round(thr, 1)}

    # ---- timed legs: pipelined like bench.py (launch all, materialize
    # all) over PRE-STAGED device inputs.  Through this environment's
    # tunnel, lazy H2D (~70 MB/s) + per-group pipeline fill otherwise
    # dominate every leg (a first cut measured the filter "slower" than
    # the full pass — impossible on compute).  Reduced codes are
    # precomputed: production stores them at ingest (protein.reduce_seq
    # / a second DB column), not per query.  Each leg gets its OWN
    # batch set: the tunnel caches identical executions, so reusing the
    # filter leg's batches inside the two-tier leg would fake its
    # filter pass.
    n = 2 if args.quick else 4
    setA = [mk_batch(rng, B, L) for _ in range(n)]   # full-only leg
    setB = [mk_batch(rng, B, L) for _ in range(n)]   # filter leg
    setC = [mk_batch(rng, B, L) for _ in range(n)]   # two-tier leg
    warm = mk_batch(rng, B, L)   # never reused in timed loops

    def dev_full(s):
        return [(jnp.asarray(ss), jnp.asarray(ts)) for ss, ts, _ in s]

    def dev_red(s):
        return [(jnp.asarray(compress_codes(ss, cmap)),
                 jnp.asarray(compress_codes(ts, cmap)))
                for ss, ts, _ in s]

    devA, devB = dev_full(setA), dev_red(setB)
    devC_red, devC_full = dev_red(setC), dev_full(setC)
    for pair in devA + devB + devC_red + devC_full:  # force residency
        _ = np.asarray(jnp.ravel(pair[0])[:1].astype(jnp.int32)
                       + jnp.ravel(pair[1])[:1].astype(jnp.int32))

    def pipeline(pairs, mat):
        # steady-state median per-run delta, first delta (pipeline
        # fill) excluded — bench.py's shared accounting
        t0 = time.perf_counter()
        outs = [run_pallas(a, b, mat).score for a, b in pairs]
        scs, ts = [], []
        for o in outs:
            scs.append(np.asarray(o))
            ts.append(time.perf_counter())
        return scs, steady_runs(t0, ts, cells)[0]

    # full-matrix-only (what the single-pass kernel offers)
    _ = np.asarray(run_pallas(*warm[:2], BLOSUM62).score)  # compile
    _, dt_full = pipeline(devA, BLOSUM62)
    out["gcups_full_only"] = round(cells / dt_full / 1e9, 2)

    # filter tier alone (reduced alphabet, forced packed planes;
    # compile is warm from the null-calibration run)
    _, dt_filt = pipeline(devB, red)
    out["gcups_filter"] = round(cells / dt_filt / 1e9, 2)

    # two-tier end to end: pipelined filter -> host threshold ->
    # device row-gather of survivors -> pipelined rescore, ONE jitted
    # dispatch per rescore (gather + compacted DP fused)
    # the survivor bucket must match two_tier_scores' exactly (same
    # helper, same mini derivation from block_b=128) or the warm
    # compile below misses and api_matches drifts from the timed flow
    bucket_up = lambda m: _bucket_up(m, mini=min(2 * 128, max(B, 1)))

    @jax.jit
    def rescore_gather(a, b, idx):
        sa = jnp.take(a, idx, axis=0)
        sb = jnp.take(b, idx, axis=0)
        Sp = idx.shape[0]
        lp = jnp.full((Sp,), L, jnp.int32)
        return banded_dp_pallas_ad(
            sa, sb, lp, lp, jnp.full((Sp,), -(BW // 2), jnp.int32),
            subst=BLOSUM62, A=20, w_eff=jnp.full((Sp,), BW, jnp.int32),
            block_b=128, **kw).score

    # warm the expected survivor bucket (~10% of B, doubled buckets)
    Sp_exp = bucket_up(max(int(B * 0.1), 1))
    _ = np.asarray(rescore_gather(
        *[jnp.asarray(x) for x in warm[:2]],
        jnp.arange(Sp_exp, dtype=jnp.int32))[:1])

    t0 = time.perf_counter()
    fouts = [run_pallas(a, b, red).score for a, b in devC_red]
    tiers, routs, f_ts = [], [], []
    for k, o in enumerate(fouts):
        # interleave: batch k's rescore launches while batches k+1..n
        # are still filtering/materializing — the rescore dispatch cost
        # hides behind the filter stream instead of serializing after it
        sc = np.asarray(o)
        f_ts.append(time.perf_counter())
        idx = np.flatnonzero(sc >= thr).astype(np.int32)
        tiers.append((sc, idx))
        Sp = bucket_up(max(idx.size, 1))
        pad = np.concatenate(
            [idx, np.full((Sp - idx.size,), idx[0] if idx.size else 0,
                          np.int32)])
        routs.append(rescore_gather(*devC_full[k], jnp.asarray(pad)))
    resc, r_ts = [], []
    for o in routs:
        resc.append(np.asarray(o))
        r_ts.append(time.perf_counter())
    # steady-state per-batch cost = filter service + rescore service.
    # The device queue is FIFO: every rescore is enqueued BEHIND the
    # remaining filters, so deltas between the trailing rescore
    # materializations measure the rescore leg ALONE (timing only
    # those deltas once reported 132 GCUPS "effective" — 2x uniform,
    # i.e. faster than the filter itself, impossible); the filter
    # deltas (which also carry the host thresholding between
    # materializations) must be added back.
    dt_filt_leg = steady_runs(t0, f_ts, cells)[0]
    assert len(r_ts) >= 2   # n >= 2 always; diff needs two completions
    dt_resc_leg = float(np.median(np.diff(r_ts)))
    dt_tt = dt_filt_leg + dt_resc_leg
    out["gcups_two_tier"] = round(cells / dt_tt / 1e9, 2)
    out["speedup_vs_full_only"] = round(dt_full / dt_tt, 2)
    out["eff_vs_uniform_dna"] = round(
        (cells / dt_tt / 1e9) / UNIFORM_DNA_STEADY, 3)

    # ---- accuracy (on the two-tier leg's batches, untimed) ----
    fullC = [np.asarray(run_pallas(a, b, BLOSUM62).score)
             for a, b in devC_full]
    recalls, fracs, agree = [], [], True
    for (ss, ts, is_hom), fsc, (sc, idx), rs in zip(
            setC, fullC, tiers, resc):
        surv = sc >= thr
        recalls.append(surv[is_hom].mean())
        fracs.append(surv.mean())
        agree &= np.array_equal(rs[:idx.size], fsc[idx])
    out["homolog_recall"] = round(float(np.mean(recalls)), 4)
    out["survivor_frac"] = round(float(np.mean(fracs)), 4)
    out["rescore_exact"] = bool(agree)

    # the per-call API agrees with the inline pipelined flow
    res0 = two_tier_scores(
        setC[0][0], setC[0][1], lens, lens, dmin, w_eff=w_eff,
        threshold=thr, engine="pallas", groups=groups, **kw)
    out["api_matches"] = bool(
        np.array_equal(res0.survivor_idx, tiers[0][1])
        and np.array_equal(res0.full_scores[res0.survivor_idx],
                           resc[0][:tiers[0][1].size]))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
