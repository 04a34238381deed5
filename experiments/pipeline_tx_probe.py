"""Pipeline-level transcript throughput (the extend_segments API).

Measures the production transcript route of ``pipeline.extend_segments``
— fused DP + on-device walk + host compaction, lane-packed vs sublane
walk — on a read-batch workload wide enough to trigger the lane-packed
gate (>= 128 pairs per launch).  This is the API-layer counterpart of
bench.py's kernel-level transcript legs: everything the user pays is in
the timed region (launch grouping, padding, walk, trace D2H, C++
compaction, scatter-back), minus sequence construction.

Segments are hand-constructed (one diagonal band per planted core), so
the probe isolates extension from Word-Blot discovery; homologous pairs
at 10% substitutions, like the bench (random pairs' local alignments
are trivially short and understate the compaction leg).

Reference contract: pwlib dptable solve + traceback via pw.Aligner
(SURVEY.md pw.py — Aligner.solve/traceback), served here by one
batched call.

Usage: python experiments/pipeline_tx_probe.py [--n 512] [--len 2000]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_workload(n, core_len, rng):
    """n homologous cores planted back-to-back on the main diagonal."""
    from biseqt_tpu.sequence import Alphabet, Sequence

    A4 = Alphabet("ACGT")
    ss = rng.integers(0, 4, (n, core_len), dtype=np.int8)
    ts = ss.copy()
    m = rng.random((n, core_len)) < 0.1
    ts[m] = (ts[m] + rng.integers(1, 4, int(m.sum()))) % 4
    S = Sequence(A4, ss.reshape(-1))
    T = Sequence(A4, ts.reshape(-1))
    segments = []
    for k in range(n):
        a0 = 2 * k * core_len
        segments.append({
            "segment": ((-40, 40), (a0, a0 + 2 * core_len)),
            "p": 0.9,
        })
    return S, T, segments


def run_once(S, T, segments, lane_min, subst):
    import biseqt_tpu.pipeline as pipeline_mod

    old = pipeline_mod._LANE_WALK_MIN_B2
    pipeline_mod._LANE_WALK_MIN_B2 = lane_min
    try:
        t0 = time.time()
        out = pipeline_mod.extend_segments(
            S, T, segments, subst=subst, go_score=-2.0, ge_score=-1.0,
            use_pallas=True, with_transcripts=True, pad_radius=16,
        )
        dt = time.time() - t0
    finally:
        pipeline_mod._LANE_WALK_MIN_B2 = old
    cells = sum(seg["band_cells"] for seg in out)
    n_ops = sum(len(seg["transcript"]) for seg in out)
    assert n_ops > 0
    return dt, cells, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--len", type=int, dest="core_len", default=2000)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    subst = np.where(np.eye(4, dtype=bool), 1.0, -1.0).astype(np.float32)
    rng = np.random.default_rng(11)

    # the lane_packed label must actually fire the lane-packed gate
    # (b2 >= lane_min AND W % 128 == 0), or both legs silently measure
    # the sublane walk and the comparison is vacuous
    from biseqt_tpu.pipeline import _bucket
    n_pad = _bucket(args.n, mini=2)
    assert (n_pad + 1) // 2 >= 64, (
        "--n %d too narrow for the lane-packed gate (needs >= 127 "
        "pairs after batch bucketing)" % args.n)

    out = {"metric": "pipeline_transcripts",
           "n_segments": args.n, "core_len": args.core_len}
    # the two walks must agree EXACTLY on a shared workload (same dirs
    # plane, same step semantics) — checked on the first rep's content
    rng_chk = np.random.default_rng(99)
    S0, T0, seg0 = build_workload(args.n, args.core_len, rng_chk)
    results0 = {}
    for label, lane_min in (("lane_packed", 64), ("sublane", 10 ** 9)):
        # warm call compiles the launch-shape variants; timed reps use
        # FRESH content (the tunnel caches identical executions)
        _, _, res0 = run_once(S0, T0, seg0, lane_min, subst)
        results0[label] = [
            (seg["transcript"], seg["score"], seg["origin_start"],
             seg["mutate_start"]) for seg in res0]
        rates = []
        for _ in range(args.reps):
            S, T, segments = build_workload(args.n, args.core_len, rng)
            dt, cells, res = run_once(S, T, segments, lane_min, subst)
            rates.append(round(cells / dt / 1e9, 2))
        out[label + "_gcups_runs"] = rates
        # median, not max: the tunnel's D2H swings run to run and one
        # lucky rep would overstate the routing ratio
        out[label + "_gcups"] = round(float(np.median(rates)), 2)
    assert results0["lane_packed"] == results0["sublane"], \
        "lane-packed and sublane pipeline walks disagree"
    out["walks_agree"] = True
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
