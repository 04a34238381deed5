"""Validate + time the on-device traceback sweep on the real chip.

Phase 1 (correctness): a small ragged batch through the AD kernel with
dirs, walked both ways — the device sweep's transcripts must equal the
C++ walker's byte for byte.

Phase 2 (throughput): config-1 geometry (10 kbp pairs, bw 100).
Reports the kernel+walk pipeline time and the D2H volume both ways:
the sweep ships ~2 bytes per antidiagonal step per pair-row instead of
~W/2 — the transfer that dominated transcript-mode end-to-end.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from biseqt_tpu import native
from biseqt_tpu.ops.banded_dp import ModeFlags
from biseqt_tpu.ops.pallas_dp_ad import (banded_dp_pallas_ad,
                                         parity_adjusted_dmin)
from biseqt_tpu.ops.pallas_walk import traceback_sweep

FLAGS = ModeFlags(local_start=True, local_end=True)
SUBST = np.where(np.eye(4, dtype=bool), 1.0, -1.0).astype(np.float32)


def correctness(rng):
    B, L = 64, 1500
    ss = rng.integers(0, 4, (B, L)).astype(np.int8)
    ts = ss.copy()
    m = rng.random((B, L)) < 0.12
    ts[m] = (ts[m] + 1 + rng.integers(0, 3, m.sum())) % 4
    s_lens = rng.integers(L - 200, L + 1, B).astype(np.int32)
    t_lens = rng.integers(L - 200, L + 1, B).astype(np.int32)
    dmin = rng.integers(-80, -20, B).astype(np.int32)
    w_eff = np.full(B, 120, np.int32)
    kw = dict(W=128, subst=SUBST, go=-2.0, ge=-1.0, flags=FLAGS,
              w_eff=jnp.asarray(w_eff))
    res = banded_dp_pallas_ad(
        jnp.asarray(ss), jnp.asarray(ts), jnp.asarray(s_lens),
        jnp.asarray(t_lens), jnp.asarray(dmin), with_dirs=True,
        block_b=32, **kw)
    dminq = parity_adjusted_dmin(dmin, np.arange(B, dtype=np.int32) % 2)
    end_i = np.asarray(res.end_i).astype(np.int32)
    end_j = np.asarray(res.end_j).astype(np.int32)
    ref_ops, ref_si, ref_sj = native.traceback_batch_ad(
        np.asarray(res.dirs), dminq, ss, ts, s_lens, t_lens,
        end_i, end_j, FLAGS)
    tr0, tr1, fi, fj = traceback_sweep(
        res.dirs, jnp.asarray(dminq), jnp.asarray(end_i),
        jnp.asarray(end_j), W=128, block_b=32)
    got_ops, got_si, got_sj = native.compact_sweep_ops(
        np.asarray(tr0), np.asarray(tr1), np.asarray(fi), np.asarray(fj),
        ss, ts, FLAGS)
    n_bad = sum(1 for b in range(B) if got_ops[b] != ref_ops[b]
                or got_si[b] != ref_si[b] or got_sj[b] != ref_sj[b])
    print(json.dumps({"phase": "correctness", "pairs": B,
                      "mismatches": n_bad}), flush=True)
    return n_bad == 0


def throughput(rng, B=1024, L=10240, BW=100, n=2):
    kw = dict(W=128, subst=SUBST, go=-2.0, ge=-1.0, flags=FLAGS,
              block_b=128)
    w_eff = jnp.full((B,), BW, jnp.int32)
    dmin_np = np.full((B,), -(BW // 2), np.int32)
    dminq = parity_adjusted_dmin(dmin_np, np.arange(B, dtype=np.int32) % 2)
    dminq_j = jnp.asarray(dminq)

    def mkargs(seed):
        # distinct seed formula from bench.py's: identical contents at
        # identical shapes would be identical EXECUTIONS, and the
        # tunnel's cache can persist across processes in a session
        rr = np.random.default_rng(seed * 9_000_013 + 4242)
        return [jnp.asarray(x) for x in (
            rr.integers(0, 4, (B, L), dtype=np.int8),
            rr.integers(0, 4, (B, L), dtype=np.int8),
            np.full((B,), 10000, np.int32),
            np.full((B,), 10000, np.int32),
            dmin_np,
        )]

    def launch(a):
        res = banded_dp_pallas_ad(*a, w_eff=w_eff, with_dirs=True, **kw)
        tr0, tr1, fi, fj = traceback_sweep(
            res.dirs, dminq_j, res.end_i.astype(jnp.int32),
            res.end_j.astype(jnp.int32), W=128)
        return res, tr0, tr1, fi, fj

    warm = launch(mkargs(0))
    _ = np.asarray(warm[1])   # real completion: block_until_ready
    # returns early through the tunnel

    argsets = [mkargs(k + 1) for k in range(n)]
    for a in argsets:
        jax.block_until_ready(a)
    t0 = time.time()
    outs = [launch(a) for a in argsets]
    hs = [(np.asarray(o[1]), np.asarray(o[2]), np.asarray(o[3]),
           np.asarray(o[4])) for o in outs]
    dt_dev = (time.time() - t0) / n

    res, _, _, _, _ = outs[-1]
    tr0_h, tr1_h, fi_h, fj_h = hs[-1]
    a = argsets[-1]
    ss, ts = np.asarray(a[0]), np.asarray(a[1])
    t0 = time.time()
    opss, _, _ = native.compact_sweep_ops(
        tr0_h, tr1_h, fi_h, fj_h, ss, ts, FLAGS)
    dt_compact = time.time() - t0
    assert sum(len(o) for o in opss) > 0
    gcups = B * 10000 * BW / (dt_dev + dt_compact) / 1e9
    d2h_bytes = tr0_h.nbytes + tr1_h.nbytes
    dirs_bytes = int(np.asarray(res.dirs.shape).prod())
    print(json.dumps({
        "phase": "throughput",
        "gcups_transcripts_device_walk": round(gcups, 2),
        "s_per_batch_device": round(dt_dev, 3),
        "compact_s": round(dt_compact, 3),
        "trace_d2h_mb": round(d2h_bytes / 1e6, 1),
        "dirs_plane_mb": round(dirs_bytes / 1e6, 1),
    }), flush=True)


def main():
    rng = np.random.default_rng(0)
    ok = correctness(rng)
    if not ok:
        print(json.dumps({"error": "transcript mismatch"}))
        sys.exit(1)
    throughput(rng)


if __name__ == "__main__":
    main()
