"""Dirs-body census probe (VERDICT r3 #1): strip-run attribution of the
with_dirs extras in the AD kernel, plus sweep-walk kernel timing.

Strip codes (diagnostics only — bytes are wrong under 10-14; 14 skips
the dirs DMA so its HBM plane is never written):
  10 no e4/f8 gap-extend flags (2 cmp+where + 2 rolls saved)
  11 no H-source select chain (2 cmp + 2 selects saved)
  12 no nibble pack / dbuf store / dirs DMA
  13 no per-lane step-of-max (Aa/Ab)
  14 pack + dbuf store but no dirs DMA (splits 12's attribution
     between the VMEM store and the HBM write-out)

Usage: python experiments/dirs_probe.py [--quick]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from biseqt_tpu.ops.banded_dp import ModeFlags
    from biseqt_tpu.ops.pallas_dp_ad import (banded_dp_pallas_ad,
                                             parity_adjusted_dmin)
    from biseqt_tpu.ops.pallas_walk import traceback_sweep

    B, L, BW, W = (256, 2560, 100, 128) if args.quick else (1024, 10240,
                                                            100, 128)
    subst = np.where(np.eye(4, dtype=bool), 1.0, -1.0).astype(np.float32)
    flags = ModeFlags(local_start=True, local_end=True)
    cells = B * (L - 240) * BW

    def mkargs(seed):
        rr = np.random.default_rng(seed * 9_000_011 + 3)
        return [jnp.asarray(x) for x in (
            rr.integers(0, 4, (B, L), dtype=np.int8),
            rr.integers(0, 4, (B, L), dtype=np.int8),
            np.full((B,), L - 240, np.int32),
            np.full((B,), L - 240, np.int32),
            np.full((B,), -(BW // 2), np.int32),
        )]

    w_eff = jnp.full((B,), BW, jnp.int32)

    def timed(fn, tag):
        _ = np.asarray(fn(mkargs(0)))          # compile
        sets = [mkargs(k + 1) for k in range(args.reps)]
        for a in sets:
            jax.block_until_ready(a)
        t0 = time.time()
        outs = [fn(a) for a in sets]
        for o in outs:
            _ = np.asarray(o)
        dt = (time.time() - t0) / args.reps
        print(json.dumps({
            "variant": tag, "ms": round(dt * 1e3, 1),
            "gcups": round(cells / dt / 1e9, 2),
        }))
        return dt

    def dp(with_dirs, strip=0, block_b=128):
        def fn(a):
            return banded_dp_pallas_ad(
                *a, w_eff=w_eff, W=W, subst=subst, go=-2.0, ge=-1.0,
                flags=flags, block_b=block_b, with_dirs=with_dirs,
                _strip=strip,
            ).score
        return fn

    timed(dp(False), "score_only")
    t_full = timed(dp(True), "dirs_full")
    timed(dp(True, strip=10), "dirs_no_e4f8")
    timed(dp(True, strip=11), "dirs_no_dselect")
    timed(dp(True, strip=12), "dirs_no_pack_store_dma")
    timed(dp(True, strip=13), "dirs_no_stepofmax")
    timed(dp(True, block_b=64), "dirs_full_bb64")
    timed(dp(True, block_b=256), "dirs_full_bb256")

    # sweep-walk kernel alone (consumes a fresh dirs plane per rep)
    dminq = jnp.asarray(parity_adjusted_dmin(
        np.full((B,), -(BW // 2), np.int32),
        np.arange(B, dtype=np.int32) % 2,
    ))

    for wb in (32, 64, 128):
        def walkfn(a, wb=wb):
            r = banded_dp_pallas_ad(
                *a, w_eff=w_eff, W=W, subst=subst, go=-2.0, ge=-1.0,
                flags=flags, block_b=128, with_dirs=True,
            )
            tr0, tr1, fi, fj = traceback_sweep(
                r.dirs, dminq, r.end_i.astype(jnp.int32),
                r.end_j.astype(jnp.int32), W=W, block_b=wb,
            )
            return fi
        dt_w = timed(walkfn, "dp_dirs_plus_walk_bb%d" % wb)
        print(json.dumps({
            "variant": "walk_only_bb%d" % wb,
            "ms": round((dt_w - t_full) * 1e3, 1),
        }))


if __name__ == "__main__":
    main()
