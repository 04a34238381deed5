"""Dirs-body attribution at the BENCH batch (B=4096): the Bd=1024
census (dirs_probe.py) attributes only +6.7 ms to the with_dirs extras,
but bench leg (a) shows 70.5 -> ~127 ms at B=4096 — ~30 ms beyond the
linearly scaled extras.  This probe reruns the three decisive variants
at the bench's exact shapes to locate the superlinear term:

  score_only           the 58-GCUPS baseline
  dirs_full            the shipping with_dirs kernel
  dirs_no_pack (s12)   with_dirs minus nibble pack + dbuf store + DMA
                       (still allocates + returns the 2.7 GB plane)

If s12 ~= score_only: the pack/store/DMA is the whole gap (attack the
store path).  If s12 ~= dirs_full: the cost is the 2.7 GB output
allocation / dispatch, not the kernel body (attack buffer reuse).

Usage: python experiments/dirs_b4096_probe.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main():
    import jax
    import jax.numpy as jnp
    from biseqt_tpu.ops.banded_dp import ModeFlags
    from biseqt_tpu.ops.pallas_dp_ad import banded_dp_pallas_ad

    B, L, BW, W = 4096, 10240, 100, 128
    subst = np.where(np.eye(4, dtype=bool), 1.0, -1.0).astype(np.float32)
    flags = ModeFlags(local_start=True, local_end=True)
    cells = B * 10000 * BW

    def mkargs(seed):
        rr = np.random.default_rng(seed * 1_000_003 + 11)
        return [jnp.asarray(x) for x in (
            rr.integers(0, 4, (B, L), dtype=np.int8),
            rr.integers(0, 4, (B, L), dtype=np.int8),
            np.full((B,), 10000, np.int32),
            np.full((B,), 10000, np.int32),
            np.full((B,), -(BW // 2), np.int32),
        )]

    w_eff = jnp.full((B,), BW, jnp.int32)

    def timed(fn, tag, reps=2):
        _ = np.asarray(fn(mkargs(0)))          # compile
        sets = [mkargs(k + 1) for k in range(reps)]
        for a in sets:
            jax.block_until_ready(a)
        t0 = time.time()
        outs = [fn(a) for a in sets]
        for o in outs:
            _ = np.asarray(o)
        dt = (time.time() - t0) / reps
        print(json.dumps({
            "variant": tag, "ms": round(dt * 1e3, 1),
            "gcups": round(cells / dt / 1e9, 2),
        }), flush=True)
        return dt

    def dp(with_dirs, strip=0, r_chunk=128):
        def fn(a):
            return banded_dp_pallas_ad(
                *a, w_eff=w_eff, W=W, subst=subst, go=-2.0, ge=-1.0,
                flags=flags, block_b=128, with_dirs=with_dirs,
                _strip=strip, r_chunk=r_chunk,
            ).score
        return fn

    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="score,full,s12")
    args = ap.parse_args()
    v = set(args.variants.split(","))
    if "score" in v:
        timed(dp(False), "score_only")
    if "full" in v:
        timed(dp(True), "dirs_full")
    if "s12" in v:
        timed(dp(True, strip=12), "dirs_no_pack_store_dma")
    if "s14" in v:
        # strip 14: pack + dbuf store, but NO HBM DMA — splits the s12
        # attribution between the u8 VMEM store and the write-out
        timed(dp(True, strip=14), "dirs_store_no_dma")
    if "rc256" in v:
        timed(dp(True, r_chunk=256), "dirs_full_rc256")


if __name__ == "__main__":
    main()
