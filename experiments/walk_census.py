"""Sweep-walk kernel census (round 4): strip-run attribution.

The round-4 dirs probe showed the WALK (75 ms at bb64) costs ~2x the DP
kernel with dirs (40 ms) at bench shapes — the transcript path's device
bottleneck.  Strips (garbage walks, timing only):
  20 no trace accumulation (sel/where/adds)
  21 single-parity walk
  22 no one-hot byte extraction
  23 no scalar walker-state logic

Usage: python experiments/walk_census.py
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
    from biseqt_tpu.ops.pallas_dp_ad import (banded_dp_pallas_ad,
                                             parity_adjusted_dmin)
    from biseqt_tpu.ops.pallas_walk import traceback_sweep

    B, L, BW, W = 1024, 10240, 100, 128
    subst = np.where(np.eye(4, dtype=bool), 1.0, -1.0).astype(np.float32)
    flags = ModeFlags(local_start=True, local_end=True)
    dminq = jnp.asarray(parity_adjusted_dmin(
        np.full((B,), -(BW // 2), np.int32),
        np.arange(B, dtype=np.int32) % 2,
    ))

    def mkargs(seed):
        rr = np.random.default_rng(seed * 11_000_003 + 7)
        return [jnp.asarray(x) for x in (
            rr.integers(0, 4, (B, L), dtype=np.int8),
            rr.integers(0, 4, (B, L), dtype=np.int8),
            np.full((B,), L - 240, np.int32),
            np.full((B,), L - 240, np.int32),
            np.full((B,), -(BW // 2), np.int32),
        )]

    w_eff = jnp.full((B,), BW, jnp.int32)

    # one dirs plane reused as walk input; walk inputs vary via end
    # cells so the tunnel's identical-execution cache cannot serve them
    def mkplane(seed):
        r = banded_dp_pallas_ad(
            *mkargs(seed), w_eff=w_eff, W=W, subst=subst, go=-2.0,
            ge=-1.0, flags=flags, block_b=128, with_dirs=True,
        )
        return (r.dirs.block_until_ready(),
                r.end_i.astype(jnp.int32), r.end_j.astype(jnp.int32))

    planes = [mkplane(k) for k in range(3)]

    def timed(fn, tag, reps=2):
        _ = np.asarray(fn(*planes[0]))   # compile
        t0 = time.time()
        outs = [fn(*planes[k + 1]) for k in range(reps)]
        for o in outs:
            _ = np.asarray(o)
        dt = (time.time() - t0) / reps
        print(json.dumps({"variant": tag, "ms": round(dt * 1e3, 1)}))
        return dt

    def walk(strip=0, bb=64, rr=64):
        def fn(dirs, ei, ej):
            return traceback_sweep(dirs, dminq, ei, ej, W=W, block_b=bb,
                                   r_rows=rr, _strip=strip)[3]
        return fn

    timed(walk(), "walk_full_bb64")
    timed(walk(strip=20), "walk_no_trace_acc")
    timed(walk(strip=21), "walk_single_parity")
    timed(walk(strip=22), "walk_no_extract")
    timed(walk(strip=23), "walk_no_scalar_logic")
    timed(walk(rr=32), "walk_full_rr32")
    timed(walk(rr=128), "walk_full_rr128")


if __name__ == "__main__":
    main()
