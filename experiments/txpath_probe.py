"""Decompose the bench's transcript device leg at Bd=2048.

Times, with fresh inputs per run and device-side completion forcing:
  a. input residency forcing alone (is H2D hiding in the timed region?)
  b. DP with dirs, single dispatch
  c. DP + lane-packed fused walk, ONE jitted dispatch (bench launch_tx)
  d. same as (c) but two separate jit calls (pre-round-5 structure)

Usage: python experiments/txpath_probe.py [--quick]
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

from biseqt_tpu.ops.banded_dp import ModeFlags
from biseqt_tpu.ops.pallas_dp_ad import (banded_dp_pallas_ad,
                                         parity_adjusted_dmin)
from biseqt_tpu.ops.pallas_walk import traceback_sweep_t_fused


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--B", type=int, default=2048)
    args = ap.parse_args()
    B, L, BW, W = args.B, 10240, 100, 128
    if args.quick:
        B, L = 256, 2048
    flags = ModeFlags(local_start=True, local_end=True)
    subst = np.where(np.eye(4, dtype=bool), 1.0, -1.0).astype(np.float32)
    kw = dict(W=W, subst=subst, go=-2.0, ge=-1.0, flags=flags,
              block_b=128)
    w_eff = jnp.full((B,), BW, jnp.int32)
    lens = np.full((B,), L - 240, np.int32)
    dminq = jnp.asarray(parity_adjusted_dmin(
        np.full((B,), -(BW // 2), np.int32),
        np.arange(B, dtype=np.int32) % 2))

    def mkargs(seed):
        rr = np.random.default_rng(seed * 7_000_003 + 5)
        ss = rr.integers(0, 4, (B, L), dtype=np.int8)
        ts = ss.copy()
        m = rr.random((B, L)) < 0.1
        ts[m] = (ts[m] + rr.integers(1, 4, int(m.sum()))) % 4
        return [jnp.asarray(x) for x in (
            ss, ts, lens, lens,
            np.full((B,), -(BW // 2), np.int32))]

    @jax.jit
    def force_resident(a0, a1):
        return jnp.ravel(a0)[:2].astype(jnp.int32).sum() + \
            jnp.ravel(a1)[:2].astype(jnp.int32).sum()

    @jax.jit
    def tx_fused(ss_, ts_, sl_, tl_, dm_):
        r = banded_dp_pallas_ad(ss_, ts_, sl_, tl_, dm_, w_eff=w_eff,
                                with_dirs=True, **kw)
        return traceback_sweep_t_fused(
            r.dirs, dminq, r.end_i.astype(jnp.int32),
            r.end_j.astype(jnp.int32), W=W)

    def tx_two_calls(a):
        r = banded_dp_pallas_ad(*a, w_eff=w_eff, with_dirs=True, **kw)
        return traceback_sweep_t_fused(
            r.dirs, dminq, r.end_i.astype(jnp.int32),
            r.end_j.astype(jnp.int32), W=W)

    out = {"B": B, "L": L}
    seed_box = [100]

    def timeit(fn, label, n=3, pre_resident=True):
        a = mkargs(99)
        try:
            r = fn(a)
            _ = np.asarray(jnp.ravel(jax.tree_util.tree_leaves(r)[0])[:4])
        except Exception as e:
            out[label] = "FAILED: " + str(e)[:200]
            print(label, out[label][:200])
            return
        ts_ = []
        for _ in range(n):
            seed_box[0] += 1
            a = mkargs(seed_box[0])
            if pre_resident:
                _ = np.asarray(force_resident(a[0], a[1]))
            t0 = time.perf_counter()
            r = fn(a)
            _ = np.asarray(jnp.ravel(jax.tree_util.tree_leaves(r)[0])[:4])
            ts_.append(time.perf_counter() - t0)
        out[label + "_ms"] = round(min(ts_) * 1e3, 1)
        out[label + "_ms_runs"] = [round(t * 1e3, 1) for t in ts_]
        print(label, out[label + "_ms"], "ms", out[label + "_ms_runs"])

    # a. H2D residency forcing measured alone (fresh arrays, not forced
    # before the timer): how much H2D was the old leg hiding?
    ts_ = []
    for k in range(3):
        a = mkargs(1000 + k)
        t0 = time.perf_counter()
        _ = np.asarray(force_resident(a[0], a[1]))
        ts_.append(time.perf_counter() - t0)
    out["h2d_force_ms_runs"] = [round(t * 1e3, 1) for t in ts_]
    print("h2d_force", out["h2d_force_ms_runs"])

    # b. DP with dirs alone
    timeit(lambda a: banded_dp_pallas_ad(
        *a, w_eff=w_eff, with_dirs=True, **kw).score, "dp_dirs")

    # c. fused single-dispatch DP+walk
    timeit(lambda a: tx_fused(*a), "dp_walk_fused")

    # d. two-call chain
    timeit(tx_two_calls, "dp_walk_two_calls")

    print(json.dumps(out))


if __name__ == "__main__":
    main()
