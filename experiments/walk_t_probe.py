"""Round-5 probe: lane-packed walk (traceback_sweep_t) vs the sublane
walk (traceback_sweep) on the real chip, census shape (1024 x 10 kbp,
W=128).

Includes the XLA plane transpose inside the new path's jit, so the
number is the honest end-to-end walk cost from the DP kernel's native
[Rp, B2, W] plane.

Usage: python experiments/walk_t_probe.py [--quick]
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
from biseqt_tpu.ops.pallas_walk import traceback_sweep, traceback_sweep_t
from biseqt_tpu import native


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--B", type=int, default=1024)
    ap.add_argument("--L", type=int, default=10240)
    ap.add_argument("--col-block", type=int, default=1024)
    ap.add_argument("--r-rows", type=int, default=32)
    args = ap.parse_args()
    B, L, BW, W = args.B, args.L, 100, 128
    if args.quick:
        B, L = 256, 2048

    rng = np.random.default_rng(7)
    ss = rng.integers(0, 4, (B, L), dtype=np.int8)
    ts = ss.copy()
    m = rng.random((B, L)) < 0.1
    ts[m] = (ts[m] + rng.integers(1, 4, int(m.sum()))) % 4
    lens = np.full((B,), L - 240, np.int32)
    dmin = np.full((B,), -(BW // 2), np.int32)
    subst = np.where(np.eye(4, dtype=bool), 1.0, -1.0).astype(np.float32)
    flags = ModeFlags(local_start=True, local_end=True)
    kw = dict(W=W, subst=subst, go=-2.0, ge=-1.0, flags=flags,
              w_eff=jnp.full((B,), BW, jnp.int32), block_b=128)

    res = banded_dp_pallas_ad(
        jnp.asarray(ss), jnp.asarray(ts), jnp.asarray(lens),
        jnp.asarray(lens), jnp.asarray(dmin), with_dirs=True, **kw)
    _ = np.asarray(res.score)
    dirs = res.dirs
    dminq = jnp.asarray(parity_adjusted_dmin(
        dmin, np.arange(B, dtype=np.int32) % 2))
    ei = res.end_i.astype(jnp.int32)
    ej = res.end_j.astype(jnp.int32)

    out = {"B": B, "L": L}

    def timeit(fn, label, n=4):
        """fn(k) — the tunnel CACHES identical executions, so every
        iteration must be a distinct computation (we perturb the end
        cells per k; same compiled shape, different operands)."""
        try:
            r = fn(0)
            jax.block_until_ready(r)
            first = r
        except Exception as e:
            out[label] = "FAILED: " + str(e)[:200]
            print(label, out[label][:200])
            return None
        ts_ = []
        for k in range(1, n + 1):
            t0 = time.perf_counter()
            r = fn(k)
            # force completion with a DEVICE-side 4-element slice: a
            # host np.asarray of the full leaf would charge the timing
            # for MBs of ~30 MB/s tunnel D2H (block_until_ready alone
            # returns early through the tunnel)
            leaf = jax.tree_util.tree_leaves(r)[0]
            _ = np.asarray(jnp.ravel(leaf)[:4])
            ts_.append(time.perf_counter() - t0)
        out[label + "_ms"] = round(min(ts_) * 1e3, 1)
        out[label + "_ms_runs"] = [round(t * 1e3, 1) for t in ts_]
        print(label, out[label + "_ms"], "ms", out[label + "_ms_runs"])
        return first

    def perturb(k):
        # shift end cells 0-3 rows up the same diagonal: fresh walks,
        # same shapes, still inside the band
        d = jnp.int32(k % 4)
        return jnp.maximum(ei - d, 0), jnp.maximum(ej - d, 0)

    # old sublane walk
    def old_fn(k):
        e1, e2 = perturb(k)
        return traceback_sweep(dirs, dminq, e1, e2, W=W)
    timeit(old_fn, "walk_old")

    # XLA transpose alone (informational; inside the new path's jit the
    # consumer is pallas and XLA may satisfy it by layout assignment)
    tf = jax.jit(lambda d, s: jnp.swapaxes(d, 1, 2) + s)
    timeit(lambda k: tf(dirs, jnp.uint8(k % 2)), "xla_transpose")

    # new lane-packed walk (includes the transpose)
    def new_fn(k):
        e1, e2 = perturb(k)
        return traceback_sweep_t(dirs, dminq, e1, e2, W=W,
                                 col_block=args.col_block,
                                 r_rows=args.r_rows)
    new = timeit(new_fn, "walk_new")

    # kernel-only: pre-transposed plane (isolates whatever the in-jit
    # transpose costs)
    dirs_t = jax.jit(lambda d: jnp.swapaxes(d, 1, 2))(dirs)
    jax.block_until_ready(dirs_t)

    def newt_fn(k):
        e1, e2 = perturb(k)
        return traceback_sweep_t(dirs_t, dminq, e1, e2, W=W,
                                 col_block=args.col_block,
                                 r_rows=args.r_rows, transposed=True)
    timeit(newt_fn, "walk_new_kernel")

    # parity spot-check vs the C++ AD walker on the first 64 pairs
    if new is not None:
        tr, fi, fj = new
        ops_new, si_n, sj_n = native.compact_sweep_ops_t(
            np.asarray(tr[:, :, :32]), np.asarray(fi[:64]),
            np.asarray(fj[:64]), ss[:64], ts[:64], flags)
        # device-slice the plane to the checked pairs: the full plane
        # is ~670 MB and the tunnel D2H runs ~30 MB/s
        ops_ref, si_r, sj_r = native.traceback_batch_ad(
            np.asarray(dirs[:, :32, :]), np.asarray(dminq)[:64],
            ss[:64], ts[:64], lens[:64], lens[:64],
            np.asarray(ei)[:64], np.asarray(ej)[:64], flags)
        match = all(a == b for a, b in zip(ops_new, ops_ref))
        out["parity_64"] = bool(match and (si_n == si_r).all()
                                and (sj_n == sj_r).all())
        print("parity_64:", out["parity_64"])

    print(json.dumps(out))


if __name__ == "__main__":
    main()
