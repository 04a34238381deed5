"""Measure the int8-window lever and the general-subst path (real chip).

Three launches at bench shapes (4096 x 10 kbp, bw 100, pipelined like
bench.py):
  * baseline  — uniform subst, i32 window chunks (the shipped default)
  * i8win     — uniform subst, int8 window chunks (_i8win=True): the two
                per-step [BT, W+R] rolls move 4x fewer vregs
  * general   — a non-uniform 4x4 matrix: the select-chain substitution
                lookup (~A^2 extra where ops per step) — quantifies the
                documented throughput cliff of the general path

Honest-timing rules for this environment (see BASELINE.md): fresh
inputs per run, np.asarray materialization in the timed region,
pipelined dispatch to overlap the ~32 ms tunnel floor.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_variant(name, subst, i8win, n=4):
    import jax
    import jax.numpy as jnp
    from biseqt_tpu.ops.banded_dp import ModeFlags
    from biseqt_tpu.ops.pallas_dp_ad import banded_dp_pallas_ad

    B, L, BW, W = 4096, 10240, 100, 128
    kw = dict(W=W, subst=subst, go=-2.0, ge=-1.0,
              flags=ModeFlags(local_start=True, local_end=True),
              block_b=128, _i8win=i8win)
    w_eff = jnp.full((B,), BW, jnp.int32)

    def mkargs(seed):
        rr = np.random.default_rng(seed * 1_000_003 + 11)
        return [jnp.asarray(x) for x in (
            rr.integers(0, 4, (B, L), dtype=np.int8),
            rr.integers(0, 4, (B, L), dtype=np.int8),
            np.full((B,), 10000, np.int32),
            np.full((B,), 10000, np.int32),
            np.full((B,), -(BW // 2), np.int32),
        )]

    warm = banded_dp_pallas_ad(*mkargs(0), w_eff=w_eff, **kw)
    warm_score = np.asarray(warm.score)
    argsets = [mkargs(k + 1) for k in range(n)]
    for a in argsets:
        jax.block_until_ready(a)
    t0 = time.time()
    outs = [banded_dp_pallas_ad(*a, w_eff=w_eff, **kw).score
            for a in argsets]
    for o in outs:
        _ = np.asarray(o)
    dt = (time.time() - t0) / n
    gcups = B * 10000 * BW / dt / 1e9
    print(json.dumps({"variant": name, "gcups": round(gcups, 2),
                      "ms_per_run": round(dt * 1e3, 1),
                      "warm_score0": float(warm_score[0])}), flush=True)
    return gcups, warm_score


def main():
    uniform = np.where(np.eye(4, dtype=bool), 1.0, -1.0).astype(np.float32)
    general = np.array(
        [[1, -1, -2, -1], [-1, 1, -1, -2], [-2, -1, 1, -1], [-1, -2, -1, 1]],
        np.float32,
    )
    g0, s0 = run_variant("baseline_i32win", uniform, False)
    try:
        g1, s1 = run_variant("i8win", uniform, True)
    except Exception as e:
        # measured on this toolchain: "Rotate with non-32-bit data: not
        # implemented" — the permute unit only rolls 32-bit vregs, so
        # the 4x-fewer-vregs window-roll lever is dead (docs/kernels.md
        # ceiling analysis)
        msg = " ".join(str(e).split("\n"))[:160]
        print(json.dumps({"i8win": "compile failed", "error": msg}),
              flush=True)
        g1 = None
    if g1 is not None:
        # parity OUTSIDE the try: a compiling-but-wrong-scoring variant
        # must FAIL the probe, not be mislabeled a toolchain limitation
        np.testing.assert_allclose(s1, s0, atol=1e-2)
        print(json.dumps({"i8win_speedup": round(g1 / g0, 3)}),
              flush=True)
    run_variant("general_subst", general, False, n=2)


if __name__ == "__main__":
    main()
