"""AD-kernel op-cost probe: measure what each body section costs on chip.

Times the antidiagonal kernel at bench shapes with progressively stripped
bodies (``_strip``: 0 = full, 1 = no window rolls / substitution lookup,
2 = additionally no tracked-max accumulation) to bound the gain available
from fusing each section.  Pipelined dispatch, fresh inputs per run (the
tunnel caches identical executions).

Usage: python experiments/ad_kernel_probe.py
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

    B, L, BW = 4096, 10240, 100
    W = 128
    subst = np.where(np.eye(4, dtype=bool), 1.0, -1.0).astype(np.float32)
    kw = dict(W=W, subst=subst, go=-2.0, ge=-1.0,
              flags=ModeFlags(local_start=True, local_end=True),
              block_b=256)
    w_eff = jnp.full((B,), BW, jnp.int32)

    def mkargs(seed):
        rr = np.random.default_rng(seed * 999_983 + 7)
        return [jnp.asarray(x) for x in (
            rr.integers(0, 4, (B, L), dtype=np.int8),
            rr.integers(0, 4, (B, L), dtype=np.int8),
            np.full((B,), 10000, np.int32),
            np.full((B,), 10000, np.int32),
            np.full((B,), -(BW // 2), np.int32),
        )]

    cells = B * 10000 * BW
    out = {}
    for strip in (0, 3, 2, 1):
        res = banded_dp_pallas_ad(*mkargs(0), w_eff=w_eff, _strip=strip,
                                  **kw)
        _ = np.asarray(res.score)       # warm/compile
        n = 4
        argsets = [mkargs(k + 1) for k in range(n)]
        jax.block_until_ready(argsets)
        t0 = time.time()
        outs = [
            banded_dp_pallas_ad(*a, w_eff=w_eff, _strip=strip, **kw).score
            for a in argsets
        ]
        for o in outs:
            _ = np.asarray(o)
        dt = (time.time() - t0) / n
        out[f"strip{strip}_gcups"] = round(cells / dt / 1e9, 2)
        out[f"strip{strip}_ms"] = round(dt * 1e3, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
