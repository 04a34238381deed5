"""General-substitution path probe: packed planes vs value planes vs
select chain on the real chip (round-4 protein-scale follow-up).

Measures the AD kernel at bench shapes (4096 x 10 kbp, BW=100) with an
integer-grid A x A matrix (the BLOSUM/PAM shape) through each lowering:

* ``packed``: base-32 digit-packed planes (P = ceil(A/4) rolls+selects
  per step + a constant exact-extraction chain)
* ``planes``: one f32 value plane per letter (A rolls + A selects/step)
* ``chain``: the per-step A^2 select chain (A <= 8 only; A=20 compiles
  ~7 min and measured 6.2 GCUPS round 4)

Usage: python experiments/subst_probe.py [A] [paths...]
       (default: A=20, packed planes)
"""

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

    A = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    paths = sys.argv[2:] or ["packed", "planes"]
    B, L, BW = 4096, 10240, 100
    W = 128
    rng = np.random.default_rng(20_260_818)
    subst = rng.integers(-4, 0, (A, A)).astype(np.float32)
    subst = np.minimum(subst, subst.T)
    np.fill_diagonal(subst, rng.integers(1, 12, A).astype(np.float32))
    kw = dict(W=W, subst=subst, go=-2.0, ge=-1.0,
              flags=ModeFlags(local_start=True, local_end=True),
              block_b=256, A=A)
    w_eff = jnp.full((B,), BW, jnp.int32)

    def mkargs(seed):
        rr = np.random.default_rng(seed * 999_983 + 7)
        return [jnp.asarray(x) for x in (
            rr.integers(0, A, (B, L), dtype=np.int8),
            rr.integers(0, A, (B, L), dtype=np.int8),
            np.full((B,), 10000, np.int32),
            np.full((B,), 10000, np.int32),
            np.full((B,), -(BW // 2), np.int32),
        )]

    over = {"packed": dict(_subst_packed=True),
            "planes": dict(_subst_planes=True),
            "chain": dict(_subst_planes=False)}
    cells = B * 10000 * BW
    n = 4
    scores = {}
    for path in paths:
        t0 = time.time()
        a0 = mkargs(0)
        res = banded_dp_pallas_ad(*a0, w_eff=w_eff, **over[path], **kw)
        scores[path] = np.asarray(res.score)
        print(f"{path}: compile+first {time.time()-t0:.1f}s "
              f"score[:4]={scores[path][:4]}", flush=True)
        argsets = [mkargs(k + 101) for k in range(n)]
        for a in argsets:
            jax.block_until_ready(a)
        t0 = time.time()
        outs = [banded_dp_pallas_ad(*a, w_eff=w_eff, **over[path],
                                    **kw).score
                for a in argsets]
        for o in outs:
            _ = np.asarray(o)
        dt = (time.time() - t0) / n
        print(f'{{"path": "{path}", "A": {A}, "ms": {dt*1e3:.0f}, '
              f'"gcups": {cells/dt/1e9:.2f}}}', flush=True)
    keys = [p for p in paths if p in scores]
    for p in keys[1:]:
        d = float(np.abs(scores[keys[0]] - scores[p]).max())
        print(f"parity {keys[0]} vs {p}: max|diff|={d}", flush=True)
        assert d < 1e-2


if __name__ == "__main__":
    main()
