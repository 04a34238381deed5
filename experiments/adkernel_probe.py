"""Real-chip probe: antidiagonal dual-pair kernel vs row kernel GCUPS.

Run serialized (one TPU process at a time).  Honest timing per
CLAUDE.md: fresh inputs per iteration, D2H materialization in the timed
region, big batches to amortize the ~32 ms dispatch floor.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from biseqt_tpu.ops.banded_dp import ModeFlags
    from biseqt_tpu.ops.pallas_dp_ad import banded_dp_pallas_ad

    B, L, BW = 4096, 10240, 100
    W = 128
    block_b = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    subst = np.where(np.eye(4, dtype=bool), 1.0, -1.0).astype(np.float32)
    kw = dict(W=W, subst=subst, go=-2.0, ge=-1.0,
              flags=ModeFlags(local_start=True, local_end=True),
              block_b=block_b)

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
    t0 = time.time()
    res = banded_dp_pallas_ad(*mkargs(0), w_eff=w_eff, **kw)
    s0 = np.asarray(res.score)
    print(f"compile+first run: {time.time()-t0:.1f}s; "
          f"score[:4]={s0[:4]}", flush=True)

    # cross-check vs row kernel scores on the same inputs
    from biseqt_tpu.ops.pallas_dp import banded_dp_pallas
    a0 = mkargs(0)
    ref = banded_dp_pallas(*a0, w_eff=w_eff, W=W, subst=subst, go=-2.0,
                           ge=-1.0,
                           flags=ModeFlags(local_start=True, local_end=True),
                           block_b=256)
    r0 = np.asarray(ref.score)
    g0 = np.asarray(banded_dp_pallas_ad(*a0, w_eff=w_eff, **kw).score)
    print(f"parity vs row kernel: max|diff|={np.abs(r0-g0).max()}",
          flush=True)

    n = 4
    argsets = [mkargs(k + 1) for k in range(n)]
    for a in argsets:
        jax.block_until_ready(a)
    # serialized dispatch (materialize each result before the next launch)
    t0 = time.time()
    for a in argsets:
        res = banded_dp_pallas_ad(*a, w_eff=w_eff, **kw)
        _ = np.asarray(res.score)
    dt = (time.time() - t0) / n
    cells = B * 10000 * BW
    print(f"block_b={block_b} serialized: {dt*1e3:.0f} ms/run -> "
          f"{cells/dt/1e9:.2f} GCUPS (counted BW={BW})", flush=True)
    # pipelined dispatch: launch all, then materialize all — amortizes the
    # ~32 ms tunnel dispatch floor the way a production stream would.
    # FRESH argsets: re-dispatching the serialized loop's exact inputs
    # would be identical executions the tunnel can serve from cache
    argsets2 = [mkargs(k + 101) for k in range(n)]
    for a in argsets2:
        jax.block_until_ready(a)
    t0 = time.time()
    outs = [banded_dp_pallas_ad(*a, w_eff=w_eff, **kw).score
            for a in argsets2]
    for o in outs:
        _ = np.asarray(o)
    dt = (time.time() - t0) / n
    print(f"block_b={block_b} pipelined:  {dt*1e3:.0f} ms/run -> "
          f"{cells/dt/1e9:.2f} GCUPS (counted BW={BW})", flush=True)


if __name__ == "__main__" and (len(sys.argv) <= 2 or sys.argv[2] != "strip"):
    main()


def strip_probe():
    """Where does the time go? strip=1: no slices/sub; strip=2: no track."""
    import jax
    import jax.numpy as jnp
    from biseqt_tpu.ops.banded_dp import ModeFlags
    from biseqt_tpu.ops.pallas_dp_ad import banded_dp_pallas_ad

    B, L, BW = 4096, 10240, 100
    subst = np.where(np.eye(4, dtype=bool), 1.0, -1.0).astype(np.float32)
    kw = dict(W=128, subst=subst, go=-2.0, ge=-1.0,
              flags=ModeFlags(local_start=True, local_end=True),
              block_b=256)
    rr = np.random.default_rng(1)
    def mk(seed):
        r2 = np.random.default_rng(seed)
        return [jnp.asarray(x) for x in (
            r2.integers(0, 4, (B, L), dtype=np.int8),
            r2.integers(0, 4, (B, L), dtype=np.int8),
            np.full((B,), 10000, np.int32), np.full((B,), 10000, np.int32),
            np.full((B,), -(BW // 2), np.int32))]
    w_eff = jnp.full((B,), BW, jnp.int32)
    for strip in (0, 1, 2):
        _ = np.asarray(banded_dp_pallas_ad(
            *mk(0), w_eff=w_eff, _strip=strip, **kw).score)
        argsets = [mk(k + 1) for k in range(3)]
        for a in argsets:
            jax.block_until_ready(a)
        t0 = time.time()
        outs = [banded_dp_pallas_ad(*a, w_eff=w_eff, _strip=strip,
                                    **kw).score for a in argsets]
        for o in outs:
            _ = np.asarray(o)
        dt = (time.time() - t0) / 3
        print(f"strip={strip}: {dt*1e3:.0f} ms/run pipelined", flush=True)


if __name__ == "__main__" and len(sys.argv) > 2 and sys.argv[2] == "strip":
    strip_probe()
