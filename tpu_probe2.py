import time, numpy as np
import jax, jax.numpy as jnp
from biseqt_tpu.ops.banded_dp import ModeFlags
from biseqt_tpu.ops.pallas_dp import banded_dp_pallas

subst = np.where(np.eye(4, dtype=bool), 1.0, -1.0).astype(np.float32)
B, LS = 128, 10240
def mk(seed):
    rr = np.random.default_rng(seed * 104729 + 7)
    return [jnp.asarray(x) for x in (
        rr.integers(0, 4, (B, LS), dtype=np.int8),
        rr.integers(0, 4, (B, LS), dtype=np.int8),
        np.full((B,), 10000, np.int32), np.full((B,), 10000, np.int32),
        np.full((B,), -64, np.int32))]
it = 0
for bb in (8, 16, 32):
    kw = dict(W=128, subst=subst, go=-2.0, ge=-1.0, flags=ModeFlags(), block_b=bb)
    a = mk(it); it += 1
    res = banded_dp_pallas(*a, **kw); _ = np.asarray(res.score)
    n = 3
    args = [mk(it + k) for k in range(n)]; it += n
    for x in args: jax.block_until_ready(x)
    t0 = time.time()
    for k in range(n):
        res = banded_dp_pallas(*args[k], **kw)
        _ = np.asarray(res.score)
    dt = (time.time() - t0) / n
    print("block_b=%-3d per-run %.4fs  GCUPS(bw=100)=%.1f" % (bb, dt, B*10000*100/dt/1e9))
