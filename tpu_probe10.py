import time, sys, numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, '/root/repo/tests')
from oracle import dp_oracle
from biseqt_tpu.ops.banded_dp import ModeFlags
from biseqt_tpu.ops.pallas_dp import banded_dp_pallas

subst = np.where(np.eye(4, dtype=bool), 1.0, -1.0).astype(np.float32)

# correctness vs oracle (local + global)
r = np.random.default_rng(5)
Bc, L = 8, 512
s = r.integers(0, 4, (Bc, L), dtype=np.int8)
t = r.integers(0, 4, (Bc, L), dtype=np.int8)
sl = np.full((Bc,), 500, np.int32); tl = np.full((Bc,), 500, np.int32)
dm = np.full((Bc,), -64, np.int32)
for name, fl in (("global", ModeFlags()),
                 ("local", ModeFlags(local_start=True, local_end=True))):
    out = banded_dp_pallas(*[jnp.asarray(x) for x in (s, t, sl, tl, dm)],
                           W=128, subst=subst, go=-2.0, ge=-1.0, flags=fl)
    exp = [dp_oracle(s[b,:500], t[b,:500], subst, -2.0, -1.0, dmin=-64, dmax=63,
                     local_start=fl.local_start, local_end=fl.local_end)
           for b in range(3)]
    print(name, "oracle:", [round(e) for e in exp], "pallas:", np.asarray(out.score)[:3])

B, LS = 256, 10240
def mk(seed):
    rr = np.random.default_rng(seed * 1299721 + 3)
    return [jnp.asarray(x) for x in (
        rr.integers(0, 4, (B, LS), dtype=np.int8),
        rr.integers(0, 4, (B, LS), dtype=np.int8),
        np.full((B,), 10000, np.int32), np.full((B,), 10000, np.int32),
        np.full((B,), -64, np.int32))]
for bb in (64, 128, 256):
    kw = dict(W=128, subst=subst, go=-2.0, ge=-1.0,
              flags=ModeFlags(local_start=True, local_end=True), block_b=bb)
    try:
        _ = np.asarray(banded_dp_pallas(*mk(0), **kw).score)
        datas = [mk(k + 1) for k in range(3)]
        for d in datas: jax.block_until_ready(d)
        t0 = time.time()
        for d in datas: _ = np.asarray(banded_dp_pallas(*d, **kw).score)
        dt = (time.time() - t0) / 3 - 0.032
        print("block_b=%-4d real %.4fs  GCUPS(bw100)=%.1f" % (bb, dt, B*10000*100/dt/1e9), flush=True)
    except Exception as e:
        print("block_b=%d FAILED: %s" % (bb, str(e)[:200]), flush=True)
