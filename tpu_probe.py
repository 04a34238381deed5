import time, sys, numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, '/root/repo/tests')
from oracle import dp_oracle
from biseqt_tpu.ops.banded_dp import ModeFlags
from biseqt_tpu.ops.pallas_dp import banded_dp_pallas

subst = np.where(np.eye(4, dtype=bool), 1.0, -1.0).astype(np.float32)
kw = dict(W=128, subst=subst, go=-2.0, ge=-1.0, flags=ModeFlags(), block_b=32)

# correctness vs numpy oracle
r = np.random.default_rng(5)
B, L = 8, 512
s = r.integers(0, 4, (B, L), dtype=np.int8)
t = r.integers(0, 4, (B, L), dtype=np.int8)
sl = np.full((B,), 500, np.int32); tl = np.full((B,), 500, np.int32)
dmin = np.full((B,), -64, np.int32)
out = banded_dp_pallas(*[jnp.asarray(x) for x in (s, t, sl, tl, dmin)], **kw)
exp = [dp_oracle(s[b,:500], t[b,:500], subst, -2.0, -1.0, dmin=-64, dmax=63) for b in range(3)]
print("oracle:", exp, " pallas:", np.asarray(out.score)[:3])

B, LS = 128, 10240
for it in range(4):
    rr = np.random.default_rng(it + 100)
    a = [jnp.asarray(x) for x in (
        rr.integers(0, 4, (B, LS), dtype=np.int8),
        rr.integers(0, 4, (B, LS), dtype=np.int8),
        np.full((B,), 10000, np.int32), np.full((B,), 10000, np.int32),
        np.full((B,), -64, np.int32))]
    jax.block_until_ready(a)
    t0 = time.time()
    res = banded_dp_pallas(*a, **kw)
    jax.block_until_ready(res.score)
    dt = time.time() - t0
    print("run %.4fs  GCUPS(bw=100)=%.1f  full-band GCUPS=%.1f" % (
        dt, B*10000*100/dt/1e9, B*10000*128/dt/1e9))
