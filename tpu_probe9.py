import time, functools, numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30
W, LSp, R = 128, 10240, 128
B = 256

def mk_fn(BT, GB):
    """BT = pairs per grid step; GB = sub-group size (interleaved chains)."""
    G = BT // GB
    def kern(s_ref, t2_ref, score_ref, H_sc, F_sc):
        lane = jax.lax.broadcasted_iota(jnp.int32, (GB, W), 1)
        masks = {s: lane >= s for s in (1, 2, 4, 8, 16, 32, 64)}
        mask_up = lane < (W - 1)
        kf = lane.astype(jnp.float32)
        gek = -1.0 * kf
        cgek = (-3.0) - gek
        def shr(x, s):
            return jnp.where(masks[s], pltpu.roll(x, s, 1), NEG)
        def shl1(x):
            return jnp.where(mask_up, pltpu.roll(x, W - 1, 1), NEG)
        H_sc[:] = jnp.zeros((BT, W), jnp.float32)
        F_sc[:] = jnp.full((BT, W), NEG)
        def chunk(c, _):
            base = pl.multiple_of(c * R, R)
            s_chunk = s_ref[:, pl.ds(base, R)]
            t_chunk = t2_ref[:, pl.ds(base, W + R)]
            Hs = [H_sc[g*GB:(g+1)*GB, :] for g in range(G)]
            Fs = [F_sc[g*GB:(g+1)*GB, :] for g in range(G)]
            for r in range(R):
                for g in range(G):
                    H, F = Hs[g], Fs[g]
                    t_win = t_chunk[g*GB:(g+1)*GB, r:r+W]
                    s_char = s_chunk[g*GB:(g+1)*GB, r:r+1]
                    sub = jnp.where(s_char == t_win, 1.0, -1.0)
                    sub = jnp.where(t_win < 0, NEG, sub)
                    F = shl1(jnp.maximum(H + -2.0, F)) + -1.0
                    Hp = jnp.maximum(H + sub, F)
                    Hp = jnp.maximum(Hp, 0.0)   # local start
                    P = shr(Hp, 1) + cgek
                    s = 1
                    while s < W:
                        P = jnp.maximum(P, shr(P, s)); s *= 2
                    Hs[g] = jnp.maximum(Hp, P + gek)
                    Fs[g] = F
            for g in range(G):
                H_sc[g*GB:(g+1)*GB, :] = Hs[g]
                F_sc[g*GB:(g+1)*GB, :] = Fs[g]
            return 0
        jax.lax.fori_loop(0, LSp // R, chunk, 0)
        score_ref[:] = jnp.max(H_sc[:], axis=1, keepdims=True)
    spec = lambda shape, ms=pltpu.VMEM: pl.BlockSpec(shape, lambda b: (b, 0), memory_space=ms)
    return jax.jit(pl.pallas_call(
        kern, grid=(B // BT,),
        in_specs=[spec((BT, LSp)), spec((BT, LSp + W))],
        out_specs=spec((BT, 1)),
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((BT, W), jnp.float32)] * 2,
    ))

def mkdata(seed):
    rr = np.random.default_rng(seed * 419 + 5)
    return (jnp.asarray(rr.integers(0, 4, (B, LSp), dtype=np.int32)),
            jnp.asarray(rr.integers(0, 4, (B, LSp + W), dtype=np.int32)))

import sys
cases = [(64, 8), (64, 16), (64, 64)]
for (BT, GB) in cases:
    try:
        f = mk_fn(BT, GB)
        _ = np.asarray(f(*mkdata(0)))
        datas = [mkdata(k + 1) for k in range(3)]
        for d in datas: jax.block_until_ready(d)
        t0 = time.time()
        for d in datas: _ = np.asarray(f(*d))
        dt = (time.time() - t0) / 3 - 0.032
        rows = (B // BT) * LSp
        print("BT=%-4d GB=%-3d real %.4fs -> %.0f ns/row  GCUPS(bw100)=%.1f" % (
            BT, GB, dt, dt / rows * 1e9, B * 10000 * 100 / max(dt, 1e-9) / 1e9), flush=True)
    except Exception as e:
        print("BT=%d GB=%d FAILED: %s" % (BT, GB, str(e)[:160]), flush=True)
