import time, functools, numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30
BT, W, LSp, R = 32, 128, 10240, 128
B = 128

def shift(x, by):
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    r = jnp.roll(x, by, axis=1)
    mask = (lane >= by) if by > 0 else (lane < W + by)
    return jnp.where(mask, r, NEG)

def mk_kernel(level):
    def kern(s_ref, t2_ref, score_ref, H_sc, F_sc):
        H_sc[:] = jnp.zeros((BT, W), jnp.float32)
        F_sc[:] = jnp.full((BT, W), NEG)
        def chunk(c, _):
            base = pl.multiple_of(c * R, R)
            s_chunk = s_ref[:, pl.ds(base, R)]
            t_chunk = t2_ref[:, pl.ds(base, W + R)]
            H = H_sc[:]; F = F_sc[:]
            for r in range(R):
                t_win = t_chunk[:, r:r+W]
                s_char = s_chunk[:, r:r+1]
                sub = jnp.where(s_char == t_win, 1.0, -1.0)
                sub = jnp.where(t_win < 0, NEG, sub)
                if level == 0:
                    H = jnp.maximum(H + sub, shift(H, -1) + -1.0)
                elif level >= 1:
                    F = shift(jnp.maximum(H + -2.0, F), -1) + -1.0
                    Hp = jnp.maximum(H + sub, F)
                    if level >= 2:
                        P = shift(Hp, 1) + -3.0
                        s = 1
                        while s < W:
                            P = jnp.maximum(P, shift(P, s)); s *= 2
                        Hp = jnp.maximum(Hp, P)
                    H = Hp
            H_sc[:] = H; F_sc[:] = F
            return 0
        jax.lax.fori_loop(0, LSp // R, chunk, 0)
        score_ref[:] = jnp.max(H_sc[:], axis=1, keepdims=True)
    return kern

spec = lambda shape: pl.BlockSpec(shape, lambda b: (b, 0), memory_space=pltpu.VMEM)
def mk_fn(level):
    return jax.jit(pl.pallas_call(
        mk_kernel(level), grid=(B // BT,),
        in_specs=[spec((BT, LSp)), spec((BT, LSp + W))],
        out_specs=spec((BT, 1)),
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((BT, W), jnp.float32)] * 2,
    ))

def mkdata(seed):
    rr = np.random.default_rng(seed * 31 + 17)
    return (jnp.asarray(rr.integers(0, 4, (B, LSp), dtype=np.int32)),
            jnp.asarray(rr.integers(0, 4, (B, LSp + W), dtype=np.int32)))

for level in (0, 1, 2):
    f = mk_fn(level)
    _ = np.asarray(f(*mkdata(0)))
    datas = [mkdata(k + 1) for k in range(3)]
    for d in datas: jax.block_until_ready(d)
    t0 = time.time()
    for d in datas: _ = np.asarray(f(*d))
    dt = (time.time() - t0) / 3
    rows = (B // BT) * LSp
    print("level=%d  %.4fs  -> %.0f ns/row-step  GCUPS(bw100)=%.1f" % (
        level, dt, dt / rows * 1e9, B * 10000 * 100 / dt / 1e9))
