import time, functools, numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30
BT, W, LSp, R = 32, 128, 10240, 128
B = 128

def mk_kernel(variant):
    # precomputed lane masks for shifts
    def kern(s_ref, t2_ref, score_ref, H_sc, F_sc):
        lane = jax.lax.broadcasted_iota(jnp.int32, (BT, W), 1)
        masks = {s: lane >= s for s in (1, 2, 4, 8, 16, 32, 64)}
        mask_up = lane < (W - 1)
        def shr(x, s):  # lane k <- k-s (toward higher), fill NEG
            return jnp.where(masks[s], pltpu.roll(x, s, 1), NEG)
        def shl1(x):    # lane k <- k+1, fill NEG
            return jnp.where(mask_up, pltpu.roll(x, W - 1, 1), NEG)
        H_sc[:] = jnp.zeros((BT, W), jnp.float32)
        F_sc[:] = jnp.full((BT, W), NEG)
        def chunk(c, _):
            base = pl.multiple_of(c * R, R)
            s_chunk = s_ref[:, pl.ds(base, R)]
            t_chunk = t2_ref[:, pl.ds(base, W + R)]
            H = H_sc[:]; F = F_sc[:]
            for r in range(R):
                t_win = t_chunk[:, r:r+W]
                if variant == "nosub":
                    sub = jnp.where(t_win < 0, NEG, 1.0)
                else:
                    s_char = s_chunk[:, r:r+1]
                    sub = jnp.where(s_char == t_win, 1.0, -1.0)
                    sub = jnp.where(t_win < 0, NEG, sub)
                if variant in ("roll0", "nosub"):
                    H = jnp.maximum(H + sub, shl1(H) + -1.0)
                else:  # full with pltpu.roll
                    F = shl1(jnp.maximum(H + -2.0, F)) + -1.0
                    Hp = jnp.maximum(H + sub, F)
                    P = shr(Hp, 1) + -3.0
                    s = 1
                    while s < W:
                        P = jnp.maximum(P, shr(P, s)); s *= 2
                    Hp = jnp.maximum(Hp, P)
                    H = Hp
            H_sc[:] = H; F_sc[:] = F
            return 0
        jax.lax.fori_loop(0, LSp // R, chunk, 0)
        score_ref[:] = jnp.max(H_sc[:], axis=1, keepdims=True)
    return kern

spec = lambda shape: pl.BlockSpec(shape, lambda b: (b, 0), memory_space=pltpu.VMEM)
def mk_fn(variant):
    return jax.jit(pl.pallas_call(
        mk_kernel(variant), grid=(B // BT,),
        in_specs=[spec((BT, LSp)), spec((BT, LSp + W))],
        out_specs=spec((BT, 1)),
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((BT, W), jnp.float32)] * 2,
    ))

def mkdata(seed):
    rr = np.random.default_rng(seed * 131 + 19)
    return (jnp.asarray(rr.integers(0, 4, (B, LSp), dtype=np.int32)),
            jnp.asarray(rr.integers(0, 4, (B, LSp + W), dtype=np.int32)))

for variant in ("roll0", "nosub", "full"):
    f = mk_fn(variant)
    _ = np.asarray(f(*mkdata(0)))
    datas = [mkdata(k + 1) for k in range(3)]
    for d in datas: jax.block_until_ready(d)
    t0 = time.time()
    for d in datas: _ = np.asarray(f(*d))
    dt = (time.time() - t0) / 3
    rows = (B // BT) * LSp
    print("%-6s  %.4fs  -> %.0f ns/row-step  GCUPS(bw100)=%.1f" % (
        variant, dt, dt / rows * 1e9, B * 10000 * 100 / dt / 1e9))
