"""Probe: can we get the dirs plane TRANSPOSED ([a//2, x, b2]) cheaply?

The round-5 walk redesign packs walkers in the LANE axis (extraction
becomes a sublane reduce serving every plane row at once; the ~30-op
update chain runs once per step for ALL walkers instead of once per
(program x group)).  It needs per-chunk [W, B2] slabs instead of the DP
kernel's row-major [B2, W].  Three candidate sources, measured here:

  1. XLA device transpose of the uint8 plane between DP and walk.
  2. In-kernel Mosaic transpose of each [BT, W] i32 row (jnp.swapaxes)
     — compile feasibility + cost.
  3. DP-kernel-side transposed store (store [W, BT] per packed row)
     — probed via (2)'s cost, since it is the same transpose.

Usage: python experiments/transpose_probe.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(fn, *args, n=3):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = np.asarray(out).ravel()[:8]
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    rng = np.random.default_rng(0)
    Rp, B2, W = 1288, 512, 128   # 1/8 of the census plane (fits probe time)
    plane = jnp.asarray(rng.integers(0, 256, (Rp, B2, W), dtype=np.uint8))

    # 1. XLA transpose (uint8, minor-dims swap)
    ft = jax.jit(lambda x: jnp.swapaxes(x, 1, 2))
    try:
        dt = timed(ft, plane)
        mb = plane.nbytes / 1e6
        print("xla_transpose_u8: %.2f ms for %.0f MB (%.1f GB/s eff)"
              % (dt * 1e3, mb, 2 * mb / 1e3 / dt))
    except Exception as e:
        print("xla_transpose_u8: FAILED —", str(e)[:200])

    # 1b. same via int32 view? (transpose in i32 after bitcast-ish pad)
    fi = jax.jit(lambda x: jnp.swapaxes(x.astype(jnp.int32), 1, 2)
                 .astype(jnp.uint8))
    try:
        dt = timed(fi, plane)
        print("xla_transpose_via_i32: %.2f ms" % (dt * 1e3,))
    except Exception as e:
        print("xla_transpose_via_i32: FAILED —", str(e)[:200])

    # 2. Mosaic in-kernel transpose of [BT, W] i32 rows
    BT = 128

    def tr_kernel(x_ref, o_ref):
        v = x_ref[:].astype(jnp.int32)          # [BT, W]
        o_ref[:] = jnp.swapaxes(v, 0, 1).astype(jnp.uint8)

    def run_tr(x):
        return pl.pallas_call(
            tr_kernel,
            grid=(x.shape[0],),
            in_specs=[pl.BlockSpec((1, BT, W), lambda r: (r, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, W, BT), lambda r: (r, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((x.shape[0], W, BT), jnp.uint8),
        )(x)

    sub = plane[:256, :BT, :]
    try:
        got = np.asarray(jax.jit(run_tr)(sub))
        want = np.asarray(sub).transpose(0, 2, 1)
        ok = (got == want).all()
        dt = timed(jax.jit(run_tr), sub)
        rows_per_s = 256 / dt
        print("mosaic_transpose_i32: ok=%s %.2f ms / 256 rows "
              "(%.0f rows/ms; DP does 2 antidiagonals per row)"
              % (ok, dt * 1e3, rows_per_s / 1e3))
    except Exception as e:
        print("mosaic_transpose_i32: FAILED —", str(e)[:300])


if __name__ == "__main__":
    main()
