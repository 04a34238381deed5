"""Probe which i16 vector ops this Mosaic toolchain compiles (real chip).

Round-1 note says "i16 compile fails on roll/where" — re-test each op in
isolation so the i16 kernel variant can be designed around what works.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def try_op(name, body):
    def kernel(x_ref, o_ref):
        o_ref[:] = body(x_ref[:])

    x = jnp.asarray(np.arange(256 * 128, dtype=np.int16).reshape(256, 128))
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((256, 128), jnp.int16),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
        np.asarray(out)
        print(f"OK   {name}", flush=True)
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:140]
        print(f"FAIL {name}: {msg}", flush=True)
        return False


def main():
    try_op("add", lambda x: x + jnp.int16(3))
    try_op("max", lambda x: jnp.maximum(x, jnp.int16(7)))
    try_op("min-vec (mask trick)",
           lambda x: jnp.minimum(x, jnp.where(
               jax.lax.broadcasted_iota(jnp.int32, (256, 128), 1) < 100,
               jnp.int16(32000), jnp.int16(-20000))))
    try_op("roll", lambda x: pltpu.roll(x, 1, 1))
    try_op("roll127", lambda x: pltpu.roll(x, 127, 1))
    try_op("where(i1,i16,i16)",
           lambda x: jnp.where(
               jax.lax.broadcasted_iota(jnp.int32, (256, 128), 1) < 100,
               x, jnp.int16(-20000)))
    try_op("select from i32 cmp",
           lambda x: jnp.where(x.astype(jnp.int32) % 2 == 0, x,
                               jnp.int16(-1)))
    try_op("i32->i16 cast", lambda x: (x.astype(jnp.int32) + 5).astype(
        jnp.int16))
    try_op("i16 cmp + i16 sel", lambda x: jnp.where(x == jnp.int16(4), x,
                                                    jnp.int16(-2)))
    try_op("slice value [r:r+W]", lambda x: jnp.pad(
        x, ((0, 0), (0, 128)))[:, 3:131].astype(jnp.int16))


if __name__ == "__main__":
    main()
