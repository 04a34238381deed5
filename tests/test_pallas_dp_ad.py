"""Antidiagonal dual-pair kernel vs the lax oracle (interpret mode).

Small r_chunk keeps the unrolled-body CPU compile tractable; the real
chip is covered by `make tpu-smoke` (exact parity + throughput).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from biseqt_tpu.ops.banded_dp import banded_dp, ModeFlags
from biseqt_tpu.ops.pallas_dp_ad import banded_dp_pallas_ad

FLAG_CASES = [
    ModeFlags(local_start=True, local_end=True),
    ModeFlags(),
    ModeFlags(free_start_edges=True, free_end_edges=True),
]


def _mk_batch(rng):
    """Ragged pairs, mixed dmin parities, per-pair effective widths."""
    B, L = 5, 150
    ss = rng.integers(0, 4, (B, L)).astype(np.int8)
    ts = ss.copy()
    m = rng.random((B, L)) < 0.15
    ts[m] = (ts[m] + 1 + rng.integers(0, 3, m.sum())) % 4
    s_lens = np.array([150, 140, 150, 130, 150], np.int32)
    t_lens = np.array([148, 150, 135, 150, 150], np.int32)
    dmin = np.array([-64, -63, -30, -80, -64], np.int32)
    w_eff = np.array([100, 127, 64, 120, 127], np.int32)
    return [jnp.asarray(x) for x in (ss, ts, s_lens, t_lens, dmin)], w_eff


@pytest.mark.parametrize("flags", FLAG_CASES)
def test_ad_kernel_matches_lax(rng, flags):
    args, w_eff = _mk_batch(rng)
    subst = np.where(np.eye(4, dtype=bool), 1.0, -1.0).astype(np.float32)
    kw = dict(W=128, subst=subst, go=-2.0, ge=-1.0, flags=flags,
              w_eff=jnp.asarray(w_eff))
    ref = np.asarray(banded_dp(*args, **kw).score)
    got = np.asarray(banded_dp_pallas_ad(
        *args, interpret=True, block_b=8, r_chunk=16, **kw).score)
    np.testing.assert_allclose(got, ref, atol=1e-2, err_msg=str(flags))


def test_ad_kernel_general_subst_fractional_ge(rng):
    """Non-uniform substitution matrix + fractional ge exercises the
    general lookup path and the drifted-state arithmetic."""
    args, w_eff = _mk_batch(rng)
    subst = np.array(
        [[2, -1, -2, -1], [-1, 2, -1, -2], [-2, -1, 2, -1], [-1, -2, -1, 2]],
        np.float32,
    )
    kw = dict(W=128, subst=subst, go=-3.0, ge=-0.5,
              flags=ModeFlags(local_start=True, local_end=True),
              w_eff=jnp.asarray(w_eff))
    ref = np.asarray(banded_dp(*args, **kw).score)
    got = np.asarray(banded_dp_pallas_ad(
        *args, interpret=True, block_b=8, r_chunk=16, **kw).score)
    np.testing.assert_allclose(got, ref, atol=1e-2)
