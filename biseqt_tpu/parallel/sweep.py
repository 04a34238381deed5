"""Checkpointed all-vs-all sweeps: deterministic, resumable block runs.

The reference's only failure-recovery story was persistent SQLite indexes
reused across runs (SURVEY §5.3/5.4); the analog for chip-scale sweeps is
block-checkpointed computation: the N x N overlap matrix is processed in
query-row blocks, each block's statistics are written to disk as soon as
they finish, and a restarted sweep skips completed blocks — safe against
preemption at block granularity, bitwise deterministic given the inputs.
"""

from __future__ import annotations

import json
import os

import numpy as np
import jax.numpy as jnp

from .allvsall import overlap_stats_block

__all__ = ["checkpointed_overlap_sweep"]

_KEYS = ("num_seeds", "diag", "p", "s0", "olap_len")


def checkpointed_overlap_sweep(codes, lengths, out_dir: str, *,
                               wordlen: int = 8, block: int = 64,
                               alphabet_len: int = 4, bucket: int = 32,
                               max_hits: int = 4, progress=None):
    """All-vs-all overlap statistics with per-block disk checkpoints.

    Args:
        codes, lengths: packed read batch (host arrays ok).
        out_dir: checkpoint directory; blocks land in ``block_{i}.npz``
            and a ``manifest.json`` records the sweep geometry.  A sweep
            restarted with the same inputs resumes after the last
            completed block (mirrors the reference's idempotent index
            builds).

    Returns dict of [N, N] arrays assembled from all blocks.
    """
    codes = np.asarray(codes, np.int8)
    lengths = np.asarray(lengths, np.int32)
    N, L = codes.shape
    os.makedirs(out_dir, exist_ok=True)
    manifest_path = os.path.join(out_dir, "manifest.json")
    manifest = {
        "n": N, "l": L, "wordlen": wordlen, "block": block,
        "bucket": bucket, "max_hits": max_hits,
        "alphabet_len": alphabet_len,
    }
    if os.path.exists(manifest_path):
        old = json.load(open(manifest_path))
        # tolerate manifests written before alphabet_len was recorded
        old.setdefault("alphabet_len", alphabet_len)
        assert old == manifest, (
            "checkpoint dir holds a different sweep: %r" % (old,)
        )
    else:
        json.dump(manifest, open(manifest_path, "w"))

    n_blocks = (N + block - 1) // block
    t_codes = jnp.asarray(codes)
    t_lens = jnp.asarray(lengths)
    for bi in range(n_blocks):
        f = os.path.join(out_dir, "block_%05d.npz" % bi)
        if os.path.exists(f):
            continue
        lo, hi = bi * block, min((bi + 1) * block, N)
        stats = overlap_stats_block(
            jnp.asarray(codes[lo:hi]), jnp.asarray(lengths[lo:hi]),
            t_codes, t_lens, wordlen=wordlen,
            alphabet_len=alphabet_len, bucket=bucket, max_hits=max_hits,
        )
        tmp = f + ".tmp.npz"
        np.savez_compressed(
            tmp, **{k: np.asarray(v) for k, v in stats.items()}
        )
        os.replace(tmp, f)  # atomic: a crash never leaves partial blocks
        if progress:
            progress(bi + 1, n_blocks)

    out = {k: [] for k in _KEYS}
    for bi in range(n_blocks):
        z = np.load(os.path.join(out_dir, "block_%05d.npz" % bi))
        for k in _KEYS:
            out[k].append(z[k])
    return {k: np.concatenate(v, axis=0)[:N] for k, v in out.items()}
