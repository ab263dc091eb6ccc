"""Static-shape compaction utilities.

``masked_gather`` is the TPU replacement for boolean-mask indexing
(``data[mask]`` everywhere in the reference): it moves up to ``capacity``
masked rows to the front of a fixed-size output, preserving order, with a
validity mask for the tail. No data-dependent shapes.

Implementation: one stable argsort. MEASURED NEGATIVE (2026-08-20,
tools/microbench_compaction.py + tools/profile_fsd.py — do not retry): the
sort-free form (MXU mark prefix-sum + vectorized ``searchsorted``) is
2.4× SLOWER on v5e (6× [65k]→4096 compactions: 3.94 ms vs 1.63 sorted;
RoI [262k]→32768: +5.8 ms) — searchsorted's log2(n) scan rounds of
``capacity``-lane gathers lose to one well-tiled sort, and the fsd
group-gather band's cost was never the sort anyway (it was the
``_force_one_fg_per_sample`` segment scatters, models/fsd.py).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def masked_gather(mask: jax.Array, capacity: int) -> Tuple[jax.Array, jax.Array]:
    """Indices of the first ``capacity`` True rows (order-preserving).

    Returns (idx [capacity] int32, out_valid [capacity] bool). Rows beyond
    the mask's population are invalid (their idx points at row 0 — callers
    must mask). If more than ``capacity`` rows are set, the overflow is
    dropped from the tail (highest indices), matching the reference's
    implicit "keep what fits" bucketing.
    """
    n = mask.shape[0]
    order = jnp.argsort(~mask, stable=True)  # True rows first, stable
    idx = order[:capacity]
    out_valid = mask[idx]
    idx = jnp.where(out_valid, idx, 0)
    return idx.astype(jnp.int32), out_valid


def pad_to(x: jax.Array, n: int, value=0) -> jax.Array:
    """Pad/truncate axis 0 to length n."""
    if x.shape[0] == n:
        return x
    if x.shape[0] > n:
        return x[:n]
    pad_width = [(0, n - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad_width, constant_values=value)
