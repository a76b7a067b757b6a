"""Batched motion estimation: dense full-pel SSD search on the MXU.

TPU-first replacement of the reference's sequential pattern searches
(search_inter.c hexbs:767 / tz:680 / full:947): instead of data-dependent
refinement walks, evaluate the WHOLE search window for every block at
once — the cross-correlation term of the SSD decomposition maps onto
grouped convolutions (MXU), and argmin picks the motion vector. The
reference's own UVG_IME_FULL modes (uvg266.h:109) acknowledge dense
search; on TPU it is the fast path.

  SSD(d) = sum(b^2) - 2*corr(b, r)(d) + boxsum(r^2)(d)

A rate term lambda_sqrt * mvd_bits(offset) is added from a precomputed
penalty table (golomb-length estimate, mirroring the reference's
mv_cost tables)."""
from __future__ import annotations

import numpy as np


def mv_bits_est(v: int) -> float:
    """Approximate signaled bits for one quarter-pel mvd component
    (abs_mvd coding: greater0 + greater1 + EG1 + sign)."""
    a = abs(v)
    if a == 0:
        return 1.0
    if a == 1:
        return 3.0
    # EG1 length for a-2
    k = a - 2
    length = 1
    count = 1
    while k >= (1 << count):
        k -= 1 << count
        count += 1
        length += 2
    return 2.0 + length + count + 1


def make_fullpel_search_fn(w: int, h: int, r: int):
    """Returns jittable fn (windows [B, h+2r, w+2r] i32, blocks [B, h, w] i32,
    penalty [2r+1, 2r+1] f32) -> (mvx [B], mvy [B], cost [B] f32).

    windows are edge-extended reference patches centered on each block's
    position; offset (dy, dx) in [-r, r]^2; returned MVs are full-pel.
    """
    import jax
    import jax.numpy as jnp

    n = 2 * r + 1

    def search(windows, blocks, penalty):
        B = blocks.shape[0]
        wf = windows.astype(jnp.float32)
        bf = blocks.astype(jnp.float32)
        # cross-correlation via grouped conv: input [1, B, H, W],
        # kernel [B, 1, h, w], feature_group_count=B
        x = wf[None]                                  # [1, B, H, W]
        k = bf[:, None]                               # [B, 1, h, w]
        corr = jax.lax.conv_general_dilated(
            x, k, window_strides=(1, 1), padding="VALID",
            feature_group_count=B)[0]                 # [B, n, n]
        ones = jnp.ones((1, 1, h, w), dtype=jnp.float32)
        r2 = jax.lax.conv_general_dilated(
            (wf * wf)[:, None], ones, (1, 1), "VALID")[:, 0]  # [B, n, n]
        b2 = (bf * bf).sum(axis=(-2, -1))[:, None, None]
        ssd = b2 - 2.0 * corr + r2
        cost = ssd + penalty[None]
        flat = cost.reshape(B, -1)
        idx = jnp.argmin(flat, axis=1)
        best = jnp.min(flat, axis=1)
        dy = idx // n - r
        dx = idx % n - r
        return dx.astype(jnp.int32), dy.astype(jnp.int32), best

    return search


def make_mv_penalty(r: int, lam_sqrt: float) -> np.ndarray:
    """[2r+1, 2r+1] rate penalty for full-pel offsets (quarter-pel mvd
    magnitude = 4*offset), biasing toward small vectors."""
    n = 2 * r + 1
    out = np.zeros((n, n), dtype=np.float32)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            out[dy + r, dx + r] = lam_sqrt * (mv_bits_est(4 * dx)
                                              + mv_bits_est(4 * dy))
    return out
