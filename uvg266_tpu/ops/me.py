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


def make_frac_search_fn(w: int, h: int, bitdepth: int = 8):
    """Quarter-pel refinement: evaluate the full 7x7 quarter-pel offset grid
    around the best full-pel MV in one batched pass (static interpolation
    phases -> no data-dependent control flow; replaces the reference's
    sequential hpel-then-qpel pattern search, search_inter.c:1029).

    Input: windows [B, h+10, w+10] int32 (block at origin (5,5), edge-
    extended), blocks [B, h, w], penalty [49] f32 (rate for each offset).
    Returns (best_idx [B], preds [B, 49, h, w], costs [B, 49]).
    Offset k maps to quarter-pel (dx, dy) = (k % 7 - 3, k // 7 - 3).
    Prediction is exact vs ops.inter.mc_luma (8-bit path).
    """
    import jax.numpy as jnp

    from .inter import LUMA_FILTER

    PAD = 5

    def interp_one(windows, offq_x, offq_y):
        ix = (offq_x * 4) >> 4
        iy = (offq_y * 4) >> 4
        fx = (offq_x * 4) & 15
        fy = (offq_y * 4) & 15
        if fx == 0 and fy == 0:
            return windows[:, PAD + iy:PAD + iy + h,
                           PAD + ix:PAD + ix + w].astype(jnp.int32)
        hf = LUMA_FILTER[fx]
        vf = LUMA_FILTER[fy]
        # horizontal pass over rows [iy-3, iy+h+4), 8 taps
        hor = None
        for t in range(8):
            sl = windows[:, PAD + iy - 3:PAD + iy + h + 4,
                         PAD + ix - 3 + t:PAD + ix - 3 + t + w]
            term = int(hf[t]) * sl
            hor = term if hor is None else hor + term
        hor = hor >> (bitdepth - 8) if bitdepth > 8 else hor
        out = None
        for t in range(8):
            term = int(vf[t]) * hor[:, t:t + h]
            out = term if out is None else out + term
        out = out >> 6
        wp_shift = 14 - bitdepth
        out = (out + (1 << (wp_shift - 1))) >> wp_shift
        return jnp.clip(out, 0, (1 << bitdepth) - 1).astype(jnp.int32)

    def satd_bw(d):
        # reference-exact 8x8/4x4 hadamard SATD over [B, C, h, w] diffs
        n = 8 if (w >= 8 and h >= 8) else 4
        add, shift = (2, 2) if n == 8 else (1, 1)
        hm = np.array([[1]], dtype=np.int64)
        while hm.shape[0] < n:
            hm = np.block([[hm, hm], [hm, -hm]])
        hmj = jnp.asarray(hm.astype(np.int32))
        B, C = d.shape[0], d.shape[1]
        dd = d.reshape(B, C, h // n, n, w // n, n)
        dd = jnp.swapaxes(dd, 3, 4)
        t = jnp.abs(jnp.matmul(jnp.matmul(hmj, dd,
                                          preferred_element_type=jnp.int32),
                               hmj, preferred_element_type=jnp.int32))
        s = t.sum(axis=(-2, -1))
        dc = t[..., 0, 0]
        s = s - dc + (dc >> 2)
        s = (s + add) >> shift
        return s.sum(axis=(-2, -1))

    def refine(windows, blocks, penalty):
        preds = jnp.stack([interp_one(windows, k % 7 - 3, k // 7 - 3)
                           for k in range(49)], axis=1)   # [B, 49, h, w]
        d = blocks[:, None].astype(jnp.int32) - preds
        satds = satd_bw(d).astype(jnp.float32)            # [B, 49]
        costs = satds + penalty[None]
        best = jnp.argmin(costs, axis=1)
        return best.astype(jnp.int32), preds, costs

    return refine


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
