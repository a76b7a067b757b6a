"""GOP structure configuration.

Mirrors the reference's low-delay GOP generator
(/root/reference/src/cfg.c uvg_config_process_lp_gop:1641-1729) and the
hardcoded random-access B-pyramid tables (src/gop.h: ra8:94, ra16:201 —
transcribed as needed by the inter path).
"""
from __future__ import annotations

from dataclasses import dataclass


@dataclass
class GopEntry:
    poc_offset: int
    layer: int
    qp_offset: int
    qp_factor: float
    qp_model_offset: float = 0.0
    qp_model_scale: float = 0.0
    is_ref: bool = True
    ref_neg: tuple = ()
    ref_pos: tuple = ()


def process_lp_gop(gop_len: int, d: int, t: int, ref_frames: int) -> list[GopEntry]:
    """Generate a low-delay-P GOP 'lp-g<g>d<d>t<t>' structure."""
    g_count = gop_len
    depth_modulos = [0] * 8
    for dd in range(d):
        depth_modulos[d - 1 - dd] = 1 << dd
    depth_modulos[0] = g_count

    entries: list[GopEntry] = []
    for g in range(1, g_count + 1):
        gop_layer = 1
        while gop_layer < d and (g % depth_modulos[gop_layer - 1]):
            gop_layer += 1
        entries.append(GopEntry(
            poc_offset=g, layer=gop_layer, qp_offset=gop_layer,
            qp_factor=0.4624, is_ref=False, ref_neg=(), ref_pos=()))

    for idx, e in enumerate(entries):
        g = e.poc_offset
        ref_neg = [0] * ref_frames
        if t > 1:
            if g % t == 0:
                ref_neg[0] = t
            else:
                r = g - 1
                while r > 0 and entries[r].layer >= e.layer:
                    r -= 1
                if entries[r].layer < e.layer:
                    ref_neg[0] = g - entries[r].poc_offset
                    entries[r].is_ref = True
                else:
                    ref_neg[0] = g % g_count
        else:
            ref_neg[0] = 1
            if g >= 2:
                entries[g - 2].is_ref = True
        keyframe = g
        for i in range(1, ref_frames):
            while keyframe == ref_neg[i - 1]:
                keyframe += g_count
            ref_neg[i] = keyframe
        e.ref_neg = tuple(ref_neg)

    for e in entries:
        if not e.is_ref:
            e.qp_factor = 0.68 * 1.31
    entries[g_count - 1].is_ref = True
    entries[g_count - 1].qp_factor = 0.578
    return entries


# random-access B-pyramid GOP8 (transcription of uvg_gop_ra8, gop.h:94):
# entries in coding order; ref_neg/ref_pos are POC deltas
RA8 = [
    GopEntry(poc_offset=8, layer=1, qp_offset=0, qp_factor=1.0, is_ref=True,
             ref_neg=(8, 12, 16), ref_pos=()),
    GopEntry(poc_offset=4, layer=2, qp_offset=3, qp_factor=1.0, is_ref=True,
             ref_neg=(4, 8), ref_pos=(4,)),
    GopEntry(poc_offset=2, layer=3, qp_offset=4, qp_factor=1.0, is_ref=True,
             ref_neg=(2, 6), ref_pos=(2, 6)),
    GopEntry(poc_offset=1, layer=4, qp_offset=8, qp_factor=1.0, is_ref=False,
             ref_neg=(1,), ref_pos=(1, 3, 7)),
    GopEntry(poc_offset=3, layer=4, qp_offset=8, qp_factor=1.0, is_ref=False,
             ref_neg=(1, 3), ref_pos=(1, 5)),
    GopEntry(poc_offset=6, layer=3, qp_offset=4, qp_factor=1.0, is_ref=True,
             ref_neg=(2, 6), ref_pos=(2,)),
    GopEntry(poc_offset=5, layer=4, qp_offset=8, qp_factor=1.0, is_ref=False,
             ref_neg=(1, 5), ref_pos=(1, 3)),
    GopEntry(poc_offset=7, layer=4, qp_offset=8, qp_factor=1.0, is_ref=False,
             ref_neg=(1, 3, 7), ref_pos=(1,)),
]


# random-access B-pyramid GOP16 (uvg_gop_ra16, gop.h:201)
RA16 = [
    GopEntry(16, 1, 1, 1.0, is_ref=True, ref_neg=(16, 24, 32), ref_pos=()),
    GopEntry(8, 2, 1, 1.0, is_ref=True, ref_neg=(8, 16), ref_pos=(8,)),
    GopEntry(4, 3, 4, 1.0, is_ref=True, ref_neg=(4, 12), ref_pos=(4, 12)),
    GopEntry(2, 4, 5, 1.0, is_ref=True, ref_neg=(2, 10), ref_pos=(2, 6, 14)),
    GopEntry(1, 5, 6, 1.0, is_ref=False, ref_neg=(1,), ref_pos=(1, 3, 7, 15)),
    GopEntry(3, 5, 6, 1.0, is_ref=False, ref_neg=(1, 3), ref_pos=(1, 5, 13)),
    GopEntry(6, 4, 5, 1.0, is_ref=True, ref_neg=(2, 6), ref_pos=(2, 10)),
    GopEntry(5, 5, 6, 1.0, is_ref=False, ref_neg=(1, 5), ref_pos=(1, 3, 11)),
    GopEntry(7, 5, 6, 1.0, is_ref=False, ref_neg=(1, 3, 7), ref_pos=(1, 9)),
    GopEntry(12, 3, 4, 1.0, is_ref=True, ref_neg=(4, 12), ref_pos=(4,)),
    GopEntry(10, 4, 5, 1.0, is_ref=True, ref_neg=(2, 10), ref_pos=(2, 6)),
    GopEntry(9, 5, 6, 1.0, is_ref=False, ref_neg=(1, 9), ref_pos=(1, 3, 7)),
    GopEntry(11, 5, 6, 1.0, is_ref=False, ref_neg=(1, 3, 11), ref_pos=(1, 5)),
    GopEntry(14, 4, 5, 1.0, is_ref=True, ref_neg=(2, 6, 14), ref_pos=(2,)),
    GopEntry(13, 5, 6, 1.0, is_ref=False, ref_neg=(1, 5, 13), ref_pos=(1, 3)),
    GopEntry(15, 5, 6, 1.0, is_ref=False, ref_neg=(1, 3, 7, 15), ref_pos=(1,)),
]


def get_gop_config(cfg) -> list[GopEntry]:
    if cfg.gop_len == 0:
        return []
    if cfg.gop_lowdelay:
        return process_lp_gop(cfg.gop_len, cfg.gop_lp_d, cfg.gop_lp_t, cfg.ref_frames)
    if cfg.gop_len == 8:
        return RA8
    if cfg.gop_len == 16:
        return RA16
    raise NotImplementedError(f"unsupported RA GOP length {cfg.gop_len}")
