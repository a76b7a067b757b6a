"""IBC (intra block copy): encoder search + syntax round-trip.

Parity targets: skip/ibc_flag signaling (encode_coding_tree.c:1471-1560),
IBC merge candidates + per-CTU-row IBC HMVP (inter.c:1250-1349,
:1841-1899), full-pel MVD (uvg_encode_inter_prediction_unit CU_IBC arms),
copy reconstruction (ibc_recon_cu, inter.c:614-676), validity window
(search_ibc.c:92-101).  Conformance against reference-binary --ibc
streams is in test_ref_decode.py.
"""
import numpy as np
import pytest

from uvg266_tpu.cfg import Config
from uvg266_tpu.control.encoder import FramePlanes, SliceEncoder, ibc_bv_valid
from uvg266_tpu.control.params import EncoderControl, FrameState
from uvg266_tpu.oracle.decoder import decode_au


def test_bv_validity_window():
    # source must be fully left or fully above, inside the CTU row,
    # within 192 columns, non-positive components
    assert ibc_bv_valid(64, 64, 16, 16, -16, 0)
    assert ibc_bv_valid(64, 80, 16, 16, 0, -16)
    assert not ibc_bv_valid(64, 64, 16, 16, 0, -16)    # above CTU row top
    assert not ibc_bv_valid(64, 64, 16, 16, -8, -8)    # overlaps
    assert not ibc_bv_valid(64, 64, 16, 16, 16, 0)     # positive
    assert not ibc_bv_valid(64, 64, 16, 16, 0, -64)    # above CTU row
    assert ibc_bv_valid(64, 96, 16, 16, 0, -32)        # inside CTU row
    assert not ibc_bv_valid(256, 0, 16, 16, -224, 0)   # beyond buffer
    assert not ibc_bv_valid(16, 0, 16, 16, -32, 0)     # off frame left


def sc_frame(w, h, seed=3):
    """Screen content: repeated 16x16 glyph tiles."""
    rng = np.random.RandomState(seed)
    glyphs = [rng.randint(0, 255, (16, 16)) for _ in range(6)]
    lay = np.random.RandomState(9)
    y = np.zeros((h, w), np.int32)
    for by in range(h // 16):
        for bx in range(w // 16):
            y[by * 16:(by + 1) * 16,
              bx * 16:(bx + 1) * 16] = glyphs[lay.randint(0, 6)]
    u = np.full((h // 2, w // 2), 110, np.int32)
    v = np.full((h // 2, w // 2), 140, np.int32)
    return FramePlanes(y, u, v)


def encode_decode(src, w, h, qp=27, ibc=2, **kw):
    base = dict(width=w, height=h, qp=qp, gop_len=0, intra_period=1,
                sao_type=0, alf_type=0, deblock_enable=False,
                rdoq_enable=False, signhide_enable=True, dep_quant=False,
                wpp=False, ibc=ibc)
    base.update(kw)
    cfg = Config(**base)
    ctrl = EncoderControl(cfg)
    fs = FrameState(qp=qp)
    enc = SliceEncoder(cfg, ctrl, open_loop=True)
    au, rec = enc.encode_frame(fs, src)
    dec_rec, info = decode_au(au, cfg, ctrl, fs)
    np.testing.assert_array_equal(dec_rec.y, rec.y)
    np.testing.assert_array_equal(dec_rec.u, rec.u)
    np.testing.assert_array_equal(dec_rec.v, rec.v)
    assert info["checksum_ok"] is True
    return au


def test_ibc_screen_content_roundtrip_and_gain():
    """IBC must be selected on screen content, round-trip bit-exactly,
    and reduce the bitrate vs the same encode without IBC."""
    import uvg266_tpu.control.encoder as em
    src = sc_frame(256, 128)
    won = [0]
    orig = em.try_ibc_cu

    def spy(cu, *a, **kw):
        orig(cu, *a, **kw)
        if cu.type == 3:
            won[0] += 1
    em.try_ibc_cu = spy
    try:
        au_ibc = encode_decode(src, 256, 128, ibc=2)
    finally:
        em.try_ibc_cu = orig
    au_off = encode_decode(src, 256, 128, ibc=0)
    assert won[0] > 0, "no CU selected IBC on exact-repeat content"
    assert len(au_ibc) < len(au_off), \
        f"IBC did not reduce bits ({len(au_ibc)} vs {len(au_off)})"


def test_ibc_with_filters():
    src = sc_frame(128, 128, seed=5)
    encode_decode(src, 128, 128, ibc=2, deblock_enable=True, sao_type=3)


def test_ibc_with_rdoq():
    src = sc_frame(128, 64, seed=6)
    encode_decode(src, 128, 64, ibc=2, rdoq_enable=True)
