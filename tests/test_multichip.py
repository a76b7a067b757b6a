"""Multi-chip mesh encode: byte-identical to the single-device encode.

The real encoder's phase-1 search runs sharded over a ('gop','tile')
mesh (uvg266_tpu.parallel.mesh): each device searches one tile's CU
batch, two frames ride the 'gop' axis per dispatch, per-frame RD stats
are psum'd over 'tile'. Finalize + per-tile CABAC substreams run on host
unchanged, so the output must be byte-identical to the plain Encoder
with the same config (reference analogue: encoder.c tile geometry +
encoderstate.c owf; VERDICT round-1 item #7).

Runs on the virtual 8-device CPU mesh from conftest.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")

from uvg266_tpu.cfg import Config
from uvg266_tpu.control.encoder import Encoder, FramePlanes
from uvg266_tpu.parallel import MeshEncoder, build_mesh


def mkframe(w, h, i):
    rng = np.random.default_rng(40 + i)
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    y = np.clip((xx * 2 + yy + i * 17) % 255
                + rng.integers(-20, 21, (h, w)), 0, 255).astype(np.int32)
    u = (y[::2, ::2] // 2 + 40).astype(np.int32)
    v = (y[::2, ::2] // 3 + 60).astype(np.int32)
    return FramePlanes(y, u, v)


def encode_single(cfg, frames):
    enc = Encoder(cfg)
    out = []
    for f in frames:
        for (au, rec, _fs, _rl, _src) in enc.feed(f):
            out.append((au, rec))
    for (au, rec, _fs, _rl, _src) in enc.flush():
        out.append((au, rec))
    return out


@pytest.mark.parametrize("tools", [
    {},
    {"mip": True, "sao_type": 3, "deblock_enable": True},
])
def test_mesh_encode_byte_identical(tools):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = Config(width=256, height=128, qp=32, gop_len=0, intra_period=1,
                 tiles_width_count=2, tiles_height_count=2, wpp=False,
                 **tools)
    frames = [mkframe(256, 128, i) for i in range(3)]

    ref = encode_single(cfg, frames)

    mesh = build_mesh(8)            # ('gop','tile') = (2, 4)
    assert mesh.shape["tile"] == 4 and mesh.shape["gop"] == 2
    menc = MeshEncoder(Config(width=256, height=128, qp=32, gop_len=0, intra_period=1,
                              tiles_width_count=2, tiles_height_count=2,
                              wpp=False, **tools), mesh)
    got = menc.encode(frames)

    assert len(got) == len(ref) == 3
    for i, ((au_m, rec_m), (au_s, rec_s)) in enumerate(zip(got, ref)):
        assert au_m == au_s, f"frame {i}: bitstream differs"
        assert np.array_equal(rec_m.y, rec_s.y)
    # psum'd per-frame RD stats reached the host RC path
    assert len(menc.frame_rd_stats) == 3
    assert all(s > 0 for s in menc.frame_rd_stats)
