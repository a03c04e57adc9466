"""File-I/O tests: corpus loads match the reference loader; KTX/DDS
round-trips are lossless."""

from pathlib import Path

import numpy as np
import pytest

from detex_tpu import formats as F
from detex_tpu import io as tio

REF = Path("/root/reference")

# corpus file -> family name (validate.c:31-57)
CORPUS_KTX = {
    "test-texture-BC1.ktx": "BC1",
    "test-texture-BC1A.ktx": "BC1A",
    "test-texture-BC2.ktx": "BC2",
    "test-texture-BC3.ktx": "BC3",
    "test-texture-RGTC1.ktx": "RGTC1",
    "test-texture-SIGNED_RGTC1.ktx": "SIGNED_RGTC1",
    "test-texture-RGTC2.ktx": "RGTC2",
    "test-texture-SIGNED_RGTC2.ktx": "SIGNED_RGTC2",
    "test-texture-BPTC.ktx": "BPTC",
    "test-texture-BPTC_FLOAT.ktx": "BPTC_FLOAT",
    "test-texture-ETC1.ktx": "ETC1",
    "test-texture-ETC2.ktx": "ETC2",
    "test-texture-ETC2_PUNCHTHROUGH.ktx": "ETC2_PUNCHTHROUGH",
    "test-texture-ETC2_EAC.ktx": "ETC2_EAC",
    "test-texture-EAC_R11.ktx": "EAC_R11",
    "test-texture-EAC_SIGNED_R11.ktx": "EAC_SIGNED_R11",
    "test-texture-EAC_RG11.ktx": "EAC_RG11",
}


@pytest.mark.parametrize("fname,family", sorted(CORPUS_KTX.items()))
def test_ktx_corpus_load(golden, fname, family):
    g = golden(family)
    texs = tio.load_ktx(str(REF / fname))
    tex = texs[0]
    assert tex.format == F.BY_NAME[family].fmt
    assert tex.width == int(g["width"]) and tex.height == int(g["height"])
    np.testing.assert_array_equal(
        tex.data, g["corpus_blocks"].reshape(-1))


@pytest.mark.parametrize("fname", ["test-texture-RGB8.ktx",
                                   "test-texture-RGBA8.ktx",
                                   "test-texture-FLOAT_RGB16.ktx",
                                   "test-texture-FLOAT_RGBA16.ktx"])
def test_ktx_uncompressed_load(fname):
    texs = tio.load_ktx(str(REF / fname))
    tex = texs[0]
    assert tex.width == 64 and tex.height == 64
    assert tex.data.size == 64 * 64 * F.pixel_size(tex.format)


@pytest.mark.parametrize("fname", ["test-texture-RGB8.dds",
                                   "test-texture-RGBA8.dds"])
def test_dds_load(fname):
    texs = tio.load_dds(str(REF / fname))
    tex = texs[0]
    assert tex.width == 64 and tex.height == 64


def test_ktx_roundtrip(tmp_path):
    texs = tio.load_ktx(str(REF / "test-texture-BPTC.ktx"))
    out = tmp_path / "rt.ktx"
    tio.save_ktx(texs, str(out))
    texs2 = tio.load_ktx(str(out))
    assert texs2[0].format == texs[0].format
    np.testing.assert_array_equal(texs2[0].data, texs[0].data)


def test_ktx_roundtrip_unaligned_rows(tmp_path):
    # RGB8 (3 bytes/pixel) exercises the 32-bit row alignment path
    # (ktx.c:301-323).
    texs = tio.load_ktx(str(REF / "test-texture-RGB8.ktx"))
    out = tmp_path / "rt.ktx"
    tio.save_ktx(texs, str(out))
    texs2 = tio.load_ktx(str(out))
    np.testing.assert_array_equal(texs2[0].data, texs[0].data)


def test_dds_roundtrip(tmp_path):
    for name in ("test-texture-RGB8.dds", "test-texture-RGBA8.dds"):
        texs = tio.load_dds(str(REF / name))
        out = tmp_path / "rt.dds"
        tio.save_dds(texs, str(out))
        texs2 = tio.load_dds(str(out))
        assert texs2[0].format == texs[0].format
        np.testing.assert_array_equal(texs2[0].data, texs[0].data)


def test_cross_save_ktx_to_dds(tmp_path):
    texs = tio.load_ktx(str(REF / "test-texture-BC3.ktx"))
    out = tmp_path / "x.dds"
    tio.save_dds(texs, str(out))
    texs2 = tio.load_dds(str(out))
    assert texs2[0].format == F.BC3
    np.testing.assert_array_equal(texs2[0].data, texs[0].data)


def test_png_roundtrip(tmp_path):
    tex = tio.load_png(str(REF / "test-texture.png"))
    assert tex.format in (F.RGB8, F.RGBA8)
    out = tmp_path / "rt.png"
    tio.save_png(tex, str(out))
    tex2 = tio.load_png(str(out))
    assert tex2.format == tex.format
    np.testing.assert_array_equal(tex2.data, tex.data)


def test_png_transparent(tmp_path):
    tex = tio.load_png(str(REF / "test-texture-transparent.png"))
    assert tex.format == F.RGBA8


def test_raw_roundtrip(tmp_path):
    texs = tio.load_ktx(str(REF / "test-texture-BC1.ktx"))
    out = tmp_path / "t.raw"
    tio.save_raw(texs[0], str(out))
    tex2 = tio.load_raw(str(out), texs[0])
    np.testing.assert_array_equal(tex2.data, texs[0].data)


def test_extension_dispatch():
    texs = tio.load_texture_file(str(REF / "test-texture-BC1.ktx"))
    assert texs[0].format == F.BC1
    with pytest.raises(tio.TextureFileError):
        tio.load_texture_file("nope.xyz")


def test_ktx_orientation_metadata(tmp_path):
    """KTXorientation key block (reference ktx.c:190-272): written
    when requested, skipped transparently by both readers."""
    from detex_tpu.io.ktx import ORIENTATION_DOWN, load_ktx, save_ktx
    from detex_tpu.texture import Texture
    rng = np.random.default_rng(4)
    data = rng.integers(0, 256, 8 * 8 * 4, np.uint8)
    tex = Texture(F.RGBA8, data, 8, 8, 0, 0)
    path = tmp_path / "o.ktx"
    save_ktx([tex], str(path), orientation=ORIENTATION_DOWN)
    raw = path.read_bytes()
    assert raw[60:64] == (28).to_bytes(4, "little")   # header[15]
    assert b"KTXorientation" in raw[:96]
    back = load_ktx(str(path))[0]
    np.testing.assert_array_equal(back.data, data)


def test_named_signed_float_constants():
    """detex.h:284-306 named constants exist with the reference's
    bit-encoded values."""
    assert F.FLOAT_BGRX16_HDR == (F.FLOAT_BGRX16 | 0x4000)
    assert F.SIGNED_FLOAT_RGBX16 == (F.FLOAT_RGBX16 | 0x1000)
    assert F.SIGNED_FLOAT_BGRX16 == (F.FLOAT_BGRX16 | 0x1000)
    from detex_tpu import formats as FF
    assert FF.texture_pixel_format(FF.BPTC_SIGNED_FLOAT) \
        == FF.SIGNED_FLOAT_RGBX16
