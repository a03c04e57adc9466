"""Bit-exact golden tests for the pixel-conversion engine and the
full-texture decode engine."""

import numpy as np
import pytest

from detex_tpu import convert as C
from detex_tpu import engine
from detex_tpu import formats as F
from detex_tpu import hdr
from detex_tpu.texture import Texture


def test_convert_pairs_bit_exact(golden):
    g = golden("convert")
    n_pairs = int(g["n_pairs"])
    n_px = int(g["n_pixels"])
    failures = []
    for i in range(n_pairs):
        src_fmt = int(g[f"pair{i}_src_fmt"])
        dst_fmt = int(g[f"pair{i}_dst_fmt"])
        out = C.convert_pixels(g[f"pair{i}_src"], n_px, src_fmt, dst_fmt)
        if not np.array_equal(out, g[f"pair{i}_out"]):
            bad = int((out != g[f"pair{i}_out"]).sum())
            failures.append(
                f"{F.format_name(src_fmt)}->{F.format_name(dst_fmt)}"
                f" ({bad}/{out.size} bytes)")
    assert not failures, f"mismatched conversions: {failures}"


def test_convert_hdr_variants(golden):
    g = golden("convert")
    for vi in range(int(g["n_hdr"])):
        gamma, rmin, rmax = (float(x) for x in g[f"hdr{vi}_params"])
        hdr.set_hdr_parameters(gamma, rmin, rmax)
        try:
            out = C.convert_pixels(g[f"hdr{vi}_src"], int(g["n_pixels"]),
                                   F.FLOAT_RGBX16_HDR, F.RGBX16)
            np.testing.assert_array_equal(
                out, g[f"hdr{vi}_out"],
                err_msg=f"hdr variant {vi} ({gamma},{rmin},{rmax})")
            if f"hdr{vi}_src32" in g:
                out32 = C.convert_pixels(
                    g[f"hdr{vi}_src32"], int(g["n_pixels"]),
                    F.FLOAT_RGBX32_HDR, F.FLOAT_RGBX32)
                np.testing.assert_array_equal(
                    out32, g[f"hdr{vi}_out32"],
                    err_msg=f"hdr f32 variant {vi} "
                            f"({gamma},{rmin},{rmax})")
        finally:
            hdr.set_hdr_parameters(1.0, 0.0, 1.0)


def test_no_path_raises():
    with pytest.raises(C.ConversionError):
        C.convert_pixels(np.zeros(4, np.uint8), 1, F.A8, F.FLOAT_RGBA32)


FAMILIES_WITH_TEXTURE_GOLDEN = [
    "BC1", "BC1A", "BC2", "BC3", "RGTC1", "RGTC2", "SIGNED_RGTC1",
    "SIGNED_RGTC2", "BPTC", "BPTC_FLOAT", "ETC1", "ETC2",
    "ETC2_PUNCHTHROUGH", "ETC2_EAC", "EAC_R11", "EAC_SIGNED_R11",
    "EAC_RG11",
]


@pytest.mark.parametrize("family", FAMILIES_WITH_TEXTURE_GOLDEN)
def test_decompress_texture_linear(golden, family):
    g = golden(family)
    info = F.BY_NAME[family]
    w, h = int(g["width"]), int(g["height"])
    tex = Texture.new(info.fmt, g["corpus_blocks"].reshape(-1), w, h)
    native = engine.decompress_texture_linear(tex)
    np.testing.assert_array_equal(native, g["texture_native"],
                                  err_msg=f"{family} native texture")
    if "texture_rgba8" in g:
        rgba = engine.decompress_texture_linear(tex, F.RGBA8)
        np.testing.assert_array_equal(rgba, g["texture_rgba8"],
                                      err_msg=f"{family} RGBA8 texture")


def test_decompress_partial_edge_blocks(golden):
    # A 10x6 texture: 3x2 blocks with cropped edges, vs the reference.
    import refbind_path_setup  # noqa: F401  (adds tools/ to sys.path)
    from refbind import Reference
    g = golden("BC1")
    blocks = g["corpus_blocks"][:6]
    tex = Texture.new(F.BC1, blocks.reshape(-1), 10, 6)
    ours = engine.decompress_texture_linear(tex, F.RGBA8)
    ref = Reference()
    theirs = ref.decompress_texture_linear(F.BC1, blocks.reshape(-1),
                                           10, 6, F.RGBA8)
    np.testing.assert_array_equal(ours, theirs)


def test_decompress_uncompressed_passthrough():
    data = np.arange(64 * 3, dtype=np.uint8)
    tex = Texture.new(F.RGB8, data, 8, 8)
    out = engine.decompress_texture_linear(tex, F.RGBX8)
    px = out.reshape(64, 4)
    np.testing.assert_array_equal(px[:, :3], data.reshape(64, 3))
    assert (px[:, 3] == 0xFF).all()


def test_convert_pixels_in_place():
    import numpy as np

    from detex_tpu import convert as C
    from detex_tpu import formats as F
    rng = np.random.default_rng(0)
    buf = rng.integers(0, 256, 64 * 4, dtype=np.uint8)
    expected = C.convert_pixels(buf, 64, F.RGBA8, F.BGRA8)
    work = buf.copy()
    C.convert_pixels_in_place(work, 64, F.RGBA8, F.BGRA8)
    np.testing.assert_array_equal(work, expected)
    # size-changing conversions are rejected
    import pytest
    with pytest.raises(C.ConversionError):
        C.convert_pixels_in_place(work, 64, F.RGBA8, F.RGB8)
