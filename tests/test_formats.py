"""Format registry invariants (mirrors reference detex.h bit semantics)."""

from detex_tpu import formats as F


def test_pixel_sizes():
    assert F.pixel_size(F.RGBA8) == 4
    assert F.pixel_size(F.RGB8) == 3
    assert F.pixel_size(F.R8) == 1
    assert F.pixel_size(F.RG16) == 4
    assert F.pixel_size(F.FLOAT_RGBX16) == 8
    assert F.pixel_size(F.FLOAT_RGBA32) == 16


def test_component_counts():
    assert F.num_components(F.R8) == 1
    assert F.num_components(F.RG8) == 2
    assert F.num_components(F.RGB8) == 3
    assert F.num_components(F.RGBA8) == 4
    # RGBX formats: 3 components in a 4-byte pixel
    assert F.num_components(F.RGBX8) == 3
    assert F.pixel_size(F.RGBX8) == 4


def test_texture_format_encoding():
    # Values must match the reference enum exactly (verified against a
    # compiled dump of detex.h at generation time).
    assert F.BC1 == 16778016
    assert F.BPTC == 192938804
    assert F.ETC2_EAC == 260047668
    assert F.EAC_SIGNED_RG11 == 327160593
    assert F.BPTC_FLOAT == 159393569


def test_block_sizes():
    assert F.block_size_bytes(F.BC1) == 8
    assert F.block_size_bytes(F.BC3) == 16
    assert F.block_size_bytes(F.BPTC) == 16
    assert F.block_size_bytes(F.ETC1) == 8
    assert F.block_size_bytes(F.EAC_RG11) == 16


def test_decoded_pixel_formats():
    assert F.texture_pixel_format(F.BC1) == F.RGBX8
    assert F.texture_pixel_format(F.BC1A) == F.RGBA8
    assert F.texture_pixel_format(F.RGTC1) == F.R8
    assert F.texture_pixel_format(F.SIGNED_RGTC1) == F.SIGNED_R16
    assert F.texture_pixel_format(F.EAC_R11) == F.R16
    assert F.texture_pixel_format(F.BPTC_FLOAT) == F.FLOAT_RGBX16


def test_registry_lookup():
    assert F.lookup("BPTC").fmt == F.BPTC
    assert F.lookup(F.BC1).name == "BC1"
    assert len(F.BY_NAME) == 19


def test_rgba16_header_quirk():
    # The reference header swaps FLOAT_RGBA16 / FLOAT_RGBA16_HDR
    # (detex.h:249-263); we must reproduce the numeric values.
    assert F.FLOAT_RGBA16 == 26421
    assert F.FLOAT_RGBA16_HDR == 10037
