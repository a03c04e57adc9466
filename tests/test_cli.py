"""CLI converter tests (behavior parity with detex-convert.c)."""

import numpy as np
import pytest

from detex_tpu import engine
from detex_tpu import formats as F
from detex_tpu import io as tio
from detex_tpu.cli.convert import main

REF = "/root/reference"


def test_decompress_to_ktx(tmp_path):
    # -d: BC1 -> RGB8 (RGBX8 fixup, detex-convert.c:283-286)
    out = tmp_path / "out.ktx"
    assert main(["-q", "-d", f"{REF}/test-texture-BC1.ktx", str(out)]) == 0
    texs = tio.load_ktx(str(out))
    assert texs[0].format == F.RGB8
    src = tio.load_ktx(f"{REF}/test-texture-BC1.ktx")[0]
    expect = engine.decompress_texture_linear(src, F.RGB8)
    np.testing.assert_array_equal(texs[0].data, expect)


def test_decompress_bc6h_to_ktx(tmp_path):
    # FLOAT_RGBX16 -> FLOAT_RGB16 fixup
    out = tmp_path / "out.ktx"
    assert main(["-q", "-d", f"{REF}/test-texture-BPTC_FLOAT.ktx",
                 str(out)]) == 0
    assert tio.load_ktx(str(out))[0].format == F.FLOAT_RGB16


def test_compressed_to_png_implicit_decompress(tmp_path):
    out = tmp_path / "out.png"
    assert main(["-q", f"{REF}/test-texture-ETC2.ktx", str(out)]) == 0
    tex = tio.load_png(str(out))
    assert tex.format == F.RGB8 and tex.width == 64


def test_passthrough_ktx_to_dds(tmp_path):
    out = tmp_path / "out.dds"
    assert main(["-q", f"{REF}/test-texture-BC3.ktx", str(out)]) == 0
    texs = tio.load_dds(str(out))
    src = tio.load_ktx(f"{REF}/test-texture-BC3.ktx")[0]
    assert texs[0].format == F.BC3
    np.testing.assert_array_equal(texs[0].data, src.data)


def test_explicit_output_format(tmp_path):
    out = tmp_path / "out.ktx"
    assert main(["-q", "-f", "RGBA8", f"{REF}/test-texture-BC2.ktx",
                 str(out)]) == 0
    texs = tio.load_ktx(str(out))
    assert texs[0].format == F.RGBA8


def test_raw_output(tmp_path):
    out = tmp_path / "out.raw"
    assert main(["-q", "-f", "RGBA8", f"{REF}/test-texture-BC1.ktx",
                 str(out)]) == 0
    src = tio.load_ktx(f"{REF}/test-texture-BC1.ktx")[0]
    expect = engine.decompress_texture_linear(src, F.RGBA8)
    got = np.fromfile(out, dtype=np.uint8)
    np.testing.assert_array_equal(got, expect)


def test_view_app(tmp_path):
    from detex_tpu.cli.view import main as view_main
    out = tmp_path / "v.png"
    assert view_main([f"{REF}/test-texture-BPTC.ktx", "-o", str(out),
                      "-z", "2"]) == 0
    tex = tio.load_png(str(out))
    assert tex.width == 128 and tex.height == 128


def test_validate_app(tmp_path):
    from detex_tpu.cli.validate import main as validate_main
    out = tmp_path / "sheet.png"
    assert validate_main(["-q", "-o", str(out)]) == 0
    assert out.exists()


def test_bad_format_name():
    with pytest.raises(SystemExit):
        main(["-q", "-f", "NOPE", "a.ktx", "b.ktx"])


def test_compress_rejected(tmp_path):
    with pytest.raises(SystemExit):
        main(["-q", "-f", "BC1", f"{REF}/test-texture-RGB8.ktx",
              str(tmp_path / "x.ktx")])

def test_validate_fuzz_families(capsys):
    """dtx-validate --fuzz: the randomized device-vs-oracle sweep
    (round 5) — tiny N on CPU, all families bit-exact."""
    from detex_tpu.cli.validate import fuzz_families
    msgs = []
    n_fail = fuzz_families(128, msgs.append, chunk=128)
    assert n_fail == 0, msgs
    assert len(msgs) == 19
