"""Native C++ host-runtime tests: the multithreaded CPU decoders must be
bit-exact against the same golden vectors as the JAX/Pallas kernels,
and the assembly helper must match the Python engine."""

import numpy as np
import pytest

from detex_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


@pytest.mark.parametrize("family", sorted(native.FAMILIES))
def test_native_decode_bit_exact(family, golden):
    g = golden(family)
    for prefix in ("corpus", "random"):
        if f"{prefix}_blocks" not in g:
            continue
        out, valid = native.decode(family, g[f"{prefix}_blocks"])
        out = np.where(valid[:, None], out, 0).astype(np.uint8)
        np.testing.assert_array_equal(valid, g[f"{prefix}_valid"],
                                      err_msg=f"{family} {prefix}")
        np.testing.assert_array_equal(out, g[f"{prefix}_out"],
                                      err_msg=f"{family} {prefix}")
    vi = 0
    while f"variant{vi}_out" in g:
        out, valid = native.decode(family, g["random_blocks"],
                                   int(g[f"variant{vi}_mask"]),
                                   int(g[f"variant{vi}_flags"]))
        out = np.where(valid[:, None], out, 0).astype(np.uint8)
        np.testing.assert_array_equal(valid, g[f"variant{vi}_valid"],
                                      err_msg=f"{family} v{vi}")
        np.testing.assert_array_equal(out, g[f"variant{vi}_out"],
                                      err_msg=f"{family} v{vi}")
        vi += 1


def test_native_multithreaded_matches_single(golden):
    g = golden("BPTC")
    blocks = np.tile(g["random_blocks"], (8, 1))
    out1, v1 = native.decode("BPTC", blocks, n_threads=1)
    out8, v8 = native.decode("BPTC", blocks, n_threads=8)
    np.testing.assert_array_equal(out1, out8)
    np.testing.assert_array_equal(v1, v8)


def test_native_backend_matches_jax_on_corpus():
    """engine.decompress_texture_linear(backend='native') must produce
    the same bytes as the JAX backend over real corpus textures."""
    from pathlib import Path

    from detex_tpu import engine
    from detex_tpu import io as tio
    ref = Path("/root/reference")
    files = ["test-texture-BC1.ktx", "test-texture-BPTC.ktx",
             "test-texture-ETC2_EAC.ktx", "test-texture-EAC_RG11.ktx",
             "test-texture-BPTC_FLOAT.ktx"]
    for name in files:
        path = ref / name
        if not path.exists():
            continue
        tex = tio.load_texture_file(str(path))[0]
        a = engine.decompress_texture_linear(tex, backend="jax")
        b = engine.decompress_texture_linear(tex, backend="native")
        np.testing.assert_array_equal(a, b, err_msg=name)


def test_native_assemble_linear_matches_engine():
    from detex_tpu.engine import _assemble_linear
    rng = np.random.default_rng(0)
    for (wb, hb, w, h, ps) in [(4, 4, 16, 16, 4), (5, 3, 18, 11, 2),
                               (1, 1, 3, 2, 8)]:
        bp = rng.integers(0, 256, (wb * hb, 16 * ps), np.uint8)
        ref = _assemble_linear(bp, wb, hb, w, h, ps)
        got = native.assemble_linear(bp, wb, hb, w, h, ps)
        np.testing.assert_array_equal(ref, got)
