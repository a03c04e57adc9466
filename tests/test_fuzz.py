"""Cross-implementation fuzz: the jnp decoders and the native C++ host
runtime must agree bit-for-bit on random bitstrings — two independent
implementations derived from the same reference semantics (SURVEY.md §4
property-test strategy).  Larger batches than the stored goldens, plus
a structured (mode_mask, flags) matrix (VERDICT r2 item 8):

  * BC7: the FULL cross of all 8 single-mode masks x the
    ENCODE/OPAQUE_ONLY/NON_OPAQUE_ONLY flag regimes — the mode-gating
    matrix of decompress-bptc.c:363-369.
  * BC6H: all 14 single-mode masks (decompress-bptc-float.c:23-33).
  * ETC family: an overflow-biased block pool hitting the 5-bit
    differential overflow edges that select T/H/planar modes
    (decompress-etc.c:111-122, 321-367), crossed with the opaque
    flags (punchthrough dispatch, decompress-etc.c:653-717).
  * every family: random masks/flags draws on top.
"""

import numpy as np
import pytest

from detex_tpu import formats as F
from detex_tpu import native
from tests.test_blocks import run_decoder

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")

_N = 8192
_N_MATRIX = 1024

_FLAG_REGIMES = [0, F.FLAG_ENCODE, F.FLAG_OPAQUE_ONLY,
                 F.FLAG_NON_OPAQUE_ONLY,
                 F.FLAG_ENCODE | F.FLAG_OPAQUE_ONLY,
                 F.FLAG_ENCODE | F.FLAG_NON_OPAQUE_ONLY]


def _etc_overflow_blocks(rng, n, bb):
    """Random blocks biased to the ETC2 mode-selection overflow edges:
    each of bytes 0..2 (R/G/B base+diff) is drawn from patterns where
    base5 + diff3 leaves [0, 31] (decompress-etc.c:111-122), and the
    diff/flip bits cycle all four combinations."""
    blocks = rng.integers(0, 256, (n, bb), np.uint8)
    base = np.array([0, 1, 2, 29, 30, 31], np.uint8)
    diff = np.array([4, 5, 6, 7, 2, 3], np.uint8)  # 4..7 = negative
    for byte in range(3):
        b5 = base[rng.integers(0, base.size, n)]
        d3 = diff[rng.integers(0, diff.size, n)]
        blocks[:, byte] = (b5 << 3) | d3
    blocks[:, 3] = (blocks[:, 3] & 0xFC) | rng.integers(0, 4, n) \
        .astype(np.uint8)
    return blocks


def _check(family, blocks, mm, fl):
    out_j, valid_j = run_decoder(family, blocks, mm, fl)
    out_n, valid_n = native.decode(family, blocks, mm, fl)
    out_n = np.where(valid_n[:, None], out_n, 0).astype(np.uint8)
    np.testing.assert_array_equal(valid_j, valid_n,
                                  err_msg=f"{family} mm={mm:#x} fl={fl}")
    np.testing.assert_array_equal(out_j, out_n,
                                  err_msg=f"{family} mm={mm:#x} fl={fl}")


@pytest.mark.parametrize("family", sorted(native.FAMILIES))
def test_fuzz_jnp_vs_native(family):
    bb, _ = native.family_info(family)
    rng = np.random.default_rng(abs(hash(family)) % (2**32))
    blocks = rng.integers(0, 256, (_N, bb), np.uint8)
    for trial in range(3):
        if trial == 0:
            mm, fl = 0xFFFFFFFF, 0
        else:
            mm = int(rng.integers(0, 2**32))
            fl = int(rng.integers(0, 8))
        _check(family, blocks, mm, fl)


def test_fuzz_bc7_mode_flag_matrix():
    """All 8 single-mode masks x all flag regimes, with blocks whose
    mode prefixes are uniformly distributed so every (mask, mode)
    gate combination fires (decompress-bptc.c:363-369)."""
    rng = np.random.default_rng(0xB7)
    blocks = rng.integers(0, 256, (_N_MATRIX, 16), np.uint8)
    modes = rng.integers(0, 8, _N_MATRIX)
    blocks[:, 0] = ((1 << modes) | (blocks[:, 0]
                    & (0xFF << (modes + 1)))).astype(np.uint8)
    for mode in range(8):
        for fl in _FLAG_REGIMES:
            _check("BPTC", blocks, 1 << mode, fl)
    _check("BPTC", blocks, 0x2AAA, F.FLAG_ENCODE)


def test_fuzz_bc6h_mode_matrix():
    """All 14 single-mode masks for BC6H, both signednesses
    (decompress-bptc-float.c:23-33 mode map)."""
    rng = np.random.default_rng(0xB6)
    blocks = rng.integers(0, 256, (_N_MATRIX, 16), np.uint8)
    for family in ("BPTC_FLOAT", "BPTC_SIGNED_FLOAT"):
        for mode in range(14):
            _check(family, blocks, 1 << mode, 0)


@pytest.mark.parametrize("family", ["ETC1", "ETC2",
                                    "ETC2_PUNCHTHROUGH", "ETC2_EAC"])
def test_fuzz_etc_overflow_edges(family):
    """Overflow-biased bitstrings cross the T/H/planar selection edges
    and the punchthrough opaque-bit dispatch."""
    bb, _ = native.family_info(family)
    rng = np.random.default_rng(abs(hash("ovf" + family)) % (2**32))
    blocks = _etc_overflow_blocks(rng, _N_MATRIX, bb)
    for fl in (0, F.FLAG_OPAQUE_ONLY, F.FLAG_NON_OPAQUE_ONLY):
        _check(family, blocks, 0xFFFFFFFF, fl)
    _check(family, blocks, int(rng.integers(0, 2**32)), 0)
