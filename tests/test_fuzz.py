"""Cross-implementation fuzz: the jnp decoders and the native C++ host
runtime must agree bit-for-bit on random bitstrings — two independent
implementations derived from the same reference semantics (SURVEY.md §4
property-test strategy).  Larger batches than the stored goldens, plus
random mode_mask/flags draws."""

import numpy as np
import pytest

from detex_tpu import native
from tests.test_blocks import FAMILIES, run_decoder

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")

_N = 8192


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
        out_j, valid_j = run_decoder(family, blocks, mm, fl)
        out_n, valid_n = native.decode(family, blocks, mm, fl)
        out_n = np.where(valid_n[:, None], out_n, 0).astype(np.uint8)
        np.testing.assert_array_equal(valid_j, valid_n,
                                      err_msg=f"{family} mm={mm:#x} fl={fl}")
        np.testing.assert_array_equal(out_j, out_n,
                                      err_msg=f"{family} mm={mm:#x} fl={fl}")
