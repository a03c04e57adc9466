"""GetMode/SetMode parity vs the compiled C reference."""

import ctypes

import numpy as np
import pytest

import refbind_path_setup  # noqa: F401
from detex_tpu.ops import modes

N = 2048

# family -> (block bytes, reference symbol suffix, set modes to try)
CASES = {
    "BC1": (8, "BC1", [0, 1]),
    "ETC1": (8, "ETC1", [0, 1]),
    "ETC2": (8, "ETC2", [0, 1, 2, 3, 4]),
    "ETC2_EAC": (16, "ETC2_EAC", [0, 1, 2, 3, 4]),
    "ETC2_PUNCHTHROUGH": (8, "ETC2_PUNCHTHROUGH", None),
    "BPTC": (16, "BPTC", [0, 1, 2, 3, 4, 5, 6, 7]),
    "BPTC_FLOAT": (16, "BPTC_FLOAT", list(range(14))),
}


@pytest.fixture(scope="module")
def ref():
    from refbind import Reference
    return Reference()


def _ref_get_mode(ref, suffix, blocks):
    fn = getattr(ref.lib, f"detexGetMode{suffix}")
    fn.restype = ctypes.c_uint32
    fn.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
    out = np.empty(blocks.shape[0], np.uint32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    for i in range(blocks.shape[0]):
        out[i] = fn(blocks[i].ctypes.data_as(u8p))
    return out


def _ref_set_mode(ref, suffix, blocks, mode, flags=0):
    fn = getattr(ref.lib, f"detexSetMode{suffix}")
    fn.restype = None
    fn.argtypes = [ctypes.POINTER(ctypes.c_uint8), ctypes.c_uint32,
                   ctypes.c_uint32, ctypes.POINTER(ctypes.c_uint32)]
    out = np.ascontiguousarray(blocks).copy()
    u8p = ctypes.POINTER(ctypes.c_uint8)
    for i in range(out.shape[0]):
        fn(out[i].ctypes.data_as(u8p), mode, flags, None)
    return out


@pytest.mark.parametrize("family", sorted(CASES))
def test_get_mode(ref, family):
    bs, suffix, _ = CASES[family]
    rng = np.random.default_rng(99)
    blocks = rng.integers(0, 256, (N, bs), np.uint8)
    ours = modes.GET_MODE[family](blocks)
    theirs = _ref_get_mode(ref, suffix, blocks)
    np.testing.assert_array_equal(ours, theirs)


@pytest.mark.parametrize("family", sorted(CASES))
def test_set_mode(ref, family):
    bs, suffix, set_modes = CASES[family]
    rng = np.random.default_rng(7)
    blocks = rng.integers(0, 256, (N, bs), np.uint8)
    if family == "ETC2_PUNCHTHROUGH":
        from detex_tpu import formats as F
        for flags in (F.FLAG_OPAQUE_ONLY, F.FLAG_NON_OPAQUE_ONLY, 2 | 4):
            ours = modes.set_mode_etc2_punchthrough(blocks, 0, flags)
            theirs = _ref_set_mode(ref, suffix, blocks, 0, flags)
            np.testing.assert_array_equal(ours, theirs,
                                          err_msg=f"flags={flags}")
        return
    for mode in set_modes:
        ours = modes.SET_MODE[family](blocks, mode)
        theirs = _ref_set_mode(ref, suffix, blocks, mode)
        np.testing.assert_array_equal(ours, theirs,
                                      err_msg=f"{family} mode={mode}")
