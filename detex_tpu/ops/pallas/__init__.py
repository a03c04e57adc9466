"""Pallas TPU kernels for the hot block-decode paths.

Each kernel is a fused single-pass decoder: compressed words stream
HBM -> VMEM once, ALL compute runs on the VPU (funnel shifts, balanced
select trees over packed/compressed tables, SWAR lane arithmetic), and
decoded pixels stream back out once.  Layout is word-planar: words
(k, N) int32 in, pixels (16, N) int32 out, with the block/batch axis
on TPU lanes.

The MXU is not used: every table is compressed into select trees /
packed words / arithmetic derivations instead (see each module's
docstring for which).  One-hot-matmul gathers are the candidate
alternative; see PROFILE.md "MXU offload experiment" for the measured
comparison.

On non-TPU backends the kernels run through the Pallas interpreter so
the same code path is testable bit-for-bit on CPU.
"""

from __future__ import annotations

import jax

__all__ = ["use_interpret"]


def use_interpret() -> bool:
    """Interpret Pallas kernels unless running on real TPU hardware."""
    return jax.default_backend() != "tpu"
