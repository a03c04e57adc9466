"""Pallas TPU kernels for the hot block-decode paths.

Each kernel is a fused single-pass decoder: compressed words stream
HBM -> VMEM once, all bit plumbing runs on the VPU (funnel shifts,
select chains), small-table gathers ride the MXU as one-hot matmuls
(every table value fits in 8 bits, so even bf16-precision matmuls are
exact), and decoded pixels stream back out once.  Layout is
word-planar: words (k, N) int32 in, pixels (16, N) int32 out, with the
block/batch axis on TPU lanes.

On non-TPU backends the kernels run through the Pallas interpreter so
the same code path is testable bit-for-bit on CPU.
"""

from __future__ import annotations

import jax

__all__ = ["use_interpret"]


def use_interpret() -> bool:
    """Interpret Pallas kernels unless running on real TPU hardware."""
    return jax.default_backend() != "tpu"
