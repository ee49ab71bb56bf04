"""Elementwise-kernel backend switch.

Parity: reference `Config.kernel_backend` (config.py:32), which selects the
SiluAndMul implementation (native / triton / cuda, activation.py:40-48).
Here "native" is the jnp path (XLA fuses the elementwise chains into the
surrounding matmuls — usually optimal) and "pallas" selects the explicit
kernels in ops/pallas/elementwise.py. Resolved at trace time, like the
reference resolves at module construction.
"""

from __future__ import annotations

KERNEL_BACKEND = "native"  # "native" | "pallas"


def set_kernel_backend(name: str) -> None:
    global KERNEL_BACKEND
    assert name in ("native", "pallas"), name
    KERNEL_BACKEND = name


def use_pallas() -> bool:
    return KERNEL_BACKEND == "pallas"
