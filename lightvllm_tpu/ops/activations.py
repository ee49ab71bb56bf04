"""Activation ops.

Parity: reference `lightvllm/layers/activation.py:31-48` (SiluAndMul over a
fused gate_up projection, fp32 math) and the CUDA/Triton swiglu kernels
(`kernels/cuda_kernels/activation.cu:29-54`, `kernels/triton_kernels/
activation.py:29-77`). XLA fuses this elementwise chain into the surrounding
matmuls; a Pallas variant lives in ops/pallas/ for parity with the
reference's pluggable-backend design.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lightvllm_tpu.ops import backend


def swiglu(gate: jnp.ndarray, up: jnp.ndarray) -> jnp.ndarray:
    """SwiGLU: SiLU(gate) * up, fp32 math."""
    if backend.use_pallas():
        from lightvllm_tpu.ops.pallas.elementwise import swiglu_pallas

        return swiglu_pallas(gate, up)
    gf = gate.astype(jnp.float32)
    return (gf * jax.nn.sigmoid(gf) * up.astype(jnp.float32)).astype(gate.dtype)


def silu_and_mul(gate_up: jnp.ndarray) -> jnp.ndarray:
    """SwiGLU over a packed [gate | up] tensor (reference activation.py:7)."""
    gate, up = jnp.split(gate_up, 2, axis=-1)
    return swiglu(gate, up)
