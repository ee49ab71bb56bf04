"""Weight-only quantization numerics: quantize/dequant roundtrip bounds, the
jnp grouped matmul vs explicit dequant-then-matmul, and the fused Pallas
dequant+matmul kernel vs the jnp path (SURVEY.md §4 kernel-vs-oracle
pattern; the reference has no quantization at all, §2.10)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lightvllm_tpu.ops.pallas.quant_matmul import quant_matmul_pallas
from lightvllm_tpu.ops.quantization import (
    dequantize,
    matmul,
    quantize_weight,
    quantized_matmul,
)


@pytest.mark.parametrize("bits,tol", [(8, 0.02), (4, 0.3)])
def test_roundtrip_error_bounded(bits, tol):
    w = jax.random.normal(jax.random.PRNGKey(0), (256, 128), jnp.float32)
    qt = quantize_weight(w, bits)
    back = dequantize(qt, jnp.float32)
    # Symmetric quant: |err| <= scale/2 elementwise; check relative to amax.
    err = np.abs(np.asarray(back) - np.asarray(w)).max()
    assert err <= tol, err


@pytest.mark.parametrize("bits", [8, 4])
@pytest.mark.parametrize("T,In,Out", [(7, 256, 128), (64, 512, 384)])
def test_grouped_matmul_matches_dequant(bits, T, In, Out):
    kx, kw = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(kx, (T, In), jnp.float32)
    qt = quantize_weight(jax.random.normal(kw, (In, Out), jnp.float32), bits)
    want = x @ dequantize(qt, jnp.float32)
    got = quantized_matmul(x, qt)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("bits", [8, 4])
@pytest.mark.parametrize(
    "T,In,Out",
    [
        (1, 256, 128),  # decode-like single row
        (9, 1024, 256),  # odd T -> row padding
        (130, 512, 384),  # multi T-tile, non-pow2 out tiles
        (32, 3072, 256),  # multiple k steps (tile_k 2048)
    ],
)
def test_pallas_kernel_matches_jnp(bits, T, In, Out):
    kx, kw = jax.random.split(jax.random.PRNGKey(2))
    x = jax.random.normal(kx, (T, In), jnp.float32)
    qt = quantize_weight(jax.random.normal(kw, (In, Out), jnp.float32), bits)
    want = quantized_matmul(x, qt)
    got = quant_matmul_pallas(x, qt.data, qt.scale, bits=qt.bits, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_pallas_kernel_bf16_leading_dims():
    kx, kw = jax.random.split(jax.random.PRNGKey(3))
    x = jax.random.normal(kx, (2, 5, 256), jnp.bfloat16)
    qt = quantize_weight(jax.random.normal(kw, (256, 128), jnp.float32), 8)
    got = quant_matmul_pallas(x, qt.data, qt.scale, bits=qt.bits, interpret=True)
    assert got.shape == (2, 5, 128) and got.dtype == jnp.bfloat16
    # bf16 inputs: compare against the exact f32 product; kernel and jnp
    # paths round differently near zero but both track the exact result.
    exact = np.asarray(x, np.float32) @ np.asarray(dequantize(qt, jnp.float32))
    np.testing.assert_allclose(np.asarray(got, np.float32), exact, rtol=0.05, atol=0.5)


def test_matmul_dispatch_plain_and_quant():
    kx, kw = jax.random.split(jax.random.PRNGKey(4))
    x = jax.random.normal(kx, (4, 256), jnp.float32)
    w = jax.random.normal(kw, (256, 128), jnp.float32)
    plain = matmul(x, w)
    q = matmul(x, quantize_weight(w, 8))
    # int8 grouped quant should track the dense product closely.
    rel = np.abs(np.asarray(q) - np.asarray(plain)).max() / np.abs(
        np.asarray(plain)
    ).max()
    assert rel < 0.02, rel


def test_quant_matmul_tile_plan_fits_vmem():
    """Tile planning must keep the double-buffered weight window inside
    VMEM for every production shape — including the 8B int8 LM head
    (gsp=512, out=153600), where the decode fast path (TO=out) used to
    compile a 75 MB window at T <= 13 and blow the 128 MB budget."""
    from lightvllm_tpu.ops.pallas.quant_matmul import _plan_tiles, _pick_tile

    VMEM = 128 * 2**20
    shapes = [
        # (T, groups, gsp, out, gs) — gsp == stored rows (packed for int4)
        (8, 8, 512, 153600, 512),     # 8B int8 LM head, prefill last-tokens
        (8, 32, 128, 152064, 128),    # 0.6B tied head, tiny decode batch
        (32, 32, 128, 12288, 128),    # 8B ffn projection, decode
        (256, 32, 128, 12288, 128),   # prefill projection
        (8, 32, 64, 6144, 128),       # int4-packed qkv, tiny batch
    ]
    for T, groups, gsp, out, gs in shapes:
        TT = _pick_tile(-(-T // 8) * 8, 256)
        Tp = -(-T // TT) * TT
        TO, KG = _plan_tiles(Tp, TT, groups, gsp, out, 0, 2048, gs)
        assert out % TO == 0 and TO % 128 == 0
        assert groups % KG == 0
        w_window = KG * gsp * TO          # int8 bytes per weight tile
        acc = TT * TO * 4                 # f32 accumulator scratch
        x_tile = KG * TT * gs * 4
        assert 2 * (w_window + x_tile) + acc < VMEM // 2, (
            f"tile plan exceeds VMEM headroom: {(T, groups, gsp, out)} -> "
            f"TO={TO} KG={KG} ({2 * (w_window + x_tile) + acc} bytes)"
        )


def test_int4_clip_search_beats_absmax_on_outlier_rows():
    """A 100x in-row outlier sharing a quant group crushes the other rows'
    precision under plain absmax; the AWQ-style clip search must strictly
    reduce the group reconstruction error and stay exact-shape compatible."""
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (256, 128), jnp.float32) * 0.02
    w = w.at[5, :].mul(100.0)  # outlier row inside group 0
    plain = quantize_weight(w, 4, 128)
    clipped = quantize_weight(w, 4, 128, clip_search=True)
    assert clipped.data.shape == plain.data.shape
    assert clipped.scale.shape == plain.scale.shape
    err_plain = jnp.linalg.norm(dequantize(plain, jnp.float32) - w)
    err_clip = jnp.linalg.norm(dequantize(clipped, jnp.float32) - w)
    assert float(err_clip) < float(err_plain)
    # Clean weights: clip search must not be (meaningfully) worse.
    w2 = jax.random.normal(key, (256, 128), jnp.float32) * 0.02
    e1 = jnp.linalg.norm(dequantize(quantize_weight(w2, 4, 128), jnp.float32) - w2)
    e2 = jnp.linalg.norm(
        dequantize(quantize_weight(w2, 4, 128, clip_search=True), jnp.float32) - w2
    )
    assert float(e2) <= float(e1) * 1.001


def test_repack_offs_value_preserving():
    from lightvllm_tpu.ops.quantization import repack_offs, unpacked_data

    w = jax.random.normal(jax.random.PRNGKey(7), (512, 256), jnp.float32)
    qt = quantize_weight(w, 4)
    qo = repack_offs(qt)
    assert qo.packing == "offs" and qo.bits == 4
    np.testing.assert_array_equal(
        np.asarray(unpacked_data(qt)), np.asarray(unpacked_data(qo))
    )
    # idempotent
    assert repack_offs(qo) is qo


@pytest.mark.parametrize(
    "T,In,Out",
    [
        (1, 256, 128),  # decode T: fold2 (x-side fold) path
        (64, 512, 384),  # decode T at the production bucket
        (130, 512, 384),  # large T: offs-v0 unpack path (no fold)
    ],
)
def test_pallas_kernel_offs_packing(T, In, Out):
    """The serving int4 payload (offset-binary-low repack) through the
    fused kernel — both the decode-T x-side-fold path and the large-T
    AND/shift unpack — vs the split-packing jnp oracle."""
    from lightvllm_tpu.ops.quantization import repack_offs

    kx, kw = jax.random.split(jax.random.PRNGKey(8))
    x = jax.random.normal(kx, (T, In), jnp.float32)
    qt = quantize_weight(jax.random.normal(kw, (In, Out), jnp.float32), 4)
    want = quantized_matmul(x, qt)
    qo = repack_offs(qt)
    got = quant_matmul_pallas(
        x, qo.data, qo.scale, bits=4, packing="offs", interpret=True
    )
    # The fold path rounds x_l - x_h/16 once more than the oracle; f32
    # inputs keep that far below the int4 quantization noise.
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=5e-4
    )
    # matmul() dispatch consumes the packing field on the jnp path too.
    got2 = quantized_matmul(x, qo)
    np.testing.assert_allclose(
        np.asarray(got2), np.asarray(want), rtol=1e-5, atol=1e-5
    )
