"""Native C helpers (lightvllm_tpu/native): xxhash64 correctness against
known vectors, block-hash chaining behavior, and slot fill vs the numpy
reference. Skipped when no C toolchain is available."""

import numpy as np
import pytest

from lightvllm_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C toolchain for the native module"
)


def _xxh64_py(data: bytes, seed: int = 0) -> int:
    """Pure-Python model of the xxhash64 spec (test oracle)."""
    M = (1 << 64) - 1
    P1, P2, P3 = 0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9
    P4, P5 = 0x85EBCA77C2B2AE63, 0x27D4EB2F165667C5

    def rotl(x, r):
        return ((x << r) | (x >> (64 - r))) & M

    def rnd(acc, inp):
        return (rotl((acc + inp * P2) & M, 31) * P1) & M

    i, n = 0, len(data)
    if n >= 32:
        v = [(seed + P1 + P2) & M, (seed + P2) & M, seed & M, (seed - P1) & M]
        while i + 32 <= n:
            for lane in range(4):
                v[lane] = rnd(v[lane], int.from_bytes(data[i : i + 8], "little"))
                i += 8
        h = (rotl(v[0], 1) + rotl(v[1], 7) + rotl(v[2], 12) + rotl(v[3], 18)) & M
        for lane in range(4):
            h = ((h ^ rnd(0, v[lane])) * P1 + P4) & M
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while i + 8 <= n:
        h = (rotl(h ^ rnd(0, int.from_bytes(data[i : i + 8], "little")), 27) * P1 + P4) & M
        i += 8
    if i + 4 <= n:
        h = (rotl(h ^ (int.from_bytes(data[i : i + 4], "little") * P1) & M, 23) * P2 + P3) & M
        i += 4
    while i < n:
        h = (rotl(h ^ (data[i] * P5) & M, 11) * P1) & M
        i += 1
    h ^= h >> 33
    h = (h * P2) & M
    h ^= h >> 29
    h = (h * P3) & M
    h ^= h >> 32
    return h


def test_xxh64_matches_spec_model():
    # The one universally quoted vector, plus random cross-checks covering
    # every length class (empty, <4, <8, <32, >=32, stripe remainders).
    assert native.xxh64(b"", 0) == 0xEF46DB3751D8E999
    rng = np.random.default_rng(0)
    for n in [0, 1, 3, 4, 7, 8, 13, 31, 32, 33, 63, 64, 100, 1024]:
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        for seed in (0, 1, 0x9E3779B185EBCA87):
            assert native.xxh64(data, seed) == _xxh64_py(data, seed), (n, seed)


def test_block_hash_chaining():
    a = native.block_hash([1, 2, 3])
    b = native.block_hash([1, 2, 3])
    assert a == b  # deterministic
    assert native.block_hash([1, 2, 4]) != a  # content-sensitive
    assert native.block_hash([1, 2, 3], prefix=a) != a  # prefix-sensitive
    assert native.block_hash([1, 2, 3], prefix=a) != native.block_hash(
        [1, 2, 3], prefix=b + 1
    )


def test_fill_slots_matches_numpy():
    rng = np.random.default_rng(0)
    bt = rng.permutation(64)[:10].astype(np.int32)
    bs = 16
    for start, n in [(0, 1), (0, 160), (7, 100), (159, 1), (30, 5)]:
        got = native.fill_slots(bt, bs, start, n)
        pos = start + np.arange(n)
        want = bt[pos // bs] * bs + pos % bs
        np.testing.assert_array_equal(got, want)


def test_block_manager_uses_same_hash_impl():
    # compute_block_hash must be stable within a process regardless of
    # backend; verify chaining sensitivity end to end.
    from lightvllm_tpu.engine.block_manager import compute_block_hash

    h1 = compute_block_hash(list(range(16)))
    h2 = compute_block_hash(list(range(16)), prefix=h1)
    assert h1 != h2
    assert compute_block_hash(list(range(16))) == h1
