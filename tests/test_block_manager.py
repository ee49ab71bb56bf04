"""Unit tests for the paged-KV block allocator and prefix cache.

The reference has zero automated tests for this subsystem (SURVEY.md §4);
these tests encode its intended semantics plus our quirk fixes.
"""

from lightvllm_tpu.engine.block_manager import BlockManager, compute_block_hash
from lightvllm_tpu.engine.sequence import Sequence
from lightvllm_tpu.sampling_params import SamplingParams

BS = 4


def make_seq(tokens, block_size=BS, **kw):
    return Sequence(list(tokens), SamplingParams(**kw), block_size=block_size)


def test_hash_chaining_distinguishes_prefixes():
    h1 = compute_block_hash([1, 2, 3, 4])
    h2 = compute_block_hash([1, 2, 3, 4], prefix=h1)
    assert h1 != h2
    assert compute_block_hash([1, 2, 3, 4]) == h1  # deterministic


def test_allocate_basic_block_math():
    bm = BlockManager(16, BS)
    seq = make_seq(range(10))  # 10 tokens -> 3 blocks (4+4+2)
    assert seq.num_blocks == 3
    assert bm.can_allocate(seq)
    bm.allocate(seq)
    assert len(seq.block_table) == 3
    assert bm.num_free_blocks == 13
    assert seq.num_cached_tokens == 0
    bm.deallocate(seq)
    assert bm.num_free_blocks == 16
    assert seq.block_table == []


def test_prefix_cache_hit_shares_live_blocks():
    bm = BlockManager(16, BS)
    a = make_seq(list(range(8)) + [100])
    bm.allocate(a)
    b = make_seq(list(range(8)) + [200])
    bm.allocate(b)
    # First two (full) blocks are shared, third differs.
    assert a.block_table[:2] == b.block_table[:2]
    assert a.block_table[2] != b.block_table[2]
    assert b.num_cached_tokens == 8
    assert bm.blocks[a.block_table[0]].ref_count == 2
    # 3 + 1 unique new block.
    assert bm.num_free_blocks == 16 - 4


def test_prefix_cache_revives_freed_blocks():
    bm = BlockManager(16, BS)
    a = make_seq(range(8))
    bm.allocate(a)
    table = list(a.block_table)
    bm.deallocate(a)
    assert bm.num_free_blocks == 16
    b = make_seq(list(range(8)) + [50])
    bm.allocate(b)
    # Revived the same physical blocks for the cached prefix.
    assert b.block_table[:2] == table
    assert b.num_cached_tokens == 8


def test_fully_cached_prompt_keeps_one_query_block():
    # Reference edge case: a prompt whose every full block prefix-hits would
    # produce an empty prefill. We recompute the last block instead.
    bm = BlockManager(16, BS)
    a = make_seq(range(8))
    bm.allocate(a)
    b = make_seq(range(8))
    bm.allocate(b)
    assert b.num_cached_tokens == 8 - BS
    assert b.num_cached_tokens < len(b)


def test_hash_collision_contents_checked():
    bm = BlockManager(16, BS)
    a = make_seq(range(4))
    bm.allocate(a)
    # Forge a colliding hash entry pointing at a's block.
    h = compute_block_hash([9, 9, 9, 9])
    bm.hash_to_block_id[h] = a.block_table[0]
    b = make_seq([9, 9, 9, 9, 1])
    bm.allocate(b)
    # Contents mismatch -> treated as miss, no sharing.
    assert b.block_table[0] != a.block_table[0]
    assert b.num_cached_tokens == 0


def test_can_append_needs_block_only_on_boundary():
    bm = BlockManager(2, BS)
    seq = make_seq(range(4))
    bm.allocate(seq)  # uses 1 block; 1 free
    # len=4 : KV slot for position 3 is inside block 0 after prefill; the
    # *next* decode token (position 4) starts a new block when len%bs==1.
    seq.append_token(7)  # len=5 -> rem 1 -> needs a new block
    assert bm.can_append(seq)
    bm.may_append(seq)
    assert len(seq.block_table) == 2
    assert bm.num_free_blocks == 0
    seq.append_token(8)  # len=6 -> rem 2 -> no new block needed
    assert bm.can_append(seq)
    bm.may_append(seq)
    assert len(seq.block_table) == 2


def test_may_append_registers_hash_when_block_fills():
    bm = BlockManager(4, BS)
    seq = make_seq(range(4))
    bm.allocate(seq)
    first_hash = bm.blocks[seq.block_table[0]].hash
    assert first_hash != -1
    for t in [10, 11, 12, 13]:
        seq.append_token(t)
        bm.may_append(seq)
    # len=8: second block just filled; its chained hash must be registered.
    b2 = bm.blocks[seq.block_table[1]]
    assert b2.hash != -1
    assert bm.hash_to_block_id[b2.hash] == b2.block_id
    expect = compute_block_hash([10, 11, 12, 13], prefix=first_hash)
    assert b2.hash == expect


def test_decode_grown_blocks_hit_prefix_cache_later():
    bm = BlockManager(8, BS)
    seq = make_seq(range(4))
    bm.allocate(seq)
    for t in [10, 11, 12, 13]:
        seq.append_token(t)
        bm.may_append(seq)
    bm.deallocate(seq)
    # A new prompt equal to prompt+completion should fully hit (minus the
    # forced-recompute last block).
    s2 = make_seq([0, 1, 2, 3, 10, 11, 12, 13])
    bm.allocate(s2)
    assert s2.num_cached_tokens == 4  # 8 cached, minus last block recompute


def test_overwritten_block_hash_entry_removed():
    bm = BlockManager(2, BS)
    a = make_seq(range(4))
    bm.allocate(a)
    h = bm.blocks[a.block_table[0]].hash
    bm.deallocate(a)
    # Exhaust the pool with different contents, overwriting both blocks.
    b = make_seq([7, 7, 7, 7, 8, 8, 8, 8])
    bm.allocate(b)
    assert h not in bm.hash_to_block_id or (
        bm.blocks[bm.hash_to_block_id[h]].token_ids == [0, 1, 2, 3]
    )
