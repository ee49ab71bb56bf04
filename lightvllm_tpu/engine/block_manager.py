"""Paged-KV physical block allocator with hash-chained prefix caching.

Parity: reference `lightvllm/engine/block_manager.py:9-214` (Block with
ref-counting, BlockManager.allocate/deallocate with chained xxhash64 prefix
dedup, may_append hash registration on block fill). Deliberate fixes over the
reference (SURVEY.md §2.9):
  - quirk 2: `can_append` uses the same `len % block_size == 1` test as
    `may_append` (the token being generated this step writes the KV slot for
    position len-1, so a new block is needed iff (len-1) % bs == 0).
  - fully-cached-prompt edge: if every prompt block prefix-hits, the last
    block is treated as uncached so prefill always has >= 1 query token.
  - hashing uses hashlib.blake2b (xxhash is not a baked-in dependency);
    chained exactly like the reference: h_i = H(h_{i-1} || tokens_i).
"""

from __future__ import annotations

import hashlib
from collections import deque

from lightvllm_tpu.engine.sequence import Sequence

try:  # native xxhash64 (lightvllm_tpu/native); falls back to blake2b below
    from lightvllm_tpu import native as _native

    _NATIVE = _native.available()
except Exception:  # pragma: no cover - import/toolchain failure
    _NATIVE = False


def compute_block_hash(token_ids: list[int], prefix: int = -1) -> int:
    if _NATIVE:
        return _native.block_hash(token_ids, prefix)
    h = hashlib.blake2b(digest_size=8)
    if prefix != -1:
        h.update(prefix.to_bytes(8, "little", signed=False))
    for t in token_ids:
        h.update(int(t).to_bytes(8, "little", signed=True))
    return int.from_bytes(h.digest(), "little")


class Block:
    __slots__ = ("block_id", "ref_count", "hash", "token_ids")

    def __init__(self, block_id: int):
        self.block_id = block_id
        self.ref_count = 0
        self.hash = -1
        self.token_ids: list[int] = []

    def update(self, hash_: int, token_ids: list[int]) -> None:
        self.hash = hash_
        self.token_ids = token_ids

    def reset(self) -> None:
        self.ref_count = 1
        self.hash = -1
        self.token_ids = []


class BlockManager:
    def __init__(self, num_blocks: int, block_size: int):
        assert num_blocks > 0
        self.num_blocks = num_blocks
        self.block_size = block_size
        self.blocks: list[Block] = [Block(i) for i in range(num_blocks)]
        self.hash_to_block_id: dict[int, int] = {}
        # Free list is a deque ordered so that recently-freed (still hash-live)
        # blocks go to the back; allocation pops from the front, maximizing the
        # time a freed block's cached contents stay revivable.
        self.free_block_ids: deque[int] = deque(range(num_blocks))
        self.used_block_ids: set[int] = set()
        # Observability (SURVEY.md §5: build adds structured cache stats).
        self.prefix_cache_hits = 0
        self.prefix_cache_queries = 0

    @property
    def num_free_blocks(self) -> int:
        return len(self.free_block_ids)

    def _allocate_block(self, block_id: int) -> Block:
        block = self.blocks[block_id]
        assert block.ref_count == 0, "allocating a block still in use"
        if block.hash != -1:
            # This physical block's cached contents are being overwritten;
            # drop the hash mapping if it still points here.
            if self.hash_to_block_id.get(block.hash) == block_id:
                del self.hash_to_block_id[block.hash]
        block.reset()
        self.free_block_ids.remove(block_id)
        self.used_block_ids.add(block_id)
        return block

    def _free_block(self, block_id: int) -> None:
        assert self.blocks[block_id].ref_count == 0
        self.used_block_ids.remove(block_id)
        self.free_block_ids.append(block_id)

    def can_allocate(self, seq: Sequence, spare: int = 0) -> bool:
        # Conservative: ignores potential prefix-cache hits. `spare` is the
        # scheduler's admission watermark (blocks to leave free for running
        # sequences' decode growth).
        return len(self.free_block_ids) >= seq.num_blocks + spare

    def count_prefix_hits(self, seq: Sequence) -> int:
        """Pure probe: the cached-token count allocate() would produce,
        WITHOUT touching any state (no allocation, no stats). The chunked
        prefill scheduler needs the hit length BEFORE allocating so it can
        bound hash registration to the tokens the first chunk will actually
        write. Must mirror allocate()'s hit logic exactly (incl. the
        fully-cached adjustment)."""
        cached = 0
        h = -1
        for i in range(seq.num_blocks):
            token_ids = seq.get_token_ids_of_block(i)
            if len(token_ids) != self.block_size:
                break
            h = compute_block_hash(token_ids, prefix=h)
            block_id = self.hash_to_block_id.get(h, -1)
            if block_id == -1 or self.blocks[block_id].token_ids != token_ids:
                break
            cached += self.block_size
        if cached == seq.num_tokens:
            cached -= self.block_size
        return cached

    def allocate(self, seq: Sequence, register_upto: int | None = None) -> None:
        """Allocate blocks for a prompt, reusing prefix-cached blocks.

        Full blocks carry a chained hash; a hit shares (ref_count++) or
        revives a free block with matching contents. Once the chain misses,
        all subsequent blocks miss (the prefix differs).

        register_upto (chunked prefill): only MISS blocks whose contents the
        first chunk actually writes (token index < register_upto) get their
        hash registered now. A registered hash makes a block prefix-hittable
        immediately, but a chunked prompt writes its tail blocks' KV in
        LATER steps — registering them early would let a same-step admission
        share pages holding garbage. Later chunks register as they go
        (register_prefill_hashes); hit blocks register unconditionally
        (their contents were written by whoever registered them first).
        """
        assert not seq.block_table, "sequence already allocated"
        upto_blocks = (
            seq.num_blocks if register_upto is None
            else register_upto // self.block_size
        )
        cache_miss = False
        h = -1
        for i in range(seq.num_blocks):
            token_ids = seq.get_token_ids_of_block(i)
            is_full = len(token_ids) == self.block_size
            h = compute_block_hash(token_ids, prefix=h) if is_full else -1
            block_id = self.hash_to_block_id.get(h, -1) if is_full else -1
            if is_full:
                self.prefix_cache_queries += 1
            if block_id == -1 or self.blocks[block_id].token_ids != token_ids:
                cache_miss = True
            if cache_miss:
                block_id = self.free_block_ids[0]
                block = self._allocate_block(block_id)
            else:
                self.prefix_cache_hits += 1
                seq.num_cached_tokens += self.block_size
                if block_id in self.used_block_ids:
                    block = self.blocks[block_id]
                    block.ref_count += 1
                else:
                    # Revive a freed-but-cached block: reset() wipes hash and
                    # contents, so restore them below via update().
                    block = self._allocate_block(block_id)
            if h != -1 and (not cache_miss or i < upto_blocks):
                block.update(h, token_ids)
                self.hash_to_block_id[h] = block_id
            seq.block_table.append(block_id)
        if seq.num_cached_tokens == seq.num_tokens:
            # Every block hit: keep at least the last block's tokens as query
            # tokens so prefill produces a hidden state to sample from.
            seq.num_cached_tokens -= self.block_size

    def register_prefill_hashes(self, seq: Sequence, upto_tokens: int) -> None:
        """Chain-register full blocks whose KV a previous prefill chunk has
        already written (token index < upto_tokens). Called at schedule time
        like may_append's lazy registration: anything prefix-hitting these
        blocks dispatches strictly after the chunk that wrote them."""
        for idx in range(upto_tokens // self.block_size):
            block = self.blocks[seq.block_table[idx]]
            if block.hash != -1:
                continue
            token_ids = seq.get_token_ids_of_block(idx)
            prefix = (
                self.blocks[seq.block_table[idx - 1]].hash if idx > 0 else -1
            )
            h = compute_block_hash(token_ids, prefix)
            block.update(h, token_ids)
            self.hash_to_block_id[h] = block.block_id

    def deallocate(self, seq: Sequence) -> None:
        for block_id in reversed(seq.block_table):
            block = self.blocks[block_id]
            block.ref_count -= 1
            if block.ref_count == 0:
                # hash_to_block_id entry survives for future prefix reuse.
                self._free_block(block_id)
        seq.num_cached_tokens = 0
        seq.block_table.clear()

    def blocks_needed_for_append(self, seq: Sequence, n: int) -> int:
        """Blocks that must be added so positions len-1 .. len-2+n (the KV
        slots an n-step decode window writes) all have a physical page."""
        total = (len(seq) - 2 + n) // self.block_size + 1
        return max(0, total - len(seq.block_table))

    def can_append(self, seq: Sequence, n: int = 1) -> bool:
        return len(self.free_block_ids) >= self.blocks_needed_for_append(seq, n)

    def may_append(self, seq: Sequence, n: int = 1) -> None:
        """Decode schedule-time bookkeeping for an n-step window.

        1. Chain-register every token-complete block that filled during the
           previous window. Registration MUST happen at schedule time, not
           at postprocess: a block becomes prefix-hittable the moment its
           hash is registered, and its last KV row is only guaranteed
           written once the run following this schedule completes — any
           prefill that could hit it runs strictly later (same ordering the
           reference relies on, scheduler.py:116 / block_manager.py:201).
        2. Pre-allocate pages so positions len-1 .. len-2+n (the KV slots
           this window writes) all have physical blocks.
        """
        full_blocks = len(seq) // self.block_size
        for idx in range(full_blocks):
            block = self.blocks[seq.block_table[idx]]
            if block.hash != -1:
                continue
            token_ids = seq.get_token_ids_of_block(idx)
            prefix = self.blocks[seq.block_table[idx - 1]].hash if idx > 0 else -1
            h = compute_block_hash(token_ids, prefix)
            block.update(h, token_ids)
            self.hash_to_block_id[h] = block.block_id
        for _ in range(self.blocks_needed_for_append(seq, n)):
            block_id = self.free_block_ids[0]
            self._allocate_block(block_id)
            seq.block_table.append(block_id)
