"""Request state tracking.

Parity: reference `lightvllm/engine/sequence.py:18-143` (Sequence with status,
token bookkeeping, block math). Differences by design:
  - block_size is an instance field validated against the engine config,
    not a hardcoded class attribute (reference quirk, SURVEY.md §2.9.3).
  - No pickle slimming (`__getstate__`) — single-controller JAX has no
    worker-process IPC (SURVEY.md §2.5 TPU note).
"""

from __future__ import annotations

from copy import copy
from enum import Enum, auto
from itertools import count

from lightvllm_tpu.sampling_params import SamplingParams


class SequenceStatus(Enum):
    WAITING = auto()
    RUNNING = auto()
    FINISHED = auto()


class Sequence:
    counter = count()

    def __init__(
        self,
        token_ids: list[int],
        sampling_params: SamplingParams | None = None,
        block_size: int = 64,
    ):
        assert token_ids, "empty prompt"
        sampling_params = sampling_params or SamplingParams()
        self.seq_id = next(Sequence.counter)
        self.status = SequenceStatus.WAITING
        self.token_ids: list[int] = copy(token_ids)
        self.num_tokens = len(token_ids)
        self.num_prompt_tokens = len(token_ids)
        self.num_cached_tokens = 0
        # Chunked prefill (Config.prefill_chunk_tokens): while a PARTIAL
        # prompt chunk is scheduled/in flight, prefill_end marks the end of
        # the processed-token range [num_cached_tokens, prefill_end); None
        # means the prefill step covers the whole remaining prompt.
        self.prefill_end: int | None = None
        self.block_size = block_size
        self.block_table: list[int] = []
        self.temperature = sampling_params.temperature
        self.max_tokens = sampling_params.max_tokens
        self.ignore_eos = sampling_params.ignore_eos
        self.top_k = sampling_params.top_k
        self.top_p = sampling_params.top_p
        self.seed = sampling_params.seed
        self.stop_token_ids = set(sampling_params.stop_token_ids)

    def __len__(self) -> int:
        return self.num_tokens

    def __getitem__(self, key):
        return self.token_ids[key]

    @property
    def last_token(self) -> int:
        return self.token_ids[-1]

    @property
    def is_finished(self) -> bool:
        return self.status == SequenceStatus.FINISHED

    @property
    def num_completion_tokens(self) -> int:
        return self.num_tokens - self.num_prompt_tokens

    @property
    def prompt_token_ids(self) -> list[int]:
        return self.token_ids[: self.num_prompt_tokens]

    @property
    def completion_token_ids(self) -> list[int]:
        return self.token_ids[self.num_prompt_tokens :]

    @property
    def num_cached_blocks(self) -> int:
        return self.num_cached_tokens // self.block_size

    @property
    def num_blocks(self) -> int:
        return (self.num_tokens + self.block_size - 1) // self.block_size

    @property
    def last_block_num_tokens(self) -> int:
        return self.num_tokens - (self.num_blocks - 1) * self.block_size

    def get_token_ids_of_block(self, i: int) -> list[int]:
        assert 0 <= i < self.num_blocks
        return self.token_ids[i * self.block_size : (i + 1) * self.block_size]

    def append_token(self, token_id: int) -> None:
        self.token_ids.append(token_id)
        self.num_tokens += 1
