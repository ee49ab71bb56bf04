"""Per-request sampling parameters.

Parity: reference `lightvllm/sampling_params.py:3-7` (temperature, max_tokens,
ignore_eos). We add top_k / top_p / seed / stop token ids, which the reference
lacks (SURVEY.md §2.10).
"""

from dataclasses import dataclass, field


@dataclass
class SamplingParams:
    temperature: float = 1.0
    max_tokens: int = 128
    ignore_eos: bool = False
    top_k: int = 0  # 0 = disabled
    top_p: float = 1.0  # 1.0 = disabled
    seed: int | None = None
    stop_token_ids: list[int] = field(default_factory=list)

    def __post_init__(self):
        assert self.temperature >= 0.0, "temperature must be non-negative"
        assert self.max_tokens >= 1, "max_tokens must be >= 1"
        assert 0.0 < self.top_p <= 1.0, "top_p must be in (0, 1]"
        assert self.top_k >= 0, "top_k must be >= 0"
