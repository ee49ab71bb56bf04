"""Public user API.

Parity: reference `lightvllm/llm.py:4-5` (LLM = LLMEngine alias).
"""

from lightvllm_tpu.engine.llm_engine import LLMEngine


class LLM(LLMEngine):
    pass
