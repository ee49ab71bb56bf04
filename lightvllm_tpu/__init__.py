"""lightvllm_tpu: a TPU-native paged-KV quantized LLM inference engine.

Built on JAX/XLA/Pallas. Public API mirrors the reference engine's surface
(`LLM(model, **cfg).generate(prompts, sampling_params)`).
"""

from lightvllm_tpu.sampling_params import SamplingParams
from lightvllm_tpu.config import Config

__all__ = ["LLM", "SamplingParams", "Config"]


def __getattr__(name):
    # Lazy import: keep `import lightvllm_tpu` cheap (no jax import) for
    # pure-Python consumers (scheduler tests, tooling).
    if name == "LLM":
        from lightvllm_tpu.llm import LLM

        return LLM
    raise AttributeError(name)
