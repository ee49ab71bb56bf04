"""PartitionSpecs for weights, KV cache, and step inputs.

Parity: this replaces the reference's whole TP layer zoo —
ColumnParallelLinear/QKVParallelLinear (`lightvllm/layers/linear.py:122,240`,
out-features split), RowParallelLinear (+all-reduce, `linear.py:313,388-389`),
VocabParallelEmbedding / ParallelLMHead (`layers/embed_head.py:18,117`), and
per-rank KV-head slicing (`model_runner.py:224`). The same axis choices are
expressed as PartitionSpecs on the weight pytree; XLA/GSPMD inserts the
reduce/gather collectives the reference issues by hand.

Sharding map (mesh axes ("data", "model")):
  wq/wk/wv, w_gate/w_up : out-features on "model"  (column parallel)
  wo, w_down            : in-features  on "model"  (row parallel -> psum)
  embed, lm_head        : vocab on "model"          (vocab parallel)
  KV cache              : kv-head axis on "model"   (co-located with heads)
  norms                 : replicated
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lightvllm_tpu.ops.quantization import QuantizedTensor


def _qspec(out_spec: P, w) -> object:
    """Spec for a (possibly quantized) stacked weight (L, in, out).

    QuantizedTensor leaves are (L, groups, gs, out) data and (L, groups, 1,
    out) scale. An out-features split maps onto the last axis. An
    in-features split maps onto the groups axis when there are multiple
    groups (INT4; group_size stays intact per shard); for per-channel INT8
    (groups == 1) it maps onto the group-size axis with a replicated scale —
    the per-channel rescale commutes with the cross-shard psum.
    """
    l, i, o = out_spec
    if isinstance(w, QuantizedTensor):
        if i is not None and w.data.shape[1] == 1:
            return QuantizedTensor(
                data=P(l, None, i, o), scale=P(l, None, None, o), bits=w.bits
            )
        return QuantizedTensor(
            data=P(l, i, None, o), scale=P(l, i, None, o), bits=w.bits
        )
    return out_spec


def param_specs(params: dict) -> dict:
    ly = params["layers"]
    specs = {
        "embed": P("model", None),
        "layers": {
            "input_ln": P(None, None),
            "wq": _qspec(P(None, None, "model"), ly["wq"]),
            "wk": _qspec(P(None, None, "model"), ly["wk"]),
            "wv": _qspec(P(None, None, "model"), ly["wv"]),
            "q_norm": P(None, None),
            "k_norm": P(None, None),
            "wo": _qspec(P(None, "model", None), ly["wo"]),
            "post_ln": P(None, None),
            "w_gate": _qspec(P(None, None, "model"), ly["w_gate"]),
            "w_up": _qspec(P(None, None, "model"), ly["w_up"]),
            "w_down": _qspec(P(None, "model", None), ly["w_down"]),
        },
        "final_ln": P(None),
        "lm_head": None if params.get("lm_head") is None else P(None, "model"),
    }
    return specs


def kv_cache_specs() -> dict:
    """KVCache pytree specs: per-layer (NB, Hkv, BSZ, D), heads on "model"."""
    data = P(None, "model", None, None)
    return {"k": data, "v": data}


def shard_params(params: dict, mesh: Mesh) -> dict:
    specs = param_specs(params)

    def place(x, spec):
        if x is None:
            return None
        return jax.device_put(x, NamedSharding(mesh, spec))

    # QuantizedTensor nodes carry spec pytrees of identical structure.
    return jax.tree.map(
        place, params, specs, is_leaf=lambda x: x is None or isinstance(x, jax.Array)
    )
