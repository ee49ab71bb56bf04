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
    """Spec for one layer's (possibly quantized) weight (in, out).

    QuantizedTensor leaves are (groups, gs, out) data and (groups, 1, out)
    scale. An out-features split maps onto the last axis. An in-features
    split maps onto the groups axis when there are multiple groups (INT4;
    group_size stays intact per shard); for per-channel INT8 (groups == 1)
    it maps onto the group-size axis with a replicated scale — the
    per-channel rescale commutes with the cross-shard psum.
    """
    i, o = out_spec
    if isinstance(w, QuantizedTensor):
        # Spec nodes must mirror the tensor's meta fields (bits, packing):
        # pytree zipping treats them as part of the node type.
        if i is not None and w.data.shape[0] == 1:
            return QuantizedTensor(
                data=P(None, i, o), scale=P(None, None, o), bits=w.bits,
                packing=w.packing,
            )
        return QuantizedTensor(
            data=P(i, None, o), scale=P(i, None, o), bits=w.bits,
            packing=w.packing,
        )
    return out_spec


def param_specs(params: dict) -> dict:
    """Specs keyed off the params actually present (family switches may
    omit q/k norms or include qkv biases; offline checkpoints drop None
    leaves entirely)."""
    ly = params["layers"]
    column = P(None, "model")  # out-features split
    row = P("model", None)  # in-features split (-> psum)
    per_key = {
        "input_ln": lambda v: P(None),
        "wq": lambda v: _qspec(column, v),
        "wk": lambda v: _qspec(column, v),
        "wv": lambda v: _qspec(column, v),
        # Fused projections (wqkv / w_gate_up): plain column split — the
        # shard-interleaved out layout (ModelSpec.tp_shards) makes each
        # contiguous "model" shard hold exactly its own q/k/v (gate/up).
        "wqkv": lambda v: _qspec(column, v),
        "w_gate_up": lambda v: _qspec(column, v),
        "q_norm": lambda v: P(None),
        "k_norm": lambda v: P(None),
        "bq": lambda v: P("model"),
        "bk": lambda v: P("model"),
        "bv": lambda v: P("model"),
        "bqkv": lambda v: P("model"),
        "wo": lambda v: _qspec(row, v),
        "post_ln": lambda v: P(None),
        "w_gate": lambda v: _qspec(column, v),
        "w_up": lambda v: _qspec(column, v),
        "w_down": lambda v: _qspec(row, v),
    }
    lm_head = params.get("lm_head")
    if lm_head is None:
        head_spec = None
    elif isinstance(lm_head, QuantizedTensor):
        # Unstacked (groups, gs, V) data / (groups, 1, V) scale: vocab (the
        # out axis) on "model", scales replicated along group axes.
        head_spec = QuantizedTensor(
            data=P(None, None, "model"),
            scale=P(None, None, "model"),
            bits=lm_head.bits,
            packing=lm_head.packing,
        )
    else:
        head_spec = P(None, "model")
    specs = {
        "embed": P("model", None),
        # Layer values are per-layer tuples: one spec per element (the
        # element decides array-vs-QuantizedTensor structure).
        "layers": {
            k: (None if v is None else tuple(per_key[k](el) for el in v))
            for k, v in ly.items()
        },
        "final_ln": P(None),
        "lm_head": head_spec,
    }
    return specs


def kv_cache_specs() -> dict:
    """KVCache pytree specs: per-layer (NB, H, BSZ, D), heads on "model".

    INT8-KV dequant scales live IN-PAGE as trailing scale heads of each TP
    shard's K head-axis group (ops/kv_cache.py), so the same head-axis
    split places them — there is no separate scale leaf to mis-shard (the
    r2 crash class where the scale arrays were dropped at placement)."""
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
