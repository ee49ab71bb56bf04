#!/usr/bin/env python
"""Projection-path decomposition: isolated kernel times vs a chained
36-layer graph at the 8B decode shapes (T=64, int4 gs128).

Isolated slope-timing cancels dispatch overhead per call; the chained
graph includes whatever overhead XLA/Mosaic adds BETWEEN the custom calls
(copies, sequencer gaps) — the difference is the per-invocation tax the
end-to-end step pays (suspected residual, r4 ablation: projections run at
~350 GB/s in the step vs 638 GB/s isolated)."""

import os, sys, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from lightvllm_tpu.ops.quantization import quantize_weight, matmul

N1, N2, TRIALS = 8, 1024, 3
CHAIN_N1, CHAIN_N2 = 4, 48
E, QKV, GU, I = 4096, 6144, 24576, 12288
L = 6
T = int(os.environ.get("T", 64))

key = jax.random.PRNGKey(0)
def w(in_f, out_f, i=0):
    return quantize_weight(
        jax.random.normal(jax.random.fold_in(key, in_f*out_f+i), (in_f, out_f), jnp.float32) * 0.02, 4, 128)

shapes = {"wqkv": (E, QKV), "wo": (E, E), "w_gate_up": (E, GU), "w_down": (I, E)}
weights = {k: w(*s) for k, s in shapes.items()}

def timeit(fn, *args, n1=None, n2=None):
    def loop(n, x, *rest):
        def body(i, x):
            o = fn(x + 0.0 * i, *rest)
            return x + 0.0 * o.astype(x.dtype)[:1, :1].sum()
        return jax.lax.fori_loop(0, n, body, x)
    n1 = n1 or N1; n2 = n2 or N2
    l1 = jax.jit(functools.partial(loop, n1))
    l2 = jax.jit(functools.partial(loop, n2))
    np.asarray(l1(*args).sum()); np.asarray(l2(*args).sum())
    best = 1e9
    for _ in range(TRIALS):
        t0 = time.perf_counter(); np.asarray(l1(*args).sum())
        t1 = time.perf_counter(); np.asarray(l2(*args).sum())
        t2 = time.perf_counter()
        best = min(best, ((t2-t1)-(t1-t0))/(n2-n1))
    return best

x = jax.random.normal(key, (T, E), jnp.bfloat16)
total_iso = 0.0
for name, (in_f, out_f) in shapes.items():
    qt = weights[name]
    xx = jax.random.normal(key, (T, in_f), jnp.bfloat16)
    t = timeit(lambda x_, q=qt: matmul(x_, q), xx); print(name, "timed", flush=True)
    gb = (qt.data.nbytes + qt.scale.nbytes) / t / 1e9
    total_iso += t
    print(f"{name:10s} {in_f}x{out_f}: {t*1e6:7.1f} us  ({gb:5.1f} GB/s)")
print(f"isolated sum x{L} layers: {total_iso*L*1e3:.2f} ms/step")

# Chained graph: 36 layers of the 4 projections with data dependencies.
wl = {k: [w(*shapes[k], i) for i in range(L)] for k in shapes}
def chain(x, wl):
    h = x
    for i in range(L):
        qkv = matmul(h, wl["wqkv"][i])
        o = matmul(qkv[:, :E], wl["wo"][i])
        gu = matmul(o, wl["w_gate_up"][i])
        h = matmul(gu[:, :I], wl["w_down"][i]) + h
    return h
t_chain = timeit(lambda x_: chain(x_, wl), x, n1=CHAIN_N1, n2=CHAIN_N2)
bytes_l = sum(weights[k].data.nbytes + weights[k].scale.nbytes for k in shapes)
print(f"chained {L}-layer: {t_chain*1e3:.2f} ms/step "
      f"({bytes_l*L/t_chain/1e9:.1f} GB/s) -> per-invocation tax "
      f"{(t_chain - total_iso*L)/ (4*L) * 1e6:.1f} us/call")
