"""Measurement harness for the decode-attention manual-DMA experiments.

Preserves the numbers behind the THIRD rejected decode-kernel design
(ops/decode_attention.py, README "Roadmap"): HBM->VMEM manual DMA of the
KV cache streams at ~137-147 GB/s on this v5e runtime REGARDLESS of how
many copies are in flight (1/2/3/6 concurrent chunks measured identical),
while XLA's two-einsum decode attention already achieves ~179 GB/s of
effective cache traffic — so a one-pass kernel cannot win; the binding
constraint is the per-stream DMA rate, not the number of passes.

Also reproduces the measurement-methodology trap: syncing the host per
jit call through the axon tunnel adds ~30 ms per call — a DMA-only kernel
measured "3 ms/call" at ANY size until the sync was amortized over 200
calls (true cost 0.18 ms).  Always amortize syncs when timing kernels here.
"""

import sys, time
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, HG, S = 8, 6, 1024

def kern(q_ref, kc_ref, vc_ref, o_ref, kco, vco, k_scr, v_scr, sk, sv):
    del kco, vco
    b = pl.program_id(0)
    rk = pltpu.make_async_copy(kc_ref.at[b], k_scr, sk)
    rv = pltpu.make_async_copy(vc_ref.at[b], v_scr, sv)
    rk.start(); rv.start(); rk.wait(); rv.wait()
    o_ref[0, 0] = (k_scr[0, 0] + v_scr[0, 0]).astype(o_ref.dtype)

def run(q, kc, vc):
    vspec = pl.BlockSpec((1, 1, 128), lambda b, *r: (b, 0, 0), memory_space=pltpu.VMEM)
    aspec = pl.BlockSpec(memory_space=pl.ANY)
    return pl.pallas_call(
        kern, grid=(B,),
        in_specs=[vspec, aspec, aspec], out_specs=[vspec, aspec, aspec],
        scratch_shapes=[pltpu.VMEM((HG, S, 128), kc.dtype),
                        pltpu.VMEM((HG, S, 128), vc.dtype),
                        pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA],
        out_shape=[jax.ShapeDtypeStruct((B, 1, 128), q.dtype),
                   jax.ShapeDtypeStruct(kc.shape, kc.dtype),
                   jax.ShapeDtypeStruct(vc.shape, vc.dtype)],
        input_output_aliases={1: 1, 2: 2},
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
    )(q, kc, vc)

rng = np.random.RandomState(0)
q = jnp.asarray(rng.randn(B, 1, 128), jnp.bfloat16)
kc = jnp.asarray(rng.randn(B, HG, S, 128), jnp.bfloat16)
vc = jnp.asarray(rng.randn(B, HG, S, 128), jnp.bfloat16)

def chain50(q, kc, vc):
    for _ in range(50):
        o, kc, vc = run(q, kc, vc)
    return o, kc, vc
g = jax.jit(chain50, donate_argnums=(1, 2))
o, kc, vc = g(q, kc, vc); _=float(o.astype(jnp.float32).sum())
t0=time.perf_counter()
N=4
for _ in range(N):
    o, kc, vc = g(q, kc, vc)
_=float(o.astype(jnp.float32).sum())
dt=(time.perf_counter()-t0)/(N*50)*1000
mb = 2*B*HG*S*128*2/1e6
print(f"dma-only, 1 sync per 200 calls: {dt:.3f} ms/call; {mb/dt:.0f} GB/s", flush=True)
