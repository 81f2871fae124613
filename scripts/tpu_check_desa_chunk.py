"""On-hardware validation + timing of a desa_dense_fused joint_chunk
experiment: G joints' h1 fields concatenated along lanes into one
[C,C]x[C,G*Mp] MXU dot (vs G=1's 21 small dots per scale). Equality must
be exact: the per-output-column accumulation order inside the dot is
unchanged, concatenation only widens the lane axis.

RESULT (v5e, bs=256, bf16 serving mode, 2026-08): NEGATIVE — wider chunks
are monotonically SLOWER: chunk=1 5.56, chunk=3 5.72, chunk=7 5.94
ms/call (all variants bit-EXACT vs chunk=1 at both precisions, incl.
chunk=21). Mosaic already pipelines the 21 small [C,C]x[C,Mp] dots
against the interleaved VPU work; the lane-axis concatenate is a real
VMEM copy that costs more than the batching saves. The kernel keeps the
simple per-joint loop; this script is retained as the measurement record
(re-add a `joint_chunk` kwarg to desa_dense_pallas._kernel to rerun)."""

import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from keypointfusion_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from keypointfusion_tpu.models.desa import DESA
from keypointfusion_tpu.kernels.desa_dense_pallas import desa_dense_fused

print("device:", jax.devices()[0].device_kind, flush=True)

import inspect

_HAS_CHUNK = 'joint_chunk' in inspect.signature(
    desa_dense_fused.__wrapped__).parameters
if not _HAS_CHUNK:
    print("kernel has no joint_chunk kwarg (experiment reverted; see "
          "docstring for the recorded numbers) — timing chunk=1 only",
          flush=True)

B, N, J, C = 256, 1024, 21, 128
ITERS = 20
rng = np.random.RandomState(0)

# small-batch correctness first
bs = 4
pf_s = jnp.asarray(rng.randn(bs, N, C).astype(np.float32))
nf_s = jnp.asarray(rng.randn(bs, J, C).astype(np.float32))
px_s = jnp.asarray(rng.uniform(-0.9, 0.9, (bs, N, 3)).astype(np.float32))
nx_s = jnp.asarray(rng.uniform(-0.7, 0.7, (bs, J, 3)).astype(np.float32))

model = DESA(C, (128, 128), (64, 64, 64), (0.1, 0.2, 0.4))
variables = jax.jit(model.init)(jax.random.PRNGKey(0), pf_s, nf_s,
                                px_s, nx_s)
params, stats = variables['params'], variables['batch_stats']

CHUNKS = (1, 3, 7, 21) if _HAS_CHUNK else (1,)

for prec in ('highest', 'default'):
    base = None
    for chunk in CHUNKS:
        try:
            out = np.asarray(jax.jit(
                lambda pf, nf, px, nx, ch=chunk, pr=prec: desa_dense_fused(
                    params, stats, pf, nf, px, nx, mlp_precision=pr,
                    **({'joint_chunk': ch} if _HAS_CHUNK else {})))(
                        pf_s, nf_s, px_s, nx_s))
        except Exception as e:  # scoped-vmem overflow at wide chunks
            print(f"[{prec}] chunk={chunk}: FAILED "
                  f"{type(e).__name__}: {str(e)[:120]}", flush=True)
            continue
        if base is None:
            base = out
        else:
            d = np.abs(out - base).max()
            status = 'EXACT' if d == 0 else f'dev {d:.3e}'
            print(f"[{prec}] chunk={chunk}: {status}", flush=True)

# timing at serving shapes (bf16 inputs, default precision)
pf = jnp.asarray(rng.randn(B, N, C).astype(np.float32)).astype(
    jnp.bfloat16)
nf = jnp.asarray(rng.randn(B, J, C).astype(np.float32)).astype(
    jnp.bfloat16)
px = jnp.asarray(rng.uniform(-0.9, 0.9, (B, N, 3)).astype(np.float32))
nx = jnp.asarray(rng.uniform(-0.7, 0.7, (B, J, 3)).astype(np.float32))


def timed(chunk):
    def once(pf):
        return desa_dense_fused(params, stats, pf, nf, px, nx,
                                mlp_precision='default',
                                **({'joint_chunk': chunk}
                                   if _HAS_CHUNK else {}))

    def chained(pf0):
        def step(x, _):
            out = once(x)
            s = jnp.sum(out.astype(jnp.float32))
            return x + s.astype(x.dtype) * jnp.asarray(1e-24, x.dtype), ()
        final, _ = jax.lax.scan(step, pf0, None, length=ITERS)
        return jnp.sum(once(final).astype(jnp.float32))

    cc = jax.jit(chained).lower(pf).compile()
    warm = pf + jnp.asarray(7.0, pf.dtype)
    jax.device_get(cc(warm))
    t0 = time.perf_counter()
    jax.device_get(cc(pf))
    ms = (time.perf_counter() - t0) / (ITERS + 1) * 1000
    print(f"chunk={chunk}: {ms:.2f} ms/call at bs={B}", flush=True)


for chunk in ((1, 3, 7) if _HAS_CHUNK else (1,)):
    timed(chunk)
