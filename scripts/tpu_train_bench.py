"""On-hardware training-step timing + bs=256 fit check.

Methodology: K sequential dispatches of the jitted train step where each
step's input state is the previous step's output — a data-dependent chain
that can neither overlap nor be memoized (the state changes every step);
the clock stops on a host fetch of the final loss. Variants probe the
compute-dtype policy and neighbor-selection knobs.
"""

import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp

from keypointfusion_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from keypointfusion_tpu.config import Config
from keypointfusion_tpu.data.synthetic import synthetic_batch
from keypointfusion_tpu.training.train_step import (
    create_train_state, make_train_step,
)

STEPS = 12


def run(tag, bs, steps=STEPS, **cfg_kw):
    cfg = Config(batch_size=bs, **cfg_kw)
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(
        batch_size=bs, point_num=cfg.point_num, seed=0).items()}
    try:
        state = create_train_state(cfg, jax.random.PRNGKey(0), batch,
                                   steps_per_epoch=100)
        step = make_train_step(cfg)
        rngs = jax.random.split(jax.random.PRNGKey(1), steps + 2)
        ep = jnp.zeros((), jnp.int32)
        # warmup: compile + first execute
        state, m = step(state, batch, rngs[0], ep)
        jax.device_get(m['loss'])
        t0 = time.perf_counter()
        for i in range(steps):
            state, m = step(state, batch, rngs[i + 1], ep)
        loss = float(jax.device_get(m['loss']))
        dt = time.perf_counter() - t0
        print(f"{tag}: {dt / steps * 1000:.1f} ms/step  "
              f"{bs * steps / dt:.0f} samples/s  loss={loss:.3f}",
              flush=True)
    except Exception as e:
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:300]}",
              flush=True)


print("device:", jax.devices()[0].device_kind, flush=True)
run("bs64 mixed exact-topk (r2 default)", 64, compute_dtype='mixed')
run("bs64 mixed fast-topk", 64, compute_dtype='mixed', fast_topk=True)
run("bs64 bf16 fast-topk", 64, compute_dtype='bfloat16', fast_topk=True)
run("bs256 mixed fast-topk (fit check)", 256, steps=4,
    compute_dtype='mixed', fast_topk=True)
