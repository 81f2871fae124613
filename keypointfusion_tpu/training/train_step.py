"""Train/eval step factories: optax AdamW + epoch-step LR decay, jitted and
batch-sharded over a 1-D device mesh.

Replaces reference train.py:78-120 (optimizer/scheduler setup) and the hot
loop body train.py:206-265. One fused jitted step: forward (both backbones +
2 KFAM stages), loss assembly, backward, AdamW update, BN stat update.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh

from keypointfusion_tpu.config import Config
from keypointfusion_tpu.geometry.camera import CropFrame
from keypointfusion_tpu.models.kpfusion import KPFusion
from keypointfusion_tpu.parallel.mesh import batch_sharding, replicated_sharding
from keypointfusion_tpu.training.losses import compute_losses


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    # dynamic LR multiplier for scheduler='auto' (plateau decay, driven by
    # the Trainer after each epoch's test). For adamw/adam/sgd the optax
    # update is linear in lr, so scaling the final update is exactly
    # equivalent to scaling the schedule.
    lr_scale: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.ones((), jnp.float32))
    tx: optax.GradientTransformation = struct.field(pytree_node=False,
                                                    default=None)
    model: KPFusion = struct.field(pytree_node=False, default=None)


def make_lr_schedule(cfg: Config, steps_per_epoch: int):
    """scheduler dispatch (config.py:69; reference config.py:64,
    train.py:120,295-301):
      'step'     — StepLR(step_size epochs, gamma) staircase;
      'constant' — flat lr (reference: scheduler never stepped);
      'auto'     — flat schedule here; the Trainer applies plateau decay
                   through TrainState.lr_scale. (The reference's 'auto'
                   branch calls StepLR.step(test_error) — passing the mm
                   error as an epoch number, which is a bug; we implement
                   the evident reduce-on-plateau intent instead.)
    """
    if cfg.scheduler in ('constant', 'auto'):
        return lambda step: cfg.lr

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        return cfg.lr * (cfg.step_gamma ** (epoch // cfg.step_size))
    return schedule


def make_optimizer(cfg: Config, steps_per_epoch: int):
    sched = make_lr_schedule(cfg, steps_per_epoch)
    if cfg.opt == 'adamw':
        # torch AdamW defaults: betas (0.9, 0.999), eps 1e-8, wd 0.01
        tx = optax.adamw(sched, b1=0.9, b2=0.999, eps=1e-8,
                         weight_decay=0.01)
    elif cfg.opt == 'adam':
        tx = optax.adam(sched)
    elif cfg.opt == 'sgd':
        tx = optax.sgd(sched, momentum=0.9)
    else:
        raise ValueError(cfg.opt)
    # flatten_opt=True: run the update on ONE raveled vector instead of
    # ~230 leaves — the per-leaf unroll was 16.7k of the train step's 39k
    # jaxpr eqns (43% of trace+compile time; minutes on the CPU test mesh,
    # and real seconds on the TPU compile path). Elementwise optimizers
    # are exact under ravel/unravel — same per-element math, torch-AdamW
    # parity tests unaffected. Costs ravel/unravel data movement per
    # step: measured 44.8 -> 40.4 ms/step device time at bs=64 'mixed'
    # going flattened -> per-leaf on v5e
    # (artifacts/train_trace_r05_bs64_leafopt.json), so TPU production
    # runs set flatten_opt=False (see Config).
    # getattr: callers may pass a minimal config stub without the field
    # (e.g. the torch-AdamW parity test's _C)
    return optax.flatten(tx) if getattr(cfg, 'flatten_opt', True) else tx


# jitted-init cache: jax.jit caches on function identity, and model.init
# is a fresh bound method per KPFusion instance — without this, a second
# create_train_state with the same config recompiles the whole init
# (~2.5 min on the CPU test mesh).
_INIT_CACHE: Dict[tuple, Callable] = {}


def create_train_state(cfg: Config, rng, sample_batch,
                       steps_per_epoch: int = 1000) -> TrainState:
    if cfg.compute_dtype == 'mixed':
        # bf16 conv backbones, f32 fusion head (see KPFusion docstring)
        dtype, backbone_dtype = jnp.float32, jnp.bfloat16
    else:
        dtype = jnp.dtype(cfg.compute_dtype)
        backbone_dtype = None
    model = KPFusion(net=cfg.net, joint_num=cfg.joint_num,
                     dtype=dtype, backbone_dtype=backbone_dtype,
                     fast_topk=cfg.fast_topk)
    frame = frame_from_batch(sample_batch, cfg)
    # jitted init: eager flax init issues thousands of tiny dispatches,
    # which takes minutes over the remote-TPU link
    # (the cached closure keeps the first model instance for a given key;
    # init is pure given the config, so any same-key instance is identical)
    key = (cfg.net, cfg.joint_num, str(dtype), str(backbone_dtype),
           cfg.fast_topk)
    if key not in _INIT_CACHE:
        _INIT_CACHE[key] = jax.jit(
            lambda r, rgb, depth, pcl, fr: model.init(r, rgb, depth, pcl, fr))
    variables = _INIT_CACHE[key](
        rng, sample_batch['rgb'], sample_batch['depth'],
        sample_batch['pcl'], frame)
    tx = make_optimizer(cfg, steps_per_epoch)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables['params'],
        batch_stats=variables.get('batch_stats', {}),
        opt_state=tx.init(variables['params']),
        tx=tx, model=model)


def frame_from_batch(batch: Dict[str, jnp.ndarray], cfg: Config) -> CropFrame:
    # flip=+1 for every dataset: NYUDataset already converts its stored
    # flipped-y labels/centers to the +1 convention, exactly like the
    # reference nyu_loader (loader.py:1510 sets self.flip = 1 after the
    # conversion at :1527-1533)
    return CropFrame.from_batch(batch['cam_para'], batch['center'],
                                batch['M'], batch['cube'], flip=1.0,
                                img_size=cfg.input_size)


def _check_state(state):
    # tx/model default to None structurally (they sit after lr_scale's
    # default) — fail loudly at first step, not with an opaque
    # AttributeError deep inside the trace
    if state.tx is None or state.model is None:
        raise ValueError(
            'TrainState.tx/model are unset — construct the state with '
            'create_train_state (or pass tx=/model= explicitly)')


def _step_body(cfg: Config) -> Callable:
    """The un-jitted single-step body: forward (both backbones + 2 KFAM
    stages), loss assembly, backward, AdamW update, BN stat update."""
    kernel = cfg.feature_para[0]

    def step_fn(state: TrainState, batch, rng, epoch):
        _check_state(state)
        frame = frame_from_batch(batch, cfg)

        def forward(params):
            return state.model.apply(
                {'params': params, 'batch_stats': state.batch_stats},
                batch['rgb'], batch['depth'], batch['pcl'], frame,
                kernel, True, rngs={'dropout': rng},
                mutable=['batch_stats'])
        if cfg.remat:
            # rematerialize activations in the backward (Config.remat)
            forward = jax.checkpoint(forward)

        def loss_fn(params):
            (results, sw), new_state = forward(params)
            loss, metrics = compute_losses(
                results, sw, batch['depth'], batch['uvd_gt'],
                batch['xyz_gt'], frame, cfg, epoch)
            return loss, (new_state['batch_stats'], metrics)

        grads, (new_bs, metrics) = jax.grad(loss_fn, has_aux=True)(
            state.params)
        updates, new_opt = state.tx.update(grads, state.opt_state,
                                           state.params)
        updates = jax.tree_util.tree_map(lambda u: u * state.lr_scale,
                                         updates)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_bs, opt_state=new_opt)
        return new_state, metrics

    return step_fn


def make_train_step(cfg: Config, mesh: Optional[Mesh] = None) -> Callable:
    """Returns train_step(state, batch, rng, epoch) -> (state, metrics).

    batch: dict of [B,...] arrays (rgb, depth NHWC; pcl; xyz_gt; uvd_gt;
    center; M; cube; cam_para). With a mesh, inputs are batch-sharded and
    params replicated; XLA emits the ICI all-reduce for gradients.
    """
    step_fn = _step_body(cfg)

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))

    if not cfg.sync_batchnorm:
        return _make_per_shard_bn_step(cfg, mesh)

    bsh = batch_sharding(mesh)
    rsh = replicated_sharding(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(rsh, bsh, rsh, rsh),
        out_shardings=(rsh, rsh),
        donate_argnums=(0,))


def make_train_step_scan(cfg: Config, mesh: Optional[Mesh] = None
                         ) -> Callable:
    """Returns train_scan(state, batches, rngs, epoch) -> (state, metrics).

    batches: dict of [G, B, ...] arrays (G consecutive loader batches
    stacked on a leading scan axis); rngs: [G] stacked PRNG keys. ONE
    device dispatch executes all G optimizer steps via lax.scan, with the
    same ops and rng stream as G make_train_step calls (bitwise only up to
    XLA's per-executable fusion rounding — the scan body compiles
    separately from the standalone step; see
    tests/test_resume_equivalence.py). metrics leaves come back
    stacked [G].

    Why: per-step dispatch is host-latency-bound — on a remote-TPU tunnel
    the measured python-loop step time is 55-120 ms while the device
    compute is ~33 ms (artifacts/train_profile_r04_bs64.json); even on a
    local host it costs ~100 us of host work per step. Chaining G steps in
    one dispatch amortizes dispatch cost to nothing and lets the device
    run back-to-back. The reference's torch loop has no equivalent (CUDA
    streams hide some of this; XLA's answer is the scan).
    """
    step_fn = _step_body(cfg)

    def scan_fn(state: TrainState, batches, rngs, epoch):
        def body(st, xs):
            b, r = xs
            return step_fn(st, b, r, epoch)
        return jax.lax.scan(body, state, (batches, rngs))

    if mesh is None:
        return jax.jit(scan_fn, donate_argnums=(0,))

    from keypointfusion_tpu.parallel.mesh import stacked_batch_sharding

    if not cfg.sync_batchnorm:
        from jax.sharding import PartitionSpec as P
        axis = mesh.axis_names[0]
        local_step = _local_step_body(cfg, axis)

        def local_scan(state: TrainState, batches, rngs, epoch):
            def body(st, xs):
                b, r = xs
                return local_step(st, b, r, epoch)
            return jax.lax.scan(body, state, (batches, rngs))

        sharded = jax.shard_map(
            local_scan, mesh=mesh,
            in_specs=(P(), P(None, axis), P(), P()),
            out_specs=(P(), P()),
            check_vma=False)
        return jax.jit(sharded, donate_argnums=(0,))

    bsh = stacked_batch_sharding(mesh)
    rsh = replicated_sharding(mesh)
    return jax.jit(
        scan_fn,
        in_shardings=(rsh, bsh, rsh, rsh),
        out_shardings=(rsh, rsh),
        donate_argnums=(0,))


def _local_step_body(cfg: Config, axis: str) -> Callable:
    """Un-jitted per-shard-BN step body for use inside shard_map (exact
    torch.nn.DataParallel parity — see _make_per_shard_bn_step)."""
    kernel = cfg.feature_para[0]

    def local_step(state: TrainState, batch, rng, epoch):
        frame = frame_from_batch(batch, cfg)
        # independent dropout masks per shard (torch DP replicas draw
        # independent masks; a replicated key would reuse one mask)
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))

        def forward(params):
            return state.model.apply(
                {'params': params, 'batch_stats': state.batch_stats},
                batch['rgb'], batch['depth'], batch['pcl'], frame,
                kernel, True, rngs={'dropout': rng},
                mutable=['batch_stats'])
        if cfg.remat:
            forward = jax.checkpoint(forward)

        def loss_fn(params):
            (results, sw), new_state = forward(params)
            loss, metrics = compute_losses(
                results, sw, batch['depth'], batch['uvd_gt'],
                batch['xyz_gt'], frame, cfg, epoch)
            return loss, (new_state['batch_stats'], metrics)

        grads, (new_bs, metrics) = jax.grad(loss_fn, has_aux=True)(
            state.params)
        grads = jax.lax.pmean(grads, axis)
        new_bs = jax.lax.pmean(new_bs, axis)
        metrics = jax.lax.pmean(metrics, axis)
        updates, new_opt = state.tx.update(grads, state.opt_state,
                                           state.params)
        updates = jax.tree_util.tree_map(lambda u: u * state.lr_scale,
                                         updates)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_bs, opt_state=new_opt)
        return new_state, metrics

    return local_step


def _make_per_shard_bn_step(cfg: Config, mesh: Mesh) -> Callable:
    """Per-shard BatchNorm training step via shard_map — exact parity with
    the reference's torch.nn.DataParallel, which computes BN statistics per
    GPU (SURVEY.md §5.8). Each shard runs forward/backward on its local
    sub-batch with LOCAL batch stats; gradients and metrics are pmean'd
    over the data axis; running stats are pmean'd (torch DP effectively
    keeps only the master replica's — averaging is the less arbitrary
    choice and identical in expectation)."""
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]
    local_step = _local_step_body(cfg, axis)

    state_spec = P()
    batch_spec = P(axis)
    # jax.shard_map (the jax.experimental.shard_map module is deprecated
    # in jax 0.8+); check_vma=False — BN running stats are pmean'd, not
    # replicated per-shard, so the varying-manifest check doesn't apply
    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(state_spec, batch_spec, state_spec, state_spec),
        out_specs=(state_spec, state_spec),
        check_vma=False)
    return jax.jit(sharded, donate_argnums=(0,))


def make_eval_step(cfg: Config, mesh: Optional[Mesh] = None) -> Callable:
    """Returns eval_step(state, batch) -> (results tuple, spatial_weights)."""
    kernel = cfg.feature_para[0]

    def step_fn(state: TrainState, batch):
        frame = frame_from_batch(batch, cfg)
        return state.model.apply(
            {'params': state.params, 'batch_stats': state.batch_stats},
            batch['rgb'], batch['depth'], batch['pcl'], frame, kernel, False)

    if mesh is None:
        return jax.jit(step_fn)
    bsh = batch_sharding(mesh)
    rsh = replicated_sharding(mesh)
    return jax.jit(step_fn, in_shardings=(rsh, bsh), out_shardings=bsh)
