"""Multi-chip dry-run body: jit the FULL sharded train step over an
n-device mesh and execute one step on tiny shapes.

Run via ``python -m keypointfusion_tpu.parallel.dryrun N``. The platform is
forced to CPU with N virtual devices BEFORE any jax backend initialization —
the env var alone is not enough once another platform plugin (e.g. the axon
TPU tunnel) has registered, so `__graft_entry__.dryrun_multichip` always
invokes this module in a fresh subprocess.

This is the TPU-native replacement check for the reference's
torch.nn.DataParallel (reference train.py:81): a 1-D batch-axis mesh, with
both BatchNorm policies exercised —
  * sync-BN: plain jit with NamedShardings (XLA/GSPMD inserts the gradient
    all-reduce and global BN reductions over ICI),
  * per-shard BN: shard_map with explicit lax.pmean of grads/stats (exact
    DataParallel parity, SURVEY.md §5.8).
"""

from __future__ import annotations

import os
import sys


def _force_cpu(n_devices: int) -> None:
    os.environ['JAX_PLATFORMS'] = 'cpu'
    flags = [f for f in os.environ.get('XLA_FLAGS', '').split()
             if 'xla_force_host_platform_device_count' not in f]
    flags.append(f'--xla_force_host_platform_device_count={n_devices}')
    # On a CPU-starved host the N virtual devices' collective threads can
    # miss XLA's default 40s rendezvous budget, which CHECK-fails and
    # SIGABRTs the process (observed on a 1-core box while a second module
    # compiled). Give them an hour.
    if not any('collective_call_terminate_timeout' in f for f in flags):
        flags += ['--xla_cpu_collective_call_warn_stuck_timeout_seconds=120',
                  '--xla_cpu_collective_call_terminate_timeout_seconds=3600']
    # This is a compile-correctness check, not a perf run: each full-model
    # XLA CPU compile costs minutes at default effort on a 1-core box and
    # the round-4 driver run timed out on exactly that (MULTICHIP_r04
    # rc=124). Dial LLVM effort down — measured 2.0x faster cold compiles
    # for the sync-BN step (84s vs 200s+), identical loss to 4 decimals,
    # executions still <1s.
    if not any('xla_backend_optimization_level' in f for f in flags):
        flags += ['--xla_backend_optimization_level=0',
                  '--xla_llvm_disable_expensive_passes=true']
    os.environ['XLA_FLAGS'] = ' '.join(flags)
    # CRITICAL: jax's persistent-cache key does NOT include env-var XLA
    # flags, so opt0-compiled executables are indistinguishable from
    # full-effort ones by key. Writing them into the shared cache poisons
    # the test suite (observed: 7 tight-tolerance parity failures loading
    # opt0 executables). Keep this run's entries in a separate directory.
    os.environ.setdefault(
        'KPF_COMPILE_CACHE',
        os.path.expanduser('~/.cache/kpf_xla_dryrun_opt0'))


def run(n_devices: int) -> None:
    _force_cpu(n_devices)
    import jax
    jax.config.update('jax_platforms', 'cpu')

    from keypointfusion_tpu.utils.compile_cache import \
        enable_compilation_cache
    enable_compilation_cache()

    import jax.numpy as jnp
    import numpy as np

    from keypointfusion_tpu.config import Config
    from keypointfusion_tpu.data.synthetic import synthetic_batch
    from keypointfusion_tpu.parallel.mesh import (
        make_mesh, replicated_sharding, shard_batch)
    from keypointfusion_tpu.training.train_step import (
        create_train_state, make_train_step)

    ndev = len(jax.devices())
    assert ndev >= n_devices, (
        f"expected >= {n_devices} virtual CPU devices, got {ndev} "
        f"({jax.devices()[0].platform})")
    assert jax.devices()[0].platform == 'cpu', jax.devices()[0]

    import time
    t_start = time.perf_counter()

    def mark(section, extra=''):
        # per-section wall-time so the driver's tail shows exactly where
        # the budget goes (round-4 lesson: an opaque timeout)
        print(f"dryrun_multichip({n_devices}) [{section}]: ok{extra} "
              f"(t+{time.perf_counter() - t_start:.0f}s)", flush=True)

    print(f"dryrun_multichip({n_devices}): starting "
          f"(platform={jax.devices()[0].platform}, ndev={ndev})", flush=True)

    mesh = make_mesh(n_devices)
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_batch(batch_size=n_devices, point_num=128).items()}

    rng = jax.random.PRNGKey(0)
    # ONE train state shared by both BN-policy sections and the eval/ckpt
    # section — the state pytree is policy-independent (the policies differ
    # only in the step executable), and each avoided create_train_state
    # saves an optimizer init + device transfers on a 1-core box.
    state0 = create_train_state(Config(), rng, batch, steps_per_epoch=10)
    state0 = jax.device_put(state0, replicated_sharding(mesh))

    def fresh_state():
        # train_step donates arg 0; hand each section a genuinely fresh
        # buffer copy (device_put alone is a no-op at the same sharding
        # and would let the donation invalidate state0)
        return jax.device_put(
            jax.tree_util.tree_map(
                lambda x: np.asarray(x) if isinstance(x, jax.Array) else x,
                state0),
            replicated_sharding(mesh))

    mark('init', extra=', state built')
    for sync_bn in (True, False):
        cfg = Config(sync_batchnorm=sync_bn)
        sharded = shard_batch(batch, mesh)
        train_step = make_train_step(cfg, mesh)
        state, metrics = train_step(fresh_state(), sharded,
                                    jax.random.PRNGKey(1),
                                    jnp.zeros((), jnp.int32))
        loss = float(metrics['loss'])
        assert np.isfinite(loss), f"non-finite loss {loss}"
        mode = 'sync-BN/jit' if sync_bn else 'per-shard-BN/shard_map'
        mark(mode, extra=f", loss={loss:.4f}")

    # multi-chip SERVING: the whole streaming pipeline (on-device
    # preprocessing + forward) jitted with batch-sharded inputs and
    # replicated params over the same mesh (serving.py `mesh=`).
    from keypointfusion_tpu.serving import StreamingEngine
    bs = max(n_devices, 2)
    eng = StreamingEngine(Config(phase='test', point_num=128),
                          batch_size=bs, img_hw=(120, 160), mesh=mesh)
    rng_np = np.random.RandomState(0)
    depth = np.zeros((bs, 120, 160), np.uint16)
    depth[:, 40:80, 60:100] = rng_np.randint(
        500, 700, (bs, 40, 40)).astype(np.uint16)
    out = eng.submit(
        depth, rng_np.randint(0, 255, (bs, 120, 160, 3)).astype(np.uint8),
        np.tile(np.array([[80, 60, 600]], np.float32), (bs, 1)),
        np.full((bs, 3), 250, np.float32),
        np.tile(np.array([[150, 150, 80, 60]], np.float32), (bs, 1)))
    packed = np.asarray(out)
    assert np.isfinite(packed).all(), "non-finite serving output"
    mark('serving/SPMD', extra=f", out={packed.shape}")

    # sharded EVAL + metric chain and an Orbax round trip of the
    # mesh-placed TrainState — the two surfaces a real multi-chip run hits
    # right after training (trainer.py:359-441 test(), Checkpointer).
    import shutil
    import tempfile

    from keypointfusion_tpu.geometry.camera import uvd_nl_to_xyz_nl
    from keypointfusion_tpu.training.metrics import (
        pa_error_mm, xyz_to_error_mm)
    from keypointfusion_tpu.training.train_step import (
        frame_from_batch, make_eval_step)
    from keypointfusion_tpu.training.trainer import Checkpointer

    cfg = Config(sync_batchnorm=True)
    state = fresh_state()  # eval does not donate; shared state0 copy
    eval_step = make_eval_step(cfg, mesh)
    results, _ = eval_step(state, shard_batch(batch, mesh))
    frame = frame_from_batch(batch, cfg)
    joint_xyz = results[-1]
    err = np.asarray(xyz_to_error_mm(joint_xyz, batch['xyz_gt'],
                                     batch['center'], batch['cube']))
    pa = np.asarray(pa_error_mm(joint_xyz, batch['xyz_gt'],
                                batch['center'], batch['cube']))
    assert np.isfinite(err).all() and np.isfinite(pa).all(), (err, pa)
    # the dense stage decodes on the mesh too (trainer._decode_stage)
    from keypointfusion_tpu.ops.codecs_extra import feature_to_joint
    joint_uvd0 = feature_to_joint(batch['depth'], results[0],
                                  cfg.feature_type, cfg.feature_para,
                                  joint_num=cfg.joint_num)
    xyz0 = uvd_nl_to_xyz_nl(joint_uvd0, frame)
    assert np.isfinite(np.asarray(xyz0)).all()

    tmpdir = tempfile.mkdtemp(prefix='kpf_dryrun_ckpt_')
    try:
        ck = Checkpointer(tmpdir)
        ck.save('latest', state, epoch=1, min_error=float(err.mean()),
                plateau=0)
        # fresh replicated template (as a restarted run would build)
        state2 = fresh_state()
        restored, epoch, min_err, plateau = ck.restore('latest', state2)
        assert epoch == 1 and plateau == 0
        p0 = jax.tree_util.tree_leaves(state.params)[0]
        p1 = jax.tree_util.tree_leaves(restored.params)[0]
        np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)
    mark('eval+ckpt', extra=f", err={err.mean():.2f}mm "
         f"pa={pa.mean():.2f}mm")


if __name__ == '__main__':
    run(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
