"""Trainer: the train/test/evaluation harness.

Rebuilds reference train.py:44-560 (Trainer class) TPU-natively:
  * the per-batch hot loop is one jitted sharded step (train_step.py);
  * eval decodes + errors run jitted and batched, with Procrustes alignment
    as a batched SVD instead of the reference's per-sample host loop
    (train.py:346-357);
  * checkpoints are Orbax (params + batch_stats + opt_state + step) with the
    reference's best/latest policy (train.py:269-293) — and unlike the
    reference, optimizer state and epoch actually restore on resume
    (the reference saves but never restores them, train.py:97-107);
  * metrics go to JSONL + tensorboardX (train.py:27,192).
"""

from __future__ import annotations

import json
import logging
import os
import os.path as osp
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from keypointfusion_tpu.config import Config
from keypointfusion_tpu.data.pipeline import BatchLoader, device_prefetch
from keypointfusion_tpu.geometry.camera import uvd_nl_to_xyz_nl
from keypointfusion_tpu.ops.codecs_extra import feature_to_joint
from keypointfusion_tpu.parallel.mesh import (
    auto_mesh, batch_sharding, replicated_sharding,
)
from keypointfusion_tpu.training.metrics import (
    xyz_to_error_mm, pa_error_mm, pck_curve, auc_subset,
)
from keypointfusion_tpu.training.train_step import (
    TrainState, create_train_state, frame_from_batch, make_train_step,
    make_train_step_scan, make_eval_step,
)

MANO2HO3D = [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
             20, 16, 17, 19, 18]


class MetricsLogger:
    """JSONL metrics log + optional tensorboardX scalars."""

    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.jsonl = open(osp.join(log_dir, 'metrics.jsonl'), 'a')
        self.tb = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter
                self.tb = SummaryWriter(log_dir)
            except Exception:
                pass

    def log(self, step: int, metrics: Dict[str, float]):
        rec = {'step': int(step), **{k: float(v) for k, v in
                                     metrics.items()}}
        self.jsonl.write(json.dumps(rec) + '\n')
        self.jsonl.flush()
        if self.tb is not None:
            for k, v in metrics.items():
                self.tb.add_scalar(k, float(v), global_step=step)


class Checkpointer:
    """Orbax best/latest checkpoints of the full train state.

    Note: opt_state layout follows Config.flatten_opt (default: the
    optax.flatten'd layout — moments as single raveled vectors, see
    make_optimizer; flatten_opt=False stores per-leaf moment trees).
    Restore uses the current state as the template, so a checkpoint must
    be restored under the same flatten_opt it was written with."""

    def __init__(self, ckpt_dir: str):
        import orbax.checkpoint as ocp
        self.dir = osp.abspath(ckpt_dir)
        os.makedirs(self.dir, exist_ok=True)
        self.ckptr = ocp.StandardCheckpointer()

    def _payload(self, state: TrainState, epoch: int,
                 min_error: float = float('inf'), plateau: int = 0):
        # lr_scale / min_error / plateau are persisted so resuming a
        # scheduler='auto' run keeps its plateau-decayed learning rate and
        # tracking state instead of silently resetting to the base lr
        return {'params': state.params, 'batch_stats': state.batch_stats,
                'opt_state': state.opt_state,
                'step': state.step, 'epoch': jnp.asarray(epoch),
                'lr_scale': state.lr_scale,
                'min_error': jnp.asarray(
                    np.float32(min(min_error, np.finfo(np.float32).max))),
                'plateau': jnp.asarray(plateau)}

    def save(self, name: str, state: TrainState, epoch: int,
             min_error: float = float('inf'), plateau: int = 0):
        path = osp.join(self.dir, name)
        self.ckptr.save(path, self._payload(state, epoch, min_error,
                                            plateau), force=True)
        self.ckptr.wait_until_finished()

    def restore(self, name: str, state: TrainState):
        """Full restore including optimizer state, epoch, lr_scale and
        plateau tracking. Returns (state, epoch, min_error, plateau);
        checkpoints from before the lr_scale fields default-fill."""
        path = osp.join(self.dir, name)
        target = self._payload(state, 0)
        try:
            restored = self.ckptr.restore(path, target)
        except Exception:
            # pre-round-3 checkpoint without the scheduler fields:
            # default-fill FRESH scheduler state (base lr, no plateau
            # history) — the caller's template may carry a decayed
            # lr_scale that must not leak into the restored run
            legacy = {k: target[k] for k in
                      ('params', 'batch_stats', 'opt_state', 'step',
                       'epoch')}
            restored = dict(self.ckptr.restore(path, legacy),
                            lr_scale=jnp.asarray(1.0, jnp.float32),
                            min_error=jnp.asarray(
                                np.finfo(np.float32).max),
                            plateau=jnp.asarray(0))
        new_state = state.replace(
            params=restored['params'], batch_stats=restored['batch_stats'],
            opt_state=restored['opt_state'], step=restored['step'],
            lr_scale=jnp.asarray(restored['lr_scale'], jnp.float32))
        return (new_state, int(restored['epoch']),
                float(restored['min_error']), int(restored['plateau']))

    def restore_weights(self, name: str, state: TrainState):
        """Warm-start weights only (the reference's effective resume
        semantics, train.py:100-117)."""
        new_state = self.restore(name, state)[0]
        return state.replace(params=new_state.params,
                             batch_stats=new_state.batch_stats)


class Trainer:
    def __init__(self, cfg: Config, train_data=None, test_data=None,
                 model_dir: Optional[str] = None, use_mesh: bool = True):
        self.cfg = cfg
        self.train_data = train_data
        self.test_data = test_data
        if train_data is None and cfg.phase == 'train':
            from keypointfusion_tpu.data.datasets import make_dataset
            self.train_data = make_dataset(cfg, 'train')
        if test_data is None and cfg.phase in ('train', 'test'):
            from keypointfusion_tpu.data.datasets import make_dataset
            try:
                self.test_data = make_dataset(cfg, 'test')
            except Exception:
                self.test_data = None

        self.model_dir = model_dir or osp.join(
            cfg.save_dir, 'checkpoint', cfg.dataset,
            cfg.net + ('_' + cfg.model_save if cfg.model_save else ''))
        os.makedirs(self.model_dir, exist_ok=True)
        with open(osp.join(self.model_dir, 'config.json'), 'w') as f:
            json.dump({k: str(v) for k, v in vars(type(cfg)).items()
                       if not k.startswith('_')}, f, default=str)
        # run-provenance source snapshot (reference train.py:60-66)
        from keypointfusion_tpu.utils.provenance import snapshot_sources
        snapshot_sources(osp.join(self.model_dir, 'files'))
        logging.basicConfig(
            filename=osp.join(self.model_dir, 'train.log'),
            level=logging.INFO, force=False)

        self.mesh = auto_mesh(cfg.batch_size, cfg.mesh_axis) \
            if use_mesh and len(jax.devices()) > 1 else None
        self.logger = MetricsLogger(osp.join(self.model_dir, 'runs'))
        self.ckpt = Checkpointer(osp.join(self.model_dir, 'ckpt'))

        nb = (len(self.train_data) // cfg.batch_size
              if self.train_data is not None else 1000)
        sample = self._sample_batch()
        self.state = create_train_state(cfg, jax.random.PRNGKey(cfg.seed),
                                        sample, steps_per_epoch=max(nb, 1))
        if self.mesh is not None:
            self.state = jax.device_put(
                self.state, replicated_sharding(self.mesh))
        if cfg.pretrain:
            # ImageNet backbone warm start (reference resnetUnet.py:278-289,
            # convNeXT/resnetUnet.py:97-109); load_model/finetune merge on
            # top, mirroring the reference's construction-then-merge order
            self.state = self._load_imagenet_pretrain()
        if cfg.load_model:
            if cfg.load_model.endswith('.pth'):
                self.state = self._load_torch_checkpoint(cfg.load_model)
            else:
                self.state = self.ckpt.restore_weights(cfg.load_model,
                                                       self.state)
        if cfg.finetune_dir:
            # fine-tune warm start: same filtered merge as load_model
            # (reference train.py:109-117 duplicates the load_model block)
            self.state = self._load_torch_checkpoint(cfg.finetune_dir) \
                if cfg.finetune_dir.endswith('.pth') \
                else self.ckpt.restore_weights(cfg.finetune_dir, self.state)
        self.train_step = make_train_step(cfg, self.mesh)
        # multi-step scan dispatch (cfg.steps_per_dispatch > 1): G loader
        # batches stacked -> ONE device dispatch runs G optimizer steps,
        # amortizing host/tunnel dispatch latency (make_train_step_scan)
        self.train_scan = make_train_step_scan(cfg, self.mesh) \
            if cfg.steps_per_dispatch > 1 else None
        self.eval_step = make_eval_step(cfg, self.mesh)
        self.min_error = float('inf')
        self.start_epoch = 0
        self.plateau_patience = 3   # scheduler='auto' epochs w/o improvement
        self._plateau = 0
        # base key for the per-epoch rng streams (never mutated — train()
        # folds the epoch in, keeping resume replay-exact)
        self._rng = jax.random.PRNGKey(cfg.seed + 1)
        if cfg.resume:
            self.resume('latest')

    def resume(self, name: str = 'latest'):
        """FULL resume: params, batch stats, optimizer state, step, epoch
        and scheduler state — lr_scale + plateau tracking for
        scheduler='auto' (unlike the reference, which saved but never
        restored the optimizer/epoch — train.py:97-107)."""
        self.state, epoch, self.min_error, self._plateau = \
            self.ckpt.restore(name, self.state)
        self.start_epoch = epoch + 1
        logging.info('resumed from %s at epoch %d (lr_scale %.3e)', name,
                     epoch, float(jax.device_get(self.state.lr_scale)))

    def _load_imagenet_pretrain(self):
        """Warm-start the two backbones from an on-disk torchvision /
        ConvNeXt-release checkpoint when Config.pretrain is set
        (utils/pretrain.py). Missing checkpoint: raises if pretrain_dir was
        configured, otherwise keeps the random init and logs."""
        from keypointfusion_tpu.utils.pretrain import \
            imagenet_backbone_variables
        from keypointfusion_tpu.utils.torch_convert import merge_partial
        pre = imagenet_backbone_variables(self.cfg)
        if pre is None:
            logging.info(
                'pretrain=%r: no ImageNet checkpoint on disk (set '
                'Config.pretrain_dir or populate the torch hub cache); '
                'backbones keep their random init', self.cfg.pretrain)
            return self.state
        init = {'params': self.state.params,
                'batch_stats': self.state.batch_stats}
        merged, used, skipped = merge_partial(init, pre)
        merged = jax.tree_util.tree_map(jnp.asarray, merged)
        logging.info('ImageNet warm start: %d tensors merged, %d skipped '
                     '(stem-shape mismatches are expected)', len(used),
                     len(skipped))
        return self.state.replace(params=merged['params'],
                                  batch_stats=merged['batch_stats'])

    def _load_torch_checkpoint(self, path: str):
        """Warm-start from a released reference .pth via the converter,
        with the reference's filtered-merge semantics (train.py:100-117:
        only keys present in the current model — here: present AND
        shape-matching — are taken; the rest keep their init values)."""
        from keypointfusion_tpu.utils.torch_convert import (
            load_torch_checkpoint_variables, merge_partial)
        converted = load_torch_checkpoint_variables(path, self.cfg.net)
        init = {'params': self.state.params,
                'batch_stats': self.state.batch_stats}
        merged, used, skipped = merge_partial(init, converted)
        merged = jax.tree_util.tree_map(jnp.asarray, merged)
        logging.info('warm start from %s: %d tensors merged, %d skipped',
                     path, len(used), len(skipped))
        if skipped:
            logging.info('skipped (shape mismatch): %s', skipped[:8])
        return self.state.replace(params=merged['params'],
                                  batch_stats=merged['batch_stats'])

    def _sample_batch(self):
        from keypointfusion_tpu.data.synthetic import synthetic_batch
        if self.train_data is not None:
            from keypointfusion_tpu.data.pipeline import collate
            s = collate([self.train_data[0]] * 2)
            return {k: jnp.asarray(v) for k, v in s.items()}
        return {k: jnp.asarray(v) for k, v in synthetic_batch(
            batch_size=2, point_num=self.cfg.point_num).items()}

    # ------------------------------------------------------------- train --

    def train(self):
        cfg = self.cfg
        sharding = batch_sharding(self.mesh) if self.mesh else None
        for epoch in range(self.start_epoch, cfg.max_epoch):
            loader = BatchLoader(self.train_data, cfg.batch_size,
                                 shuffle=True, num_workers=8,
                                 seed=cfg.seed + epoch)
            epoch_arr = jnp.asarray(epoch, jnp.int32)
            t0 = time.time()
            # step rngs are a pure function of (seed, epoch): resuming at
            # epoch k replays exactly the rng stream the straight run would
            # have used (a carried, mutated key would silently diverge
            # after a resume — see test_resume_equivalence). Pre-splitting
            # the whole epoch also avoids a per-step jax.random.split
            # dispatch that stalls pipelining on high-latency links
            # (measured 2x step time through the remote tunnel).
            step_rngs = jax.random.split(
                jax.random.fold_in(self._rng, epoch), len(loader))
            if self.train_scan is not None:
                metrics = self._run_epoch_scan(loader, step_rngs,
                                               epoch_arr, t0)
            else:
                metrics = None
                for ii, batch in enumerate(device_prefetch(loader,
                                                           sharding)):
                    self.state, metrics = self.train_step(
                        self.state, batch, step_rngs[ii], epoch_arr)
                    if ii % 50 == 0:
                        self._log_step(metrics, (ii + 1), t0)

            if self.test_data:
                test_error = self.test(epoch)
            elif metrics is not None:
                test_error = float(jax.device_get(metrics['loss']))
            else:
                logging.warning('epoch %d produced no batches', epoch)
                test_error = float('inf')
            if test_error <= self.min_error:
                self.min_error = test_error
                self._plateau = 0
                self.ckpt.save('best', self.state, epoch,
                               self.min_error, self._plateau)
            elif cfg.scheduler == 'auto':
                # reduce-on-plateau: decay after `plateau_patience` epochs
                # without improvement (the intent behind the reference's
                # 'auto' branch, train.py:295-296 — which mistakenly feeds
                # the mm error to StepLR.step as an epoch index)
                self._plateau += 1
                if self._plateau >= self.plateau_patience:
                    self._plateau = 0
                    new_scale = (float(jax.device_get(self.state.lr_scale))
                                 * cfg.step_gamma)
                    self.state = self.state.replace(
                        lr_scale=jnp.asarray(new_scale, jnp.float32))
                    logging.info('plateau: lr_scale -> %.3e', new_scale)
            self.ckpt.save('latest', self.state, epoch,
                           self.min_error, self._plateau)
            logging.info('epoch %d done, test_error %.4f', epoch,
                         test_error)
        return self.min_error

    def _log_step(self, metrics, steps_done: int, t0: float):
        step = int(jax.device_get(self.state.step))
        host = {k: float(v) for k, v in jax.device_get(metrics).items()}
        host['steps_per_sec'] = steps_done / (time.time() - t0)
        self.logger.log(step, host)

    def _run_epoch_scan(self, loader, step_rngs, epoch_arr, t0):
        """cfg.steps_per_dispatch > 1: stack G consecutive loader batches
        on a leading scan axis and run them as ONE device dispatch
        (train_step.make_train_step_scan — bit-identical math, same rng
        stream as the per-step path). A trailing partial group falls back
        to single steps."""
        from keypointfusion_tpu.parallel.mesh import stacked_batch_sharding
        cfg = self.cfg
        G = cfg.steps_per_dispatch
        ssh = stacked_batch_sharding(self.mesh) if self.mesh else None
        bsh = batch_sharding(self.mesh) if self.mesh else None

        tail = []   # trailing len(loader) % G batches -> single steps

        def grouped():
            group = []
            for b in loader:
                group.append(b)
                if len(group) == G:
                    yield {k: np.stack([g[k] for g in group])
                           for k in group[0]}
                    group = []
            tail.extend(group)

        metrics = None
        steps_done = 0
        log_every = max(1, 50 // G)
        for gi, stacked in enumerate(device_prefetch(grouped(), ssh)):
            rngs = step_rngs[steps_done:steps_done + G]
            self.state, stacked_metrics = self.train_scan(
                self.state, stacked, rngs, epoch_arr)
            steps_done += G
            metrics = jax.tree_util.tree_map(lambda x: x[-1],
                                             stacked_metrics)
            if gi % log_every == 0:
                self._log_step(metrics, steps_done, t0)
        for b in tail:
            if bsh is not None:
                b = jax.device_put(b, bsh)
            self.state, metrics = self.train_step(
                self.state, b, step_rngs[steps_done], epoch_arr)
            steps_done += 1
        return metrics

    # -------------------------------------------------------------- eval --

    def _decode_stage(self, results, batch, frame, index, stage):
        """Per-stage decode, through the feature_type dispatch for dense
        stages (reference train.py:336-342 → GFM.feature2joint)."""
        if stage == 0:   # raw uvd output stage (reference train.py:331-335)
            return uvd_nl_to_xyz_nl(results[index], frame)
        if stage == 1:
            joint_uvd = feature_to_joint(batch['depth'], results[index],
                                         self.cfg.feature_type,
                                         self.cfg.feature_para,
                                         joint_num=self.cfg.joint_num)
            return uvd_nl_to_xyz_nl(joint_uvd, frame)
        return results[index]

    @staticmethod
    def _pad_batch(batch, batch_size: int):
        """Pad a partial final batch to full size by repeating the last
        sample (keeps batch-axis sharding legal); returns (batch, n_real)."""
        n = next(iter(batch.values())).shape[0]
        if n == batch_size:
            return batch, n
        pad = batch_size - n
        return {k: np.concatenate([v, np.repeat(v[-1:], pad, axis=0)])
                for k, v in batch.items()}, n

    def test(self, epoch: int = -1) -> float:
        """Per-stage mean / Procrustes-aligned errors + AUC printouts
        (reference train.py:304-399)."""
        if self.test_data is None:
            raise RuntimeError(
                f"no test split available — check Config.root_dir "
                f"({self.cfg.root_dir!r}) points at the {self.cfg.dataset} "
                f"dataset tree")
        cfg = self.cfg
        loader = BatchLoader(self.test_data, cfg.batch_size, shuffle=False,
                             num_workers=8, drop_last=False)
        sharding = batch_sharding(self.mesh) if self.mesh else None
        n_stage = len(cfg.stage_type)
        err_sum = np.zeros(n_stage)
        pa_sum = np.zeros(n_stage)
        nb = 0
        first_last_errors = [[], []]
        # per-stage result dumps + sample id file (reference train.py:
        # 308-310 opens test_%d.txt/id.txt; its writer arg is dead code so
        # the files stay empty there — here each line is the sample's
        # predicted world-mm joints, flattened)
        result_files = [open(osp.join(self.model_dir, f'test_{i}.txt'), 'w')
                        for i in range(n_stage)]
        id_file = open(osp.join(self.model_dir, 'id.txt'), 'w')
        sample_id = 0
        try:
            for raw in loader:
                batch, n_real = self._pad_batch(raw, cfg.batch_size)
                if sharding is not None:
                    batch = {k: jax.device_put(np.asarray(v), sharding)
                             for k, v in batch.items()}
                results, _ = self.eval_step(self.state, batch)
                frame = frame_from_batch(batch, cfg)
                for index, stage in enumerate(cfg.stage_type):
                    joint_xyz = self._decode_stage(results, batch, frame,
                                                   index, stage)
                    err = xyz_to_error_mm(joint_xyz, batch['xyz_gt'],
                                          batch['center'], batch['cube'])
                    pa = pa_error_mm(joint_xyz, batch['xyz_gt'],
                                     batch['center'], batch['cube'])
                    err = np.asarray(err)[:n_real]
                    pa = np.asarray(pa)[:n_real]
                    err_sum[index] += float(np.mean(err))
                    pa_sum[index] += float(np.mean(pa))
                    if index == 0:
                        first_last_errors[0].append(err)
                    if index == n_stage - 1:
                        first_last_errors[1].append(err)
                    world = (np.asarray(joint_xyz)[:n_real]
                             * np.asarray(batch['cube'])[:n_real, None] / 2
                             + np.asarray(batch['center'])[:n_real, None])
                    for row in world.reshape(n_real, -1):
                        result_files[index].write(
                            ' '.join(f'{v:.3f}' for v in row) + '\n')
                for i in range(n_real):
                    id_file.write(f'{sample_id + i}\n')
                sample_id += n_real
                nb += 1
        finally:
            for f in result_files:
                f.close()
            id_file.close()
        if nb == 0:
            return float('inf')

        for which, name in ((0, 'stage 0'), (1, 'stage -1')):
            errors = np.concatenate(first_last_errors[which], 0)
            auc, curve, th = pck_curve(errors)
            print(f'{name}: Area under curve: {auc:.3f}')
            print(f'{name}: Area under curve between 20mm - 50mm: '
                  f'{auc_subset(curve, th):.3f}')

        info = f'{epoch} epochs: '
        for index in range(n_stage):
            print(f'[mean_Error {err_sum[index] / nb:.3f}]')
            print(f'[PA_mean_Error {pa_sum[index] / nb:.3f}]')
            info += (f' error{index}: {err_sum[index] / nb:.3f} '
                     f'PA{index}: {pa_sum[index] / nb:.3f}')
        logging.info(info)
        self.logger.log(int(jax.device_get(self.state.step)),
                        {f'error_{i}': err_sum[i] / nb
                         for i in range(n_stage)})
        return err_sum[-1] / nb

    def evaluation(self, eval_data=None, out_path: Optional[str] = None):
        """HO3D codalab dump: world-mm joints, MANO→HO3D reorder,
        [1,-1,-1]/1000 flip, zero mesh placeholder
        (reference train.py:401-468)."""
        cfg = self.cfg
        data = eval_data or self.test_data
        loader = BatchLoader(data, cfg.batch_size, shuffle=False,
                             num_workers=8, drop_last=False)
        joint_list, mesh_list = [], []
        for ii, batch in enumerate(device_prefetch(loader)):
            results, _ = self.eval_step(self.state, batch)
            joint_xyz = results[-1]
            if self.logger.tb is not None:
                # eval-image logging (reference train.py:451-457):
                # skeleton overlays on the first sample of each batch
                from keypointfusion_tpu.geometry.camera import \
                    xyz_nl_to_uvd_nl
                from keypointfusion_tpu.utils.vis import (
                    draw_2d_pose, draw_2d_pose_rgb)
                frame = frame_from_batch(batch, cfg)
                uvd = np.asarray(xyz_nl_to_uvd_nl(joint_xyz, frame))
                depth0 = np.asarray(batch['depth'][0])
                rgb0 = np.asarray(batch['rgb'][0])
                img_show = draw_2d_pose(depth0, uvd[0], cfg.dataset)
                self.logger.tb.add_image(
                    'eval_img', np.transpose(img_show, (2, 0, 1)) / 255.0,
                    global_step=ii)
                rgb_show = draw_2d_pose_rgb(rgb0, uvd[0], cfg.dataset)
                self.logger.tb.add_image(
                    'eval_img_rgb',
                    np.transpose(rgb_show[..., ::-1], (2, 0, 1)) / 255.0,
                    global_step=ii)
            world = (joint_xyz * batch['cube'][:, None] / 2
                     + batch['center'][:, None])
            world = np.asarray(world)[:, MANO2HO3D, :]
            world = world * np.array([1, -1, -1]) / 1000
            mesh = np.zeros([world.shape[0], 778, 3])
            joint_list += [w for w in world]
            mesh_list += [m for m in mesh]
        out_path = out_path or osp.join(self.model_dir, 'pred.json')
        with open(out_path, 'w') as f:
            json.dump([[j.tolist() for j in joint_list],
                       [m.tolist() for m in mesh_list]], f)
        return out_path
