"""KFAM fusion block — one stage of cross-modal keypoint refinement.

Rebuilds reference model/model.py:207-351 (`Block_KPFusion`) in NHWC with
the big [B,J,C,H,W] gated-feature tensor the reference materializes
(model/model.py:337-342) replaced by two MXU matmuls: since the spatial gate
is strictly positive (sigmoid/GAM mixtures), relu(gate * feat) == gate *
relu(feat), so the per-joint spatial pooling
    img_feat_j[b,j,c] = FC_hw( relu(gate[b,j,hw] * feat[b,hw,c]) )
collapses to  (gate * w_fc) @ relu(feat)  — algebraically identical, with
no 700MB intermediate.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from keypointfusion_tpu.models.norm import TorchBatchNorm

from keypointfusion_tpu.geometry.camera import CropFrame
from keypointfusion_tpu.geometry.pcl import (
    img_to_anchor_dis, sample_pixel_features,
)
from keypointfusion_tpu.ops.codecs import joint_to_heatmap, pcl_joint_to_offset
from keypointfusion_tpu.models.desa import DESA
from keypointfusion_tpu.models.transformer import KPInteraction, CrossDecoder
from keypointfusion_tpu.models.resnet import conv_init

linear_init = nn.initializers.normal(stddev=0.001)


def gather_pixel_features(feat_map, pcl_index, pcl_closeness):
    """feat_map [B,H,W,C], pcl_index [B,N,K] flat pixel ids,
    pcl_closeness [B,N,K] → weighted feature per point [B,N,C]
    (reference model/model.py:297-301). Reference semantics; production
    uses the dense-matmul form below (numerically identical, MXU-mapped —
    see geometry.pcl.pcl_pixel_weights)."""
    b, h, w, c = feat_map.shape
    flat = feat_map.reshape(b, h * w, c)
    gathered = jax.vmap(lambda f, i: f[i])(flat, pcl_index)   # [B,N,K,C]
    return jnp.sum(gathered * pcl_closeness[..., None], axis=2)


def gather_pixel_features_dense(feat_maps, closeness, index):
    """One matmul for ALL per-pixel feature lookups of a block:
    feat_maps [B,H,W,C_total] (channel-concat of the maps to sample),
    closeness/index [B,N,K] top-k pixel weights → [B,N,C_total].
    Rides geometry.pcl.sample_pixel_features: MXU-dense forward,
    recompute-the-weights backward (memory-safe at bs=256)."""
    b, h, w, c = feat_maps.shape
    flat = feat_maps.reshape(b, h * w, c)
    return sample_pixel_features(flat, closeness, index, h * w)


class _EmbedBN(nn.Module):
    """Conv1d(k=1)+BatchNorm1d equivalent: Dense over the channel axis +
    BN over (batch, tokens) (reference model/model.py:254-259)."""
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.dim, kernel_init=linear_init, dtype=self.dtype,
                     name='dense')(x)
        return TorchBatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, dtype=self.dtype, name='bn')(x)


class FusionBlock(nn.Module):
    joint_num: int = 21
    dim: int = 128
    dtype: Any = jnp.float32
    use_pallas_desa: bool = False   # fused DESA kernel on the eval path
    pallas_interpret: bool = False
    # transformer dropout (reference config/config.json: 0.1); 0 disables —
    # used by the multi-step training-trajectory parity test, where RNG
    # streams can't be aligned across frameworks
    dropout: float = 0.1

    @nn.compact
    def __call__(self, img_feat, img_feat_rgb, pcl, joint_xyz,
                 sampled, weight_map,
                 updated_2d_feature: Optional[jnp.ndarray],
                 frame: CropFrame, img_down, kernel: float = 0.8,
                 train: bool = False):
        """One KFAM stage.

        img_feat / img_feat_rgb: [B,H,W,C] backbone features (H=W=32).
        pcl [B,N,3]; joint_xyz [B,J,3] current joint estimate;
        sampled [B,N,2C+J] per-point sampled pixel features — the
        channel-concat [img_feat | img_feat_rgb | weight_map] looked up at
        each cloud point's top-k nearest pixels (computed ONCE in KPFusion:
        the maps don't change between stages, so the reference's per-block
        re-gathers, model/model.py:297-306, are redundant work);
        weight_map [B,H,W,J] — the weight channels of the (stop-gradient)
        depth dense prediction;
        updated_2d_feature [B,J,C] from the previous stage or None;
        img_down [B,H,W,1] nearest-downsampled depth.

        Returns (refined_3d [B,J,3], refined_2d [B,J,3],
                 img_feat_j [B,J,C], spatial_weight [B,H,W,J]).
        """
        b, h, w, c = img_feat.shape
        j = self.joint_num
        n = pcl.shape[1]

        # ---- RGB keypoint aggregation (model/model.py:294-320) ----
        pcl_offset_xyz = jax.lax.stop_gradient(
            pcl_joint_to_offset(joint_xyz, pcl, kernel))       # [B,N,4J]
        pcl_feat = sampled[..., :c].astype(self.dtype)
        pcl_feat_rgb = sampled[..., c:2 * c].astype(self.dtype)
        pcl_weight = jax.lax.stop_gradient(
            sampled[..., 2 * c:].astype(self.dtype))

        # decoupled feature / xyz / pose embeddings
        pose = jnp.concatenate([pcl_weight, pcl_offset_xyz], axis=-1)
        pcl_feat = nn.relu(
            _EmbedBN(self.dim, self.dtype, name='pcl_feat_emb')(pcl_feat, train)
            + _EmbedBN(self.dim, self.dtype, name='pcl_xyz_emb')(pcl, train)
            + _EmbedBN(self.dim, self.dtype, name='pcl_pose_emb')(pose, train))
        pcl_feat = nn.relu(
            pcl_feat + _EmbedBN(self.dim, self.dtype, name='pcl_feat_emb_rgb')(
                pcl_feat_rgb, train))

        # attention pooling points → joints
        attention = jax.nn.softmax(
            jnp.transpose(pcl_weight, (0, 2, 1)), axis=-1)     # [B,J,N]
        joint_feat = jnp.einsum('bjn,bnc->bjc', attention, pcl_feat)

        joint_xyz_sg = jax.lax.stop_gradient(joint_xyz)
        joint_feat = nn.relu(
            _EmbedBN(self.dim, self.dtype, name='joint_feat_emb')(joint_feat,
                                                                  train)
            + _EmbedBN(self.dim, self.dtype, name='joint_xyz_emb')(
                joint_xyz_sg, train))
        joint_feat = DESA(self.dim, (128, 128), (64, 64, 64),
                          (0.1, 0.2, 0.4), dtype=self.dtype,
                          use_pallas=self.use_pallas_desa,
                          pallas_interpret=self.pallas_interpret,
                          name='FA')(
            pcl_feat, joint_feat, pcl, joint_xyz_sg, train)

        # ---- intra-modal keypoint interaction (model/model.py:330) ----
        init_seq, refined_3d = KPInteraction(
            img_dim=self.dim, dropout=self.dropout, dtype=self.dtype,
            name='init_TR')(joint_feat, train)

        # ---- depth keypoint aggregation (model/model.py:332-344) ----
        hm = joint_to_heatmap(refined_3d[..., :2], kernel, h, sigma=1.0)
        gam = img_to_anchor_dis(refined_3d, img_down, frame)    # [B,H,W,J]
        spatial_weight = nn.sigmoid(
            nn.Conv(j, (1, 1), use_bias=True, kernel_init=conv_init,
                    dtype=self.dtype, name='atten_spatial')(
                jnp.concatenate([img_feat_rgb, hm], axis=-1)))
        weight_dis = nn.sigmoid(
            self.param('weight_dis', nn.initializers.zeros, (1,)))
        gate = weight_dis * gam + (1.0 - weight_dis) * spatial_weight
        # gate > 0 ⇒ relu(gate*feat) == gate*relu(feat): fold the FC over
        # pixels into a [B,J,HW] @ [B,HW,C] matmul (see module docstring)
        fc_w = self.param('fc_spatial2joint_w', linear_init, (h * w, 1))
        fc_b = self.param('fc_spatial2joint_b', nn.initializers.zeros, (1,))
        gate_flat = gate.reshape(b, h * w, j)                   # [B,HW,J]
        gated_w = jnp.transpose(gate_flat * fc_w, (0, 2, 1))    # [B,J,HW]
        relu_feat = nn.relu(img_feat_rgb).reshape(b, h * w, c)
        img_feat_j = jnp.einsum('bjm,bmc->bjc', gated_w, relu_feat) + fc_b

        if updated_2d_feature is not None:
            img_feat_j = nn.relu((img_feat_j + updated_2d_feature) / 2.0)

        # ---- inter-modal keypoint interaction (model/model.py:346-349) ----
        cross = CrossDecoder(hidden=self.dim, joint_num=j,
                             dropout=self.dropout, dtype=self.dtype,
                             name='crossTR')(img_feat_j, init_seq, train)
        refined_feat = jnp.concatenate([refined_3d, cross], axis=-1)
        _, refined_2d = KPInteraction(
            img_dim=self.dim + 3, dropout=self.dropout, dtype=self.dtype,
            name='final_TR')(refined_feat, train)

        return refined_3d, refined_2d, img_feat_j, spatial_weight
