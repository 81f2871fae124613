"""Image-sequence cross-attention variants (unused by the flagship path but
part of the reference's component inventory): DETR sine position embedding,
detrDecoder (joints attend to the 32x32=1024 image tokens) and
spatial_aggregate_TR (image tokens attend to joints).

Rebuilds reference model/transfusion_head.py:57-91 (sine embedding),
:560-632 (detrDecoder), :711-783 (spatial_aggregate_TR). At 1024 keys a
plain fused attention is optimal on TPU (SURVEY.md §5.7); no flash kernel
needed.
"""

from __future__ import annotations

import math
from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from keypointfusion_tpu.models.transformer import CrossDecoderLayer


def detr_sine_position_embedding(h: int, w: int, embedding_dim: int = 64,
                                 temperature: float = 10000.0,
                                 normalize: bool = True) -> jnp.ndarray:
    """[H, W, 2*embedding_dim] sine/cosine position features
    (transfusion_head.py:57-91, all-ones pixel mask)."""
    scale = 2 * math.pi
    y = jnp.arange(1, h + 1, dtype=jnp.float32)[:, None]
    x = jnp.arange(1, w + 1, dtype=jnp.float32)[None, :]
    y = jnp.broadcast_to(y, (h, w))
    x = jnp.broadcast_to(x, (h, w))
    if normalize:
        y = y / (h + 1e-6) * scale
        x = x / (w + 1e-6) * scale
    dim_t = jnp.arange(embedding_dim, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / embedding_dim)
    pos_x = x[..., None] / dim_t
    pos_y = y[..., None] / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]),
                       jnp.cos(pos_x[..., 1::2])], -1).reshape(h, w, -1)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]),
                       jnp.cos(pos_y[..., 1::2])], -1).reshape(h, w, -1)
    return jnp.concatenate([pos_y, pos_x], axis=-1)


class _ImageCrossLayer(nn.Module):
    """Cross-only layer with explicit (non-embedded) position tensors —
    the TransformerDecoderLayer pathway where self/cross_posembed is None
    (transfusion_head.py:141-151)."""
    hidden: int = 128
    heads: int = 4
    ffn: int = 128
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, key, query_pos, key_pos, train: bool = False):
        q = query + query_pos
        kv = key + key_pos
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.hidden,
            out_features=self.hidden, dropout_rate=self.dropout,
            deterministic=not train,
            kernel_init=nn.initializers.xavier_uniform(),
            dtype=self.dtype, name='cross_attn')(q, kv, kv)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        x = nn.LayerNorm(dtype=self.dtype, name='norm2')(query + attn)
        h = nn.relu(nn.Dense(self.ffn, dtype=self.dtype, name='linear1')(x))
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(self.hidden, dtype=self.dtype, name='linear2')(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return nn.LayerNorm(dtype=self.dtype, name='norm3')(x + h)


class DetrDecoder(nn.Module):
    """Joints (learned query pos) attend over image tokens (sine key pos)
    (transfusion_head.py:560-632)."""
    joint_num: int = 21
    hidden: int = 128
    heads: int = 4
    ffn: int = 128
    dropout: float = 0.1
    layers: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, anchor_feats, img_feats, train: bool = False):
        """anchor_feats [B,J,C]; img_feats [B,H,W,C] → [B,J,C]."""
        b, h, w, c = img_feats.shape
        key = img_feats.reshape(b, h * w, c)
        key_pos = detr_sine_position_embedding(h, w, self.hidden // 2)
        key_pos = jnp.broadcast_to(key_pos.reshape(1, h * w, -1),
                                   (b, h * w, self.hidden))
        # reference quirk: each layer sees the ORIGINAL anchors; only the
        # last layer's output is returned (transfusion_head.py:625-631)
        out = anchor_feats
        for i in range(self.layers):
            q_pos = nn.Embed(self.joint_num, self.hidden, dtype=self.dtype,
                             name=f'query_pos_{i}')(
                jnp.arange(self.joint_num))[None]
            out = _ImageCrossLayer(self.hidden, self.heads, self.ffn,
                                   self.dropout, dtype=self.dtype,
                                   name=f'layer_{i}')(anchor_feats, key,
                                                      q_pos, key_pos, train)
        return out


class SpatialAggregateTR(nn.Module):
    """Image tokens (sine query pos) attend over joints (learned key pos)
    (transfusion_head.py:711-783)."""
    joint_num: int = 21
    hidden: int = 128
    heads: int = 4
    ffn: int = 128
    dropout: float = 0.1
    layers: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img_feats, anchor_feats, train: bool = False):
        """img_feats [B,H,W,C]; anchor_feats [B,J,C] → [B,H*W,C]."""
        b, h, w, c = img_feats.shape
        query = img_feats.reshape(b, h * w, c)
        q_pos = detr_sine_position_embedding(h, w, self.hidden // 2)
        q_pos = jnp.broadcast_to(q_pos.reshape(1, h * w, -1),
                                 (b, h * w, self.hidden))
        # reference quirk: constant query input, last output returned
        # (transfusion_head.py:776-781)
        out = query
        for i in range(self.layers):
            k_pos = nn.Embed(self.joint_num, self.hidden, dtype=self.dtype,
                             name=f'key_pos_{i}')(
                jnp.arange(self.joint_num))[None]
            out = _ImageCrossLayer(self.hidden, self.heads, self.ffn,
                                   self.dropout, dtype=self.dtype,
                                   name=f'layer_{i}')(query, anchor_feats,
                                                      q_pos, k_pos, train)
        return out
