"""Keypoint transformers: the BERT-style intra-modal encoder and the
cross-only DETR-style decoder, as plain Flax attention stacks.

The reference wraps HuggingFace BERT purely as a generic post-LN transformer
encoder (4 layers / 4 heads / hidden 128 / intermediate 16, random-init —
reference model/model.py:30-126, 222-245) and hand-rolls a MultiheadAttention
for the cross decoder (model/transfusion_head.py:94-173, 635-708). Here both
are small Flax modules; 21-token sequences are tiny, so everything fuses into
a handful of MXU matmuls under jit — no Pallas attention needed at J=21.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

dense_init = nn.initializers.normal(stddev=0.02)   # BERT initializer_range


class PostLNLayer(nn.Module):
    """One post-LN encoder layer: MHA → dropout → LN(res), FFN(gelu) →
    dropout → LN(res). Mirrors the BertEncoder layer semantics."""
    hidden: int = 128
    heads: int = 4
    intermediate: int = 16
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.hidden,
            out_features=self.hidden, dropout_rate=self.dropout,
            deterministic=not train, kernel_init=dense_init,
            dtype=self.dtype, name='attn')(x, x, x)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        x = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype,
                         name='ln_attn')(x + attn)
        h = nn.Dense(self.intermediate, kernel_init=dense_init,
                     dtype=self.dtype, name='ffn_in')(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.hidden, kernel_init=dense_init, dtype=self.dtype,
                     name='ffn_out')(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return nn.LayerNorm(epsilon=1e-12, dtype=self.dtype,
                            name='ln_ffn')(x + h)


class KeypointEncoder(nn.Module):
    """TR_Encoder equivalent (model/model.py:30-103): learned position
    embedding + linear image-feature embedding → post-LN encoder stack."""
    hidden: int = 128
    heads: int = 4
    layers: int = 4
    intermediate: int = 16
    img_dim: int = 128
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img_feats, train: bool = False):
        b, seq, _ = img_feats.shape
        pos = nn.Embed(512, self.hidden, embedding_init=dense_init,
                       dtype=self.dtype, name='position_embeddings')(
            jnp.arange(seq))
        x = nn.Dense(self.hidden, kernel_init=dense_init, dtype=self.dtype,
                     name='img_embedding')(img_feats) + pos[None]
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        for i in range(self.layers):
            x = PostLNLayer(self.hidden, self.heads, self.intermediate,
                            self.dropout, dtype=self.dtype,
                            name=f'layer_{i}')(x, train)
        return x


class KPInteraction(nn.Module):
    """KP_Interaction_TR (model/model.py:106-126): encoder + cls head with a
    linear residual from the raw input features. Returns (sequence [B,J,H],
    prediction [B,J,out])."""
    hidden: int = 128
    heads: int = 4
    layers: int = 4
    intermediate: int = 16
    img_dim: int = 128
    out_dim: int = 3
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img_feats, train: bool = False):
        seq = KeypointEncoder(self.hidden, self.heads, self.layers,
                              self.intermediate, self.img_dim, self.dropout,
                              dtype=self.dtype, name='bert')(img_feats, train)
        pred = nn.Dense(self.out_dim, kernel_init=dense_init,
                        dtype=self.dtype, name='cls_head')(seq)
        pred = pred + nn.Dense(self.out_dim, kernel_init=dense_init,
                               dtype=self.dtype, name='residual')(img_feats)
        return seq, pred


class CrossDecoderLayer(nn.Module):
    """Cross-only decoder layer (transfusion_head.py:94-173, cross_only=True):
    learned per-layer query/key position embeddings added to q, k AND v,
    post-LN, ReLU FFN."""
    hidden: int = 128
    heads: int = 4
    ffn: int = 128
    dropout: float = 0.1
    joint_num: int = 21
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, key, train: bool = False):
        j = query.shape[1]
        q_pos = nn.Embed(self.joint_num, self.hidden,
                         dtype=self.dtype, name='self_posembed')(
            jnp.arange(j))
        k_pos = nn.Embed(self.joint_num, self.hidden,
                         dtype=self.dtype, name='cross_posembed')(
            jnp.arange(j))
        q = query + q_pos[None]
        kv = key + k_pos[None]
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.hidden,
            out_features=self.hidden, dropout_rate=self.dropout,
            deterministic=not train,
            kernel_init=nn.initializers.xavier_uniform(),
            dtype=self.dtype, name='cross_attn')(q, kv, kv)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        x = nn.LayerNorm(dtype=self.dtype, name='norm2')(query + attn)
        h = nn.Dense(self.ffn, kernel_init=nn.initializers.xavier_uniform(),
                     dtype=self.dtype, name='linear1')(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(self.hidden,
                     kernel_init=nn.initializers.xavier_uniform(),
                     dtype=self.dtype, name='linear2')(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return nn.LayerNorm(dtype=self.dtype, name='norm3')(x + h)


class CrossDecoder(nn.Module):
    """updatedDecoder (transfusion_head.py:635-708): N cross-only layers.

    Reference quirk replicated exactly: every layer receives the ORIGINAL
    anchor features (transfusion_head.py:703-706 re-feeds `anchor_feats`
    each iteration) and only the LAST layer's output is returned — layers
    0..N-2 never influence the result (and receive no gradient). All
    layers are still declared so converted reference checkpoints load;
    XLA dead-code-eliminates the unused ones at compile time."""
    hidden: int = 128
    heads: int = 4
    ffn: int = 128
    dropout: float = 0.1
    layers: int = 4
    joint_num: int = 21
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, anchor_feats, img_feats, train: bool = False):
        out = anchor_feats
        for i in range(self.layers):
            out = CrossDecoderLayer(self.hidden, self.heads, self.ffn,
                                    self.dropout, self.joint_num,
                                    dtype=self.dtype,
                                    name=f'layer_{i}')(anchor_feats,
                                                       img_feats, train)
        return out
