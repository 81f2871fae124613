"""Torch→Flax conversion parity tests: every mapping primitive is checked
numerically against the corresponding torch module in eval mode."""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from keypointfusion_tpu.models.resnet import ResNet
from keypointfusion_tpu.models.unet import Residual
from keypointfusion_tpu.models.transformer import (
    PostLNLayer, CrossDecoderLayer,
)
from keypointfusion_tpu.utils import torch_convert as tc

sys.path.insert(0, "/root/reference")


def to_nhwc(x):
    return jnp.asarray(np.moveaxis(x, 1, -1))


def test_resnet18_forward_parity():
    from model.resnet import ResNet as RefResNet, BasicBlock  # type: ignore
    torch.manual_seed(0)
    ref = RefResNet(BasicBlock, [2, 2, 2, 2]).eval()
    sd = ref.state_dict()
    params, stats = tc.convert_resnet(sd, 18)

    x = np.random.RandomState(0).randn(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref_outs = ref(torch.from_numpy(x))

    model = ResNet(depth=18)
    outs = model.apply({'params': params, 'batch_stats': stats}, to_nhwc(x))
    for got, want in zip(outs, ref_outs):
        want = np.moveaxis(want.numpy(), 1, -1)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3,
                                   atol=1e-3)


def test_residual_forward_parity():
    from model.hourglass import Residual as RefResidual  # type: ignore
    torch.manual_seed(1)
    ref = RefResidual(64, 128).eval()
    sd = {f'm.{k}': v for k, v in ref.state_dict().items()}
    params, stats = tc.convert_residual_with_skip(sd, 'm', need_skip=True)

    x = np.random.RandomState(1).randn(2, 64, 8, 8).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    model = Residual(out_dim=128)
    got = model.apply({'params': params, 'batch_stats': stats}, to_nhwc(x))
    np.testing.assert_allclose(np.asarray(got), np.moveaxis(want, 1, -1),
                               rtol=1e-3, atol=1e-4)


def test_torch_mha_parity():
    torch.manual_seed(2)
    heads, c = 4, 128
    ref = torch.nn.MultiheadAttention(c, heads, dropout=0.0).eval()
    sd = {f'm.{k}': v for k, v in ref.state_dict().items()}
    mha_params = tc.convert_mha_torch(sd, 'm', heads)

    rng = np.random.RandomState(2)
    q = rng.randn(21, 2, c).astype(np.float32)   # [seq, batch, C]
    k = rng.randn(21, 2, c).astype(np.float32)
    with torch.no_grad():
        want, _ = ref(torch.from_numpy(q), torch.from_numpy(k),
                      torch.from_numpy(k))
    want = np.transpose(want.numpy(), (1, 0, 2))  # [B, seq, C]

    import flax.linen as nn
    mha = nn.MultiHeadDotProductAttention(num_heads=heads, qkv_features=c,
                                          out_features=c, dropout_rate=0.0,
                                          deterministic=True)
    got = mha.apply({'params': mha_params},
                    jnp.asarray(np.transpose(q, (1, 0, 2))),
                    jnp.asarray(np.transpose(k, (1, 0, 2))),
                    jnp.asarray(np.transpose(k, (1, 0, 2))))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


def test_bert_layer_parity():
    from transformers.models.bert.modeling_bert import (
        BertConfig, BertLayer,
    )
    cfg = BertConfig(hidden_size=128, num_attention_heads=4,
                     intermediate_size=16, hidden_dropout_prob=0.0,
                     attention_probs_dropout_prob=0.0, hidden_act='gelu',
                     attn_implementation='eager')
    if getattr(cfg, '_attn_implementation', 'eager') is None:
        cfg._attn_implementation = 'eager'
    torch.manual_seed(3)
    ref = BertLayer(cfg).eval()
    sd = {f'l.{k}': v for k, v in ref.state_dict().items()}
    params = {
        'attn': tc.convert_mha_bert(sd, 'l.attention', 4),
        'ln_attn': tc.layernorm(sd, 'l.attention.output.LayerNorm'),
        'ffn_in': tc.dense(sd, 'l.intermediate.dense'),
        'ffn_out': tc.dense(sd, 'l.output.dense'),
        'ln_ffn': tc.layernorm(sd, 'l.output.LayerNorm'),
    }
    x = np.random.RandomState(3).randn(2, 21, 128).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x))[0].numpy()
    layer = PostLNLayer(hidden=128, heads=4, intermediate=16, dropout=0.0)
    got = layer.apply({'params': params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


def test_cross_decoder_layer_parity():
    """Full cross-only decoder layer vs the reference TransformerDecoderLayer
    (transfusion_head.py:94-173, from-scratch MHA)."""
    import transformers.pytorch_utils as ptu
    if not hasattr(ptu, 'torch_int_div'):  # removed in new transformers
        ptu.torch_int_div = lambda a, b: torch.div(
            a, b, rounding_mode='floor')
    from model.transfusion_head import TransformerDecoderLayer  # type: ignore
    torch.manual_seed(4)
    ref = TransformerDecoderLayer(
        128, 4, 128, dropout=0.0, activation='relu',
        self_posembed=torch.nn.Embedding(21, 128),
        cross_posembed=torch.nn.Embedding(21, 128),
        cross_only=True).eval()
    sd = {f'm.decoder.0.{k}': v for k, v in ref.state_dict().items()}
    params = tc.convert_cross_decoder(sd, 'm', layers=1)['layer_0']

    rng = np.random.RandomState(4)
    query = rng.randn(2, 21, 128).astype(np.float32)
    key = rng.randn(2, 21, 128).astype(np.float32)
    idx = torch.arange(21).unsqueeze(0).expand(2, 21)
    with torch.no_grad():
        want = ref(torch.from_numpy(query), torch.from_numpy(key),
                   idx, idx)
    want = np.transpose(want.numpy(), (0, 2, 1))  # B C P → B P C

    layer = CrossDecoderLayer(hidden=128, heads=4, ffn=128, dropout=0.0,
                              joint_num=21)
    got = layer.apply({'params': params}, jnp.asarray(query),
                      jnp.asarray(key))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)
