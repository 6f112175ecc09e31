"""Wav2Vec 2.0 in flax — frozen audio embedder for the CLIP target space.

The reference uses HuggingFace's torch ``Wav2Vec2Model``
(facebook/wav2vec2-large-xlsr-53) on CPU/GPU to precompute speech embeddings
[ref: speech_decoding/utils/wav2vec_util.py:8-32]; here the whole embedder
runs jitted on TPU. Architecture follows the public wav2vec2 "large" recipe
(Baevski et al. 2020; HF transformers implementation), xlsr-53 flavor:

  * 7-layer conv feature extractor (512 ch; strides 5,2,2,2,2,2,2; kernels
    10,3,3,3,3,2,2), conv_bias=True, per-layer LayerNorm ('layer' norm mode);
  * feature projection LayerNorm(512) -> Dense(1024);
  * grouped weight-normed conv positional embedding (kernel 128, 16 groups);
  * 24 pre-LN transformer layers (d=1024, 16 heads, FFN 4096, exact GELU)
    with a final LayerNorm (do_stable_layer_norm=True);
  * hidden_states list matches HF: [proj(+pos), layer_1 … layer_23 inputs…,
    final_LN(layer_24)] so the reference's last-4-layer average
    [ref: wav2vec_util.py:17-20] is reproducible exactly.

Weights port from a HF torch state_dict via ``params_from_torch``. Everything
is inference-only (the reference freezes wav2vec2 — model.eval(), no_grad).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class Wav2Vec2Config:
    conv_dim: Tuple[int, ...] = (512,) * 7
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_bias: bool = True
    feat_extract_norm: str = "layer"  # 'layer' (large/xlsr) or 'group' (base)
    hidden_size: int = 1024
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    intermediate_size: int = 4096
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    do_stable_layer_norm: bool = True
    layer_norm_eps: float = 1e-5

    @classmethod
    def tiny(cls) -> "Wav2Vec2Config":
        """Small config for tests (matches an HF config with the same fields)."""
        return cls(
            conv_dim=(16, 16, 16),
            conv_stride=(5, 2, 2),
            conv_kernel=(10, 3, 3),
            hidden_size=32,
            num_hidden_layers=2,
            num_attention_heads=4,
            intermediate_size=64,
            num_conv_pos_embeddings=16,
            num_conv_pos_embedding_groups=4,
        )


class ConvFeatureExtractor(nn.Module):
    """Raw waveform (B, T) -> features (B, T', C_last). 'layer' norm mode:
    conv -> LayerNorm(channels) -> exact GELU per layer."""

    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = x[..., None]  # (B, T, 1)
        for i, (dim, stride, kernel) in enumerate(
            zip(self.cfg.conv_dim, self.cfg.conv_stride, self.cfg.conv_kernel)
        ):
            h = nn.Conv(
                features=dim,
                kernel_size=(kernel,),
                strides=(stride,),
                padding="VALID",
                use_bias=self.cfg.conv_bias,
                name=f"conv_{i}",
            )(h)
            if self.cfg.feat_extract_norm == "layer":
                h = nn.LayerNorm(epsilon=self.cfg.layer_norm_eps, name=f"ln_{i}")(h)
            elif i == 0:  # 'group' mode: GroupNorm only on the first layer
                h = nn.GroupNorm(
                    num_groups=dim, epsilon=self.cfg.layer_norm_eps, name="gn_0"
                )(h)
            h = nn.gelu(h, approximate=False)
        return h


class PositionalConvEmbedding(nn.Module):
    """Grouped conv positional embedding with weight normalization."""

    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(self, x: Array) -> Array:
        k = self.cfg.num_conv_pos_embeddings
        g = self.cfg.num_conv_pos_embedding_groups
        d = self.cfg.hidden_size
        # weight-normalized kernel, stored as direction v and magnitude g_mag
        # (HF keeps weight_v/weight_g with weight_norm dim=2: the norm is taken
        # over (out, in) separately for each kernel position)
        v = self.param("weight_v", nn.initializers.normal(0.02), (k, d // g, d))
        g_mag = self.param("weight_g", nn.initializers.ones, (k, 1, 1))
        b = self.param("bias", nn.initializers.zeros, (d,))
        norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=(1, 2), keepdims=True))
        w = v / norm * g_mag
        pad = k // 2
        y = jax.lax.conv_general_dilated(
            x, w, (1,), [(pad, pad)],
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=g,
        ) + b
        if k % 2 == 0:
            y = y[:, :-1]  # HF removes one when the kernel is even
        return nn.gelu(y, approximate=False)


class SelfAttention(nn.Module):
    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(self, x: Array) -> Array:
        d = self.cfg.hidden_size
        h = self.cfg.num_attention_heads
        hd = d // h
        q = nn.Dense(d, name="q_proj")(x) * (hd**-0.5)
        k = nn.Dense(d, name="k_proj")(x)
        v = nn.Dense(d, name="v_proj")(x)

        def split(t):
            return t.reshape(t.shape[0], t.shape[1], h, hd)

        attn = jnp.einsum("bqhd,bkhd->bhqk", split(q), split(k))
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, split(v))
        out = out.reshape(x.shape[0], x.shape[1], d)
        return nn.Dense(d, name="out_proj")(out)


class EncoderLayer(nn.Module):
    """Pre-LN (stable-layer-norm) transformer layer."""

    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(self, x: Array) -> Array:
        eps = self.cfg.layer_norm_eps
        a = SelfAttention(self.cfg, name="attention")(
            nn.LayerNorm(epsilon=eps, name="ln1")(x)
        )
        x = x + a
        f = nn.LayerNorm(epsilon=eps, name="ln2")(x)
        f = nn.gelu(nn.Dense(self.cfg.intermediate_size, name="fc1")(f), approximate=False)
        f = nn.Dense(self.cfg.hidden_size, name="fc2")(f)
        return x + f


class PostLNEncoderLayer(nn.Module):
    """Post-LN layer (do_stable_layer_norm=False models, e.g. base)."""

    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(self, x: Array) -> Array:
        eps = self.cfg.layer_norm_eps
        x = nn.LayerNorm(epsilon=eps, name="ln1")(
            x + SelfAttention(self.cfg, name="attention")(x)
        )
        f = nn.gelu(nn.Dense(self.cfg.intermediate_size, name="fc1")(x), approximate=False)
        f = nn.Dense(self.cfg.hidden_size, name="fc2")(f)
        return nn.LayerNorm(epsilon=eps, name="ln2")(x + f)


class Wav2Vec2Model(nn.Module):
    """Full model. __call__(waveform (B, T)) -> (last_hidden, hidden_states)."""

    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(
        self, x: Array, output_hidden_states: bool = False
    ):
        cfg = self.cfg
        eps = cfg.layer_norm_eps
        feats = ConvFeatureExtractor(cfg, name="feature_extractor")(x)  # (B, T', 512)
        h = nn.LayerNorm(epsilon=eps, name="feature_projection_ln")(feats)
        h = nn.Dense(cfg.hidden_size, name="feature_projection")(h)

        h = h + PositionalConvEmbedding(cfg, name="pos_conv")(h)
        if not cfg.do_stable_layer_norm:
            h = nn.LayerNorm(epsilon=eps, name="encoder_ln")(h)

        hidden_states: List[Array] = [h]
        layer_cls = EncoderLayer if cfg.do_stable_layer_norm else PostLNEncoderLayer
        for i in range(cfg.num_hidden_layers):
            h = layer_cls(cfg, name=f"layer_{i}")(h)
            hidden_states.append(h)
        if cfg.do_stable_layer_norm:
            h = nn.LayerNorm(epsilon=eps, name="encoder_ln")(h)
            hidden_states[-1] = h  # HF replaces the last entry with the LN'd one

        if output_hidden_states:
            return h, hidden_states
        return h


def extract_features(variables: Dict, cfg: Wav2Vec2Config, x: Array) -> Array:
    """The conv feature-extractor path used when last4layers=False
    [ref: brennan2018.py:187-189]: (B, T) -> (B, T', 512). Applies only the
    feature_extractor subtree of a full model's params."""
    sub = {"params": variables["params"]["feature_extractor"]}
    return ConvFeatureExtractor(cfg).apply(sub, x)


# ---------------------------------------------------------------------------
# HF torch state_dict -> flax params port
# ---------------------------------------------------------------------------


def params_from_torch(state_dict: Dict[str, Any], cfg: Wav2Vec2Config) -> Dict:
    """Map a HF transformers Wav2Vec2Model state_dict into this module's
    params pytree. Accepts torch tensors or numpy arrays."""

    def g(name):
        t = state_dict[name]
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)

    p: Dict[str, Any] = {}

    fe: Dict[str, Any] = {}
    for i in range(len(cfg.conv_dim)):
        conv = {"kernel": g(f"feature_extractor.conv_layers.{i}.conv.weight").transpose(2, 1, 0)}
        if cfg.conv_bias:
            conv["bias"] = g(f"feature_extractor.conv_layers.{i}.conv.bias")
        fe[f"conv_{i}"] = conv
        if cfg.feat_extract_norm == "layer":
            fe[f"ln_{i}"] = {
                "scale": g(f"feature_extractor.conv_layers.{i}.layer_norm.weight"),
                "bias": g(f"feature_extractor.conv_layers.{i}.layer_norm.bias"),
            }
        elif i == 0:
            fe["gn_0"] = {
                "scale": g("feature_extractor.conv_layers.0.layer_norm.weight"),
                "bias": g("feature_extractor.conv_layers.0.layer_norm.bias"),
            }
    p["feature_extractor"] = fe

    p["feature_projection_ln"] = {
        "scale": g("feature_projection.layer_norm.weight"),
        "bias": g("feature_projection.layer_norm.bias"),
    }
    p["feature_projection"] = {
        "kernel": g("feature_projection.projection.weight").T,
        "bias": g("feature_projection.projection.bias"),
    }

    # pos conv: torch conv weight (out, in/groups, k) [weight-norm v], g (out,1,1)
    for wg_name, wv_name in [
        ("encoder.pos_conv_embed.conv.weight_g", "encoder.pos_conv_embed.conv.weight_v"),
        (
            "encoder.pos_conv_embed.conv.parametrizations.weight.original0",
            "encoder.pos_conv_embed.conv.parametrizations.weight.original1",
        ),
    ]:
        if wg_name in state_dict:
            wv = g(wv_name)  # (out, in/groups, k)
            wg = g(wg_name)  # (out, 1, 1)
            break
    else:
        raise KeyError("pos_conv weight-norm params not found in state_dict")
    p["pos_conv"] = {
        "weight_v": wv.transpose(2, 1, 0),  # -> (k, in/groups, out)
        "weight_g": wg.transpose(2, 1, 0),  # (1, 1, k) -> (k, 1, 1)
        "bias": g("encoder.pos_conv_embed.conv.bias"),
    }

    p["encoder_ln"] = {
        "scale": g("encoder.layer_norm.weight"),
        "bias": g("encoder.layer_norm.bias"),
    }

    for i in range(cfg.num_hidden_layers):
        pre = f"encoder.layers.{i}"
        layer = {
            "attention": {
                name: {
                    "kernel": g(f"{pre}.attention.{name}.weight").T,
                    "bias": g(f"{pre}.attention.{name}.bias"),
                }
                for name in ("q_proj", "k_proj", "v_proj", "out_proj")
            },
            "ln1": {
                "scale": g(f"{pre}.layer_norm.weight"),
                "bias": g(f"{pre}.layer_norm.bias"),
            },
            "fc1": {
                "kernel": g(f"{pre}.feed_forward.intermediate_dense.weight").T,
                "bias": g(f"{pre}.feed_forward.intermediate_dense.bias"),
            },
            "fc2": {
                "kernel": g(f"{pre}.feed_forward.output_dense.weight").T,
                "bias": g(f"{pre}.feed_forward.output_dense.bias"),
            },
            "ln2": {
                "scale": g(f"{pre}.final_layer_norm.weight"),
                "bias": g(f"{pre}.final_layer_norm.bias"),
            },
        }
        p[f"layer_{i}"] = layer
    return {"params": p}
