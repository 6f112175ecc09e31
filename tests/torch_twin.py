"""Independent torch 'equivalence twin' of the brain encoder forward pass.

A deliberately naive functional re-derivation of the architecture from the
Défossez-2022 paper description, used to golden-check the JAX modules. It
consumes the *JAX* parameter pytree (so only forward semantics are compared,
not initialization) and computes everything with torch CPU ops in the
reference's (B, C, T) layout. Written independently of the reference code —
the equivalence-twin testing pattern itself mirrors the reference's
tests/test_modules/__init__.py:1-6 idea.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as TF


def t(x) -> torch.Tensor:
    return torch.from_numpy(np.asarray(x, np.float32))


def spatial_attention_weights(params: dict, loc: np.ndarray, K: int) -> torch.Tensor:
    """(D1, C) softmax channel-mix weights from Fourier params."""
    z_re, z_im = t(params["z_re"]), t(params["z_im"])  # (D1, K^2)
    kk = torch.arange(K, dtype=torch.float32).repeat_interleave(K)
    ll = torch.arange(K, dtype=torch.float32).repeat(K)
    x, y = t(loc[:, 0]), t(loc[:, 1])
    phi = 2 * math.pi * (kk[:, None] * x[None, :] + ll[:, None] * y[None, :])
    a = z_re @ torch.cos(phi) + z_im @ torch.sin(phi)
    return torch.softmax(a, dim=-1)


def conv1d_same(x: torch.Tensor, kernel, bias=None, dilation: int = 1) -> torch.Tensor:
    """x: (B, C, T); kernel: jax layout (K, in, out)."""
    w = t(kernel).permute(2, 1, 0)  # (out, in, K)
    b = t(bias) if bias is not None else None
    return TF.conv1d(x, w, b, padding="same", dilation=dilation)


def batchnorm_eval(x: torch.Tensor, p: dict, s: dict) -> torch.Tensor:
    """(B, C, T) batchnorm with running stats, torch semantics."""
    return TF.batch_norm(
        x,
        t(s["mean"]),
        t(s["var"]),
        t(p["scale"]),
        t(p["bias"]),
        training=False,
        eps=1e-5,
    )


def batchnorm_train(x: torch.Tensor, p: dict, s: dict, momentum=0.1):
    """Returns (y, new_mean, new_var) like torch BatchNorm1d in train mode."""
    rm, rv = t(s["mean"]).clone(), t(s["var"]).clone()
    y = TF.batch_norm(
        x, rm, rv, t(p["scale"]), t(p["bias"]), training=True, momentum=momentum, eps=1e-5
    )
    return y, rm, rv


def brain_encoder_forward(
    params: dict,
    stats: dict,
    loc: np.ndarray,
    X: np.ndarray,
    subject_idxs: np.ndarray,
    K: int,
    training_bn: bool = False,
) -> torch.Tensor:
    """Full eval-mode forward (no spatial dropout), (B, C, T) -> (B, F, T)."""
    Xt = t(X)

    # --- subject block ---
    sb = params["subject_block"]
    wts = spatial_attention_weights(sb["spatial_attention"], loc, K)
    h = torch.einsum("oc,bct->bot", wts, Xt)
    h = conv1d_same(h, sb["conv"]["kernel"], sb["conv"]["bias"])
    W = t(sb["subject_kernel"])  # (S, in, out)
    h = torch.einsum("bio,bit->bot", W[torch.from_numpy(np.asarray(subject_idxs))], h)

    # --- conv blocks ---
    for k in range(5):
        p = params[f"conv{k}"]
        s = stats[f"conv{k}"]
        d0, d1 = 2 ** ((2 * k) % 5), 2 ** ((2 * k + 1) % 5)
        y = conv1d_same(h, p["conv0"]["kernel"], p["conv0"]["bias"], d0)
        if k > 0:
            y = y + h
        if training_bn:
            y, _, _ = batchnorm_train(y, p["batchnorm0"], s["batchnorm0"])
        else:
            y = batchnorm_eval(y, p["batchnorm0"], s["batchnorm0"])
        y = TF.gelu(y)
        y2 = conv1d_same(y, p["conv1"]["kernel"], p["conv1"]["bias"], d1) + y
        if training_bn:
            y2, _, _ = batchnorm_train(y2, p["batchnorm1"], s["batchnorm1"])
        else:
            y2 = batchnorm_eval(y2, p["batchnorm1"], s["batchnorm1"])
        y2 = TF.gelu(y2)
        y3 = conv1d_same(y2, p["conv2"]["kernel"], p["conv2"]["bias"], 2)
        h = TF.glu(y3, dim=1)

    h = TF.gelu(conv1d_same(h, params["conv_final1"]["kernel"], params["conv_final1"]["bias"]))
    h = TF.gelu(conv1d_same(h, params["conv_final2"]["kernel"], params["conv_final2"]["bias"]))
    return h


def clip_loss_twin(x: np.ndarray, y: np.ndarray, temp: float) -> float:
    """Symmetric InfoNCE with learned temperature, torch twin."""
    xt = t(x).reshape(x.shape[0], -1)
    yt = t(y).reshape(y.shape[0], -1)
    xt = xt / xt.norm(dim=-1, keepdim=True)
    yt = yt / yt.norm(dim=-1, keepdim=True)
    logits = (xt @ yt.T) * math.exp(temp)
    targets = torch.arange(x.shape[0])
    return float(
        (TF.cross_entropy(logits, targets) + TF.cross_entropy(logits.T, targets)) / 2
    )


def retrieval_twin(Z: np.ndarray, Y: np.ndarray, ks=(1, 10)):
    """Naive double-loop cosine retrieval, reference-style scoring
    (similarity computed Z-vs-Y then transposed before argmax/topk)."""
    B = Z.shape[0]
    z = t(Z).reshape(B, -1)
    y = t(Y).reshape(B, -1)
    sim = torch.empty(B, B)
    for i in range(B):
        for j in range(B):
            sim[i, j] = (z[i] @ y[j]) / max(float(z[i].norm() * y[j].norm()), 1e-8)
    sim = sim.T
    diags = torch.arange(B)
    out = []
    for k in ks:
        if k == 1:
            out.append(float((sim.argmax(dim=1) == diags).float().mean()))
        else:
            topk = torch.topk(sim, min(k, B), dim=1).indices
            out.append(float(np.mean([lab in row for row, lab in zip(topk, diags)])))
    return tuple(out)
