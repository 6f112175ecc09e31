"""Golden parity against the ACTUAL reference PyTorch implementation.

Imports /root/reference's speech_decoding.models + utils.loss (stubbing its
unavailable deps: termcolor/tqdm/mne), ports our JAX parameters into the torch
modules, and asserts forward/loss/retrieval equality on identical inputs.
This is the strongest parity evidence available without real data — the
reference code is executed, not reimplemented. Skipped when the reference
checkout is absent.
"""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "speech_decoding")),
    reason="reference checkout not available",
)

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_modules():
    for name, attrs in [
        ("termcolor", {"cprint": lambda *a, **k: None}),
        ("tqdm", {"tqdm": lambda x=None, **k: x}),
        ("mne", {}),
        ("mne_bids", {}),
    ]:
        if name not in sys.modules:
            mod = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(mod, k, v)
            sys.modules[name] = mod
    sys.path.insert(0, REFERENCE)
    import importlib

    models = importlib.import_module("speech_decoding.models")
    loss = importlib.import_module("speech_decoding.utils.loss")
    return models, loss


class Args:
    """Minimal config object for the reference constructors."""

    def __init__(self, loc, **kw):
        self.__dict__.update(kw)
        self._loc = loc


def _make_pair(models, d_drop):
    """Build (ref torch BrainEncoder, our flax BrainEncoder, variables, X,
    sidx) with identical weights, on a small Gwilliams-like geometry."""
    from speech_decoding_tpu.data.layout import ch_locations_2d
    from speech_decoding_tpu.models import BrainEncoder

    loc = ch_locations_2d("Gwilliams2022", cache=False)
    D1, D2, F, K, S = 32, 48, 64, 8, 3

    # patch the reference's layout lookup to our static positions
    loc_t = torch.from_numpy(np.asarray(loc, np.float32))
    models.ch_locations_2d = lambda args: loc_t

    args = Args(
        loc,
        D1=D1,
        D2=D2,
        F=F,
        K=K,
        d_drop=d_drop,
        num_subjects=S,
        dataset="Gwilliams2022",
        preprocs={"last4layers": False},
    )
    ref_enc = models.BrainEncoder(args).eval()

    ours = BrainEncoder(num_subjects=S, loc=loc, D1=D1, D2=D2, F=F, K=K, d_drop=d_drop)
    X = np.random.default_rng(0).normal(size=(4, 208, 60)).astype(np.float32)
    sidx = np.array([0, 1, 2, 0])
    variables = ours.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        X,
        sidx,
        train=False,
    )

    # port OUR params into the reference torch modules
    p = jax.tree.map(np.asarray, variables["params"])
    sd = {}
    sa = p["subject_block"]["spatial_attention"]
    sd["subject_block.spatial_attention.z"] = torch.complex(
        torch.from_numpy(sa["z_re"]), torch.from_numpy(sa["z_im"])
    )
    sd["subject_block.conv.weight"] = torch.from_numpy(
        p["subject_block"]["conv"]["kernel"][0].T[..., None]
    )
    sd["subject_block.conv.bias"] = torch.from_numpy(p["subject_block"]["conv"]["bias"])
    for s in range(S):
        sd[f"subject_block.subject_layer.{s}.weight"] = torch.from_numpy(
            p["subject_block"]["subject_kernel"][s].T[..., None]
        )
    for k in range(5):
        blk = p[f"conv{k}"]
        for conv in ("conv0", "conv1", "conv2"):
            sd[f"conv_blocks.conv{k}.{conv}.weight"] = torch.from_numpy(
                blk[conv]["kernel"].transpose(2, 1, 0)
            )
            sd[f"conv_blocks.conv{k}.{conv}.bias"] = torch.from_numpy(blk[conv]["bias"])
        for bn in ("batchnorm0", "batchnorm1"):
            sd[f"conv_blocks.conv{k}.{bn}.weight"] = torch.from_numpy(blk[bn]["scale"])
            sd[f"conv_blocks.conv{k}.{bn}.bias"] = torch.from_numpy(blk[bn]["bias"])
            sd[f"conv_blocks.conv{k}.{bn}.running_mean"] = torch.zeros(D2)
            sd[f"conv_blocks.conv{k}.{bn}.running_var"] = torch.ones(D2)
            sd[f"conv_blocks.conv{k}.{bn}.num_batches_tracked"] = torch.tensor(0)
    for name in ("conv_final1", "conv_final2"):
        sd[f"{name}.weight"] = torch.from_numpy(p[name]["kernel"].transpose(2, 1, 0))
        sd[f"{name}.bias"] = torch.from_numpy(p[name]["bias"])
    # the reference registers cos/sin as buffers; keep its own values
    sd["subject_block.spatial_attention.cos"] = ref_enc.state_dict()[
        "subject_block.spatial_attention.cos"
    ]
    sd["subject_block.spatial_attention.sin"] = ref_enc.state_dict()[
        "subject_block.spatial_attention.sin"
    ]
    ref_enc.load_state_dict(sd)
    return ref_enc, ours, variables, X, sidx


@pytest.fixture(scope="module")
def pair(ref_modules):
    """(ref torch BrainEncoder, our flax BrainEncoder + variables) with
    identical weights, on a small Gwilliams-like geometry."""
    models, _ = ref_modules
    return _make_pair(models, d_drop=0.1)


def test_forward_matches_reference(pair):
    ref_enc, ours, variables, X, sidx = pair
    with torch.no_grad():
        Z_ref = ref_enc(torch.from_numpy(X), torch.from_numpy(sidx)).numpy()
    Z_ours = np.asarray(ours.apply(variables, X, sidx, train=False))
    np.testing.assert_allclose(Z_ours, Z_ref, rtol=1e-3, atol=1e-4)


def test_clip_loss_matches_reference(ref_modules, rng):
    _, ref_loss_mod = ref_modules
    from speech_decoding_tpu.models import clip_loss

    args = types.SimpleNamespace(reduction="mean", init_temperature=5.1)
    ref_loss = ref_loss_mod.CLIPLoss(args)
    x = rng.normal(size=(8, 16, 10)).astype(np.float32)
    y = rng.normal(size=(8, 16, 10)).astype(np.float32)
    with torch.no_grad():
        ref = float(ref_loss(torch.from_numpy(x), torch.from_numpy(y)))
    ours = float(clip_loss(jnp.asarray(x), jnp.asarray(y), jnp.float32(5.1)))
    assert abs(ours - ref) < 1e-3


def test_training_dynamics_matches_reference(ref_modules):
    """Multi-step training parity against the EXECUTED torch reference: from
    identical inits (d_drop=0 so train mode is deterministic), run 8
    identical (batch, Adam lr=3e-4) optimizer steps in both frameworks —
    torch exactly as the reference's loop does (loss_func(Y, Z), one Adam
    over encoder+temperature [ref: train.py:161-203]) and ours via the jitted
    make_train_step — and assert the loss curves, BN running stats, and the
    learned temperature track. This is the strongest 1%-accuracy-parity
    evidence obtainable without the real datasets: identical training
    dynamics + identical data pipeline => identical accuracy."""
    models, ref_loss_mod = ref_modules
    from speech_decoding_tpu.training import create_train_state, make_train_step

    ref_enc, ours, variables, X0, sidx0 = _make_pair(models, d_drop=0.0)
    K_STEPS, B, C, T, F = 8, 8, 208, 60, 64
    rng = np.random.default_rng(42)
    Xs = rng.normal(size=(K_STEPS, B, C, T)).astype(np.float32)
    Ys = rng.normal(size=(K_STEPS, B, F, T)).astype(np.float32)
    sidxs = rng.integers(0, 3, size=(K_STEPS, B)).astype(np.int32)

    # --- torch reference: the exact loop of train.py:166-203 ---
    largs = types.SimpleNamespace(reduction="mean", init_temperature=5.1)
    ref_loss = ref_loss_mod.CLIPLoss(largs)
    ref_enc.train()
    opt = torch.optim.Adam(
        list(ref_enc.parameters()) + list(ref_loss.parameters()), lr=3e-4
    )
    ref_losses = []
    for k in range(K_STEPS):
        Z = ref_enc(torch.from_numpy(Xs[k]), torch.from_numpy(sidxs[k]))
        loss = ref_loss(torch.from_numpy(Ys[k]), Z)
        opt.zero_grad()
        loss.backward()
        opt.step()
        ref_losses.append(float(loss))

    # --- ours: same init, jitted step ---
    state = create_train_state(
        ours, jax.random.PRNGKey(9), Xs[0], sidxs[0], init_temperature=5.1, lr=3e-4
    )
    state = state.replace(
        params={"encoder": variables["params"], "clip": state.params["clip"]},
        batch_stats=variables["batch_stats"],
    )
    step = make_train_step(ours, donate=False)
    our_losses = []
    for k in range(K_STEPS):
        batch = {"X": Xs[k], "Y": Ys[k], "subject_idxs": sidxs[k]}
        state, m = step(state, batch, jax.random.PRNGKey(0))
        our_losses.append(float(m["loss"]))

    np.testing.assert_allclose(our_losses, ref_losses, rtol=3e-4, atol=3e-4)

    # BN running stats after 8 train-mode steps
    ref_sd = ref_enc.state_dict()
    for blk in range(5):
        for bn in ("batchnorm0", "batchnorm1"):
            ours_bn = state.batch_stats[f"conv{blk}"][bn]
            np.testing.assert_allclose(
                np.asarray(ours_bn["mean"]),
                ref_sd[f"conv_blocks.conv{blk}.{bn}.running_mean"].numpy(),
                rtol=1e-2,
                atol=2e-3,  # EMA of batch stats under ~1e-4/step Adam fp drift
                err_msg=f"conv{blk}.{bn}.running_mean",
            )
            np.testing.assert_allclose(
                np.asarray(ours_bn["var"]),
                ref_sd[f"conv_blocks.conv{blk}.{bn}.running_var"].numpy(),
                rtol=1e-2,
                atol=2e-3,
                err_msg=f"conv{blk}.{bn}.running_var",
            )

    # learned temperature after 8 Adam steps
    ref_temp = float(ref_loss.temp.detach())
    our_temp = float(state.params["clip"]["temp"][0])
    assert abs(ref_temp - our_temp) < 1e-3, (ref_temp, our_temp)


def test_retrieval_matches_reference_classifier(ref_modules, rng):
    models, _ = ref_modules
    from speech_decoding_tpu.models import retrieval_metrics

    clf = models.Classifier(types.SimpleNamespace())
    Z = rng.normal(size=(16, 8, 5)).astype(np.float32)
    Y = (0.6 * Z + 0.6 * rng.normal(size=Z.shape)).astype(np.float32)
    ref1, ref10 = clf(torch.from_numpy(Z), torch.from_numpy(Y))
    ours1, ours10 = retrieval_metrics(jnp.asarray(Z), jnp.asarray(Y), ks=(1, 10))
    assert abs(float(ours1) - float(ref1)) < 1e-6
    assert abs(float(ours10) - float(ref10)) < 1e-6
