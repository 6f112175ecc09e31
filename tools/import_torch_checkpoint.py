#!/usr/bin/env python
"""Import a reference-trained PyTorch checkpoint into this framework.

The reference saves encoder weights only (``model_last.pt``,
[ref: train.py:259]); this tool maps them onto our flax tree
(models/torch_port.py) and writes a full orbax checkpoint (fresh optimizer
state, config temperature) that train.py can resume / fine-tune and
SpeechDecoder.from_checkpoint can serve.

    python tools/import_torch_checkpoint.py model_last.pt out_ckpt_dir \
        [dataset=Gwilliams2022] [d_drop=0.1] [init_temperature=5.1]

Architecture dims (D1, D2, F, K, num_subjects) are inferred from the
state_dict; the sensor layout comes from the dataset's layout cache — for a
checkpoint trained on real data, generate the position-exact layout first
(tools/precompute_layout.py), since the spatial-attention bases are a
function of sensor positions [ref: models.py:36-40].
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import numpy as np
    import torch

    from speech_decoding_tpu.data.layout import ch_locations_2d
    from speech_decoding_tpu.models import BrainEncoder
    from speech_decoding_tpu.models.torch_port import brain_encoder_from_torch
    from speech_decoding_tpu.training.checkpoint import CheckpointManager
    from speech_decoding_tpu.training.state import create_train_state

    assert len(sys.argv) >= 3, __doc__
    pt_path, out_dir = sys.argv[1], sys.argv[2]
    over = dict(kv.split("=", 1) for kv in sys.argv[3:])
    dataset = over.get("dataset", "Gwilliams2022")
    root_dir = over.get("root_dir", ".")
    d_drop = float(over.get("d_drop", 0.1))
    init_temperature = float(over.get("init_temperature", 5.1))

    sd = torch.load(pt_path, map_location="cpu", weights_only=True)
    params, batch_stats, dims = brain_encoder_from_torch(sd)
    print(f"imported {pt_path}: {dims}")

    loc = ch_locations_2d(dataset, root_dir=root_dir)
    # the torch model registers cos/sin bases as buffers keyed on channel
    # count [ref: models.py:36-40]; the layout must provide the same sensors
    cos = sd.get("subject_block.spatial_attention.cos")
    if cos is not None:
        assert loc.shape[0] == cos.shape[-1], (
            f"layout has {loc.shape[0]} sensors, checkpoint expects {cos.shape[-1]}"
        )
    encoder = BrainEncoder(
        num_subjects=dims["S"], loc=loc, D1=dims["D1"], D2=dims["D2"],
        F=dims["F"], K=dims["K"], d_drop=d_drop,
    )
    sample_X = np.zeros((2, loc.shape[0], 360), np.float32)
    state = create_train_state(
        encoder,
        jax.random.PRNGKey(0),
        sample_X,
        np.zeros((2,), np.int32),
        init_temperature=init_temperature,
    )
    state = state.replace(
        params={"encoder": jax.tree.map(np.asarray, params), "clip": state.params["clip"]},
        batch_stats=batch_stats,
    )
    mgr = CheckpointManager(out_dir)
    mgr.save(0, state)
    mgr.wait()
    print(f"wrote orbax checkpoint (epoch 0) to {out_dir}")


if __name__ == "__main__":
    main()
