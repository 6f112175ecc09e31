#!/usr/bin/env python
"""Real-data north-star runbook: one command that turns an environment with
the raw datasets / MNE / pretrained weights into the full parity run.

Three items in this repo are environment-blocked on the build harness (no
network egress, no MNE, no raw Brennan/Gwilliams recordings): MNE-exact
sensor layouts, pretrained xlsr-53 weight values, and the real-data top-10
retrieval parity number (BASELINE.json: "within 1% of the reference"). The
recovery path for each is already staged and tested; this runbook chains
them so the day the environment exists the north-star run is ONE command:

    python tools/realdata_runbook.py            # dry-run: probe + report
    python tools/realdata_runbook.py --execute  # run every unblocked step

Steps (each probed independently; a blocked step is REPORTED with its exact
prerequisite and remediation, never silently skipped):

  A. MNE-exact sensor layouts   -> tools/precompute_layout.py (needs mne;
     Gwilliams additionally mne_bids + the BIDS tree)
     [ref: /root/reference/speech_decoding/utils/layout.py:9-32]
  B. Pretrained xlsr-53 weights -> torch-free safetensors ingestion
     (models/wav2vec2_safetensors.py; needs model.safetensors locally or a
     reachable HF hub) [ref: utils/wav2vec_util.py:8-11]
  C. Dataset cache rebuild      -> train.py rebuild path (needs raw data +
     step B) [ref: dataclass/{brennan2018,gwilliams2022}.py ctors]
  D. Parity eval                -> train to convergence + tools/evaluate.py;
     optionally evaluate a reference-trained torch checkpoint side by side
     (tools/import_torch_checkpoint.py) and assert |ours - ref| <= 1%
     [ref: /root/reference/train.py:211-243]

Exit code: dry-run always 0 (blocked steps are findings, not failures);
--execute returns nonzero iff a READY step FAILED.
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
from glob import glob

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GREEN, YELLOW, RED, CYAN, END = (
    "\033[92m", "\033[93m", "\033[91m", "\033[96m", "\033[0m",
)


def _have_module(name: str) -> bool:
    import importlib.util

    try:
        return importlib.util.find_spec(name) is not None
    except (ImportError, ValueError):
        return False


def _have_network(host: str = "huggingface.co", timeout: float = 3.0) -> bool:
    try:
        socket.create_connection((host, 443), timeout=timeout).close()
        return True
    except OSError:
        return False


def _find_safetensors(root: str) -> str | None:
    """A local xlsr-53 model.safetensors: explicit env var, repo-local
    weights/ convention, or the HF hub cache layout."""
    cands = [os.environ.get("W2V_SAFETENSORS", "")]
    cands += glob(os.path.join(root, "weights", "*.safetensors"))
    hf_home = os.environ.get("HF_HOME", os.path.expanduser("~/.cache/huggingface"))
    cands += glob(
        os.path.join(
            hf_home, "hub", "models--facebook--wav2vec2-large-xlsr-53",
            "snapshots", "*", "model.safetensors",
        )
    )
    for c in cands:
        if c and os.path.exists(c):
            return c
    return None


class Step:
    def __init__(self, key, title, ready, why, run):
        self.key, self.title, self.ready, self.why, self.run = (
            key, title, ready, why, run,
        )
        self.status = "READY" if ready else "BLOCKED"
        self.detail = "" if ready else why


def build_steps(root: str) -> list[Step]:
    have_mne = _have_module("mne")
    have_mne_bids = _have_module("mne_bids")
    net = _have_network()
    st_path = _find_safetensors(root)

    br_raw = sorted(glob(os.path.join(root, "data", "Brennan2018", "raw", "*.mat")))
    br_wav = sorted(glob(os.path.join(root, "data", "Brennan2018", "audio", "*.wav")))
    gw_root = os.path.join(root, "data", "Gwilliams2022")
    gw_bids = sorted(glob(os.path.join(gw_root, "sub-*"))) or sorted(
        glob(os.path.join(gw_root, "download", "sub-*"))
    )
    gw_stimuli = sorted(
        glob(os.path.join(gw_root, "stimuli", "audio", "*.wav"))
    ) or sorted(glob(os.path.join(gw_root, "download", "stimuli", "audio", "*.wav")))

    def run_layouts():
        ok = True
        for ds in ("Brennan2018", "Gwilliams2022"):
            if ds == "Gwilliams2022" and not (have_mne_bids and gw_bids):
                print(f"  {ds}: skipped (needs mne_bids + BIDS tree)")
                continue
            r = subprocess.run(
                [sys.executable, os.path.join(REPO, "tools", "precompute_layout.py"),
                 ds, root],
                capture_output=True, text=True,
            )
            print("  " + (r.stdout + r.stderr).strip().replace("\n", "\n  "))
            ok &= r.returncode == 0
        return ok

    def run_weights():
        from speech_decoding_tpu.models.wav2vec_util import load_wav2vec_model

        src = st_path or "facebook/wav2vec2-large-xlsr-53"
        model = load_wav2vec_model(src)
        n = sum(x.size for x in _leaves(model.variables))
        print(f"  loaded {src}: {n / 1e6:.0f}M params")
        assert n > 300e6, "xlsr-53 should be ~315M params"
        return True

    def _leaves(tree):
        import jax

        return [x for x in jax.tree.leaves(tree) if hasattr(x, "size")]

    def run_rebuild():
        ok = True
        for ds, present in (("Brennan2018", bool(br_raw and br_wav)),
                            ("Gwilliams2022", bool(gw_bids and gw_stimuli))):
            if not present:
                print(f"  {ds}: skipped (raw data absent)")
                continue
            cmd = [sys.executable, os.path.join(REPO, "train.py"),
                   f"dataset={ds}", "rebuild_dataset=True", "epochs=0",
                   f"root_dir={root}"]
            print("  $ " + " ".join(cmd))
            ok &= subprocess.run(cmd).returncode == 0
        return ok

    def run_parity():
        ds = "Gwilliams2022" if (gw_bids and gw_stimuli) else "Brennan2018"
        cmd = [sys.executable, os.path.join(REPO, "train.py"), f"dataset={ds}",
               f"root_dir={root}", "checkpoint.enable=True"]
        print("  $ " + " ".join(cmd))
        if subprocess.run(cmd).returncode != 0:
            return False
        ev = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "evaluate.py"),
             f"dataset={ds}", f"root_dir={root}", "eval.best=true"],
            capture_output=True, text=True,
        )
        print("  " + ev.stdout.strip())
        if ev.returncode != 0:
            print("  " + ev.stderr.strip()[-500:])
            return False
        ours = json.loads(ev.stdout.strip().splitlines()[-1])
        ref_ckpt = os.environ.get("REF_CHECKPOINT", "")
        if ref_ckpt and os.path.exists(ref_ckpt):
            rv = subprocess.run(
                [sys.executable, os.path.join(REPO, "tools", "evaluate.py"),
                 f"dataset={ds}", f"root_dir={root}",
                 f"torch_checkpoint={ref_ckpt}"],
                capture_output=True, text=True,
            )
            print("  " + rv.stdout.strip())
            ref = json.loads(rv.stdout.strip().splitlines()[-1])
            gap = abs(ours["top10"] - ref["top10"])
            print(f"  top-10 gap vs reference checkpoint: {gap:.4f}")
            return gap <= 0.01
        print("  (set REF_CHECKPOINT=<model_last.pt> to compare against a "
              "reference-trained model; trained-run metrics printed above)")
        return True

    return [
        Step(
            "A", "MNE-exact sensor layouts", have_mne,
            "needs `pip install mne`" + ("" if have_mne_bids
             else " (+ mne_bids for Gwilliams)"),
            run_layouts,
        ),
        Step(
            "B", "pretrained xlsr-53 weights",
            bool(st_path) or net,
            "needs weights/model.safetensors (or W2V_SAFETENSORS=<path>), "
            "or network to huggingface.co"
            + ("" if st_path or net else " — neither found"),
            run_weights,
        ),
        Step(
            "C", "dataset cache rebuild",
            bool((br_raw and br_wav) or (gw_bids and gw_stimuli)),
            "needs raw data: data/Brennan2018/{raw/*.mat,audio/*.wav} "
            f"(found {len(br_raw)} mats, {len(br_wav)} wavs) or "
            f"data/Gwilliams2022/sub-* BIDS tree (found {len(gw_bids)} "
            f"subjects, {len(gw_stimuli)} stimuli)",
            run_rebuild,
        ),
        Step(
            "D", "train + parity eval (north star)",
            bool((br_raw and br_wav) or (gw_bids and gw_stimuli)),
            "blocked by step C's data prerequisites",
            run_parity,
        ),
    ]


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--execute", action="store_true",
                    help="run the unblocked steps (default: dry-run report)")
    ap.add_argument("--root", default=REPO,
                    help="data root (expects <root>/data/<Dataset>/...)")
    args = ap.parse_args()

    steps = build_steps(args.root)
    mode = "EXECUTE" if args.execute else "DRY-RUN"
    print(f"{CYAN}north-star runbook [{mode}] root={args.root}{END}")

    failed = False
    for s in steps:
        if not s.ready:
            print(f"{YELLOW}[{s.key}] {s.title}: BLOCKED{END} — {s.why}")
            continue
        if not args.execute:
            print(f"{GREEN}[{s.key}] {s.title}: READY{END}")
            continue
        print(f"{CYAN}[{s.key}] {s.title}: running...{END}")
        try:
            ok = s.run()
        except Exception as e:  # report and continue to later steps
            print(f"  {type(e).__name__}: {e}")
            ok = False
        print(f"{GREEN if ok else RED}[{s.key}] {s.title}: "
              f"{'OK' if ok else 'FAILED'}{END}")
        failed |= not ok

    blocked = [s.key for s in steps if not s.ready]
    if blocked:
        print(f"{YELLOW}blocked: {', '.join(blocked)} — every blocked step "
              f"above lists its exact prerequisite{END}")
    return 1 if (args.execute and failed) else 0


if __name__ == "__main__":
    raise SystemExit(main())
