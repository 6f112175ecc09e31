#!/usr/bin/env python
"""A/B the Conv1d implementations on the full flagship train step (value-
forced timing via tools/probe_lane_padding.time_step).

'gemm'      = 3 shifted 320-lane GEMMs per conv (2.5 MXU tiles each, ~17%
              lane-padding waste);
'gemm_wide' = ONE 960-lane GEMM per conv (7.5->8 tiles, ~6% waste; the GLU
              conv's 1920 lanes are exact) + fused shifted-slice adds;
'xla'       = lax.conv_general_dilated;
'pallas_taps' = ONE fused Pallas kernel per conv: all 3 taps computed while
              the x row-block is VMEM-resident (x read once, y written once;
              fused dW reduction in backward) — see ops/pallas/tap_conv.py.

    python tools/ab_conv_impl.py [batch_size] [impl,impl,...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from probe_lane_padding import time_step  # noqa: E402


def main():
    bsz = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    base = base_name = None
    impls = sys.argv[2].split(",") if len(sys.argv) > 2 else (
        "gemm", "pallas_taps", "gemm_wide", "xla")
    for impl in impls:
        dt, flops = time_step(270, 320, bsz, conv_impl=impl)
        ms = dt * 1e3
        note = ""
        if base is None:
            base, base_name = ms, impl
        else:
            note = f"  ({ms / base:.3f}x {base_name} time)"
        gf = f" {flops / 1e9:7.1f} GF/step" if flops else ""
        print(f"{impl:10s}: {ms:7.3f} ms/step{gf} -> {1 / dt:6.1f} steps/s{note}", flush=True)


if __name__ == "__main__":
    main()
