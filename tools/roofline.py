"""Measured roofline breakdown of the flagship train step (VERDICT r4 item 3).

Answers "is 41% MFU the ceiling?" with measurements instead of a model:

  1. measures the chip's ACHIEVED peak on a big lane-aligned bf16 GEMM and its
     achieved HBM bandwidth on a streaming elementwise op (both with the
     chained-value-forced methodology — block_until_ready is a no-op on the
     tunneled backend, see TODO.md env notes);
  2. measures the isolated rate of EVERY GEMM shape class the train step
     actually executes (fwd taps, custom-VJP dW/dx GEMMs [see
     models/brain_encoder.py:_gemm_conv_bwd], heads, gathered subject matmul,
     CLIP logits) — these per-shape rates embody the real lane/sublane padding
     cost of D1=270/D2=320 (320 = 2.5 lane tiles), so the GEMM floor needs no
     padding model;
  3. enumerates the step's GEMM inventory analytically (it is known exactly —
     the step is 5 dilated ConvBlocks of 3-tap GEMM convs + heads + CLIP
     [ref: models.py:120-196]) and cross-checks total GEMM FLOPs against the
     XLA compiler's cost_analysis for the whole step (1,002 vs 1,006 GF —
     the inventory is complete);
  4. decomposes the measured step as  GEMM floor + non-GEMM residue : the
     floor is hard (per-shape measured rates -> the MFU ceiling if all
     elementwise were free), and the residue's implied HBM traffic at the
     measured bandwidth, compared against the compiler's logical byte count,
     shows how much XLA fusion already eliminates and that the remainder is
     bandwidth-bound. (The logical bytes are NOT charged as a floor — fusion
     elides most of them, and the device trace shows mixed dot+elementwise
     fusions with no clean runtime split.)

Measured v5e verdict (artifact: roofline_artifact.json, also in bench
extras): step 12.5 ms = 7.2 ms GEMM floor (MFU ceiling 71%; aligned head
GEMMs hit the chip's 185 TF/s measured peak, the 270/320-lane model shapes
cap at 99-159 TF/s) + 5.3 ms residue ≈ 5.3 GB fused elementwise at
~1 TB/s (56% of logical bytes already eliminated by fusion).

Usage:  python tools/roofline.py [--json out.json] [--steps 60] [--batch 64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import numpy as np


def log(msg: str) -> None:
    print(f"[roofline {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# chained microbenchmarks
# ---------------------------------------------------------------------------


def timed_scan(make_body, operands, reps: int = 24, passes: int = 3) -> float:
    """Seconds per rep of ``make_body(operands, carry) -> new scalar carry``.

    All reps run INSIDE one jit via lax.scan chained through the carry — one
    dispatch per timed pass, so the tunneled backend's per-call overhead
    cannot pollute microsecond-scale kernels — and the final scalar fetch
    forces the chain (block_until_ready is a no-op here). The tunnel's
    dispatch+fetch round trip is a CONSTANT per pass, so the per-rep time is
    the DIFFERENCE between a ``4*reps``-length and a ``reps``-length scan
    (best-of-``passes`` each), which cancels it exactly. Bodies must place a
    ``jax.lax.optimization_barrier`` before reducing to the carry scalar so
    XLA cannot slice away the full computation. Operands are jit ARGUMENTS
    (closure constants get embedded in the uploaded program — env notes)."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    @partial(jax.jit, static_argnames=("length",))
    def run(ops, carry, length):
        def body(c, _):
            return make_body(ops, c), None
        c, _ = jax.lax.scan(body, carry, None, length=length)
        return c

    lo, hi = reps, 4 * reps
    c = run(operands, jnp.float32(0), lo)
    float(c)
    c = run(operands, c, hi)
    float(c)  # both compiled + warm
    best_lo = best_hi = float("inf")
    for _ in range(passes):
        t0 = time.perf_counter()
        c = run(operands, c, lo)
        float(c)
        best_lo = min(best_lo, time.perf_counter() - t0)
        t0 = time.perf_counter()
        c = run(operands, c, hi)
        float(c)
        best_hi = min(best_hi, time.perf_counter() - t0)
    d = best_hi - best_lo
    if d <= 0:  # overhead-dominated jitter; fall back to the long pass
        return best_hi / hi
    return d / (hi - lo)


def _force_scalar(y):
    """Materialize y fully (barrier blocks slice-through-dot/fusion DCE) and
    return a scalar depending on it."""
    import jax
    import jax.numpy as jnp

    y = jax.lax.optimization_barrier(y)
    return y.reshape(-1)[0].astype(jnp.float32)


def measure_gemm(M: int, K: int, N: int, dtype, reps: int = 160) -> float:
    """Achieved TFLOP/s of a (M,K)x(K,N) GEMM in `dtype` (f32 accumulate)."""
    import jax
    import jax.numpy as jnp

    a = jax.random.normal(jax.random.PRNGKey(0), (M, K), jnp.float32).astype(dtype)
    b = jax.random.normal(jax.random.PRNGKey(1), (K, N), jnp.float32).astype(dtype)

    def body(ops, carry):
        a, b = ops
        return _force_scalar((a + carry.astype(a.dtype) * 1e-30) @ b)

    dt = timed_scan(body, (a, b), reps=reps)
    return 2.0 * M * K * N / dt / 1e12


def measure_batched_gemm(B: int, M: int, K: int, N: int, dtype, reps: int = 160) -> float:
    """Achieved TFLOP/s of a gathered batched matmul (the subject layer form:
    einsum('bti,bio->bto') over W[subject_idxs])."""
    import jax
    import jax.numpy as jnp

    x = jax.random.normal(jax.random.PRNGKey(0), (B, M, K), jnp.float32).astype(dtype)
    W = jax.random.normal(jax.random.PRNGKey(1), (27, K, N), jnp.float32).astype(dtype)
    sidx = jnp.asarray(np.random.default_rng(0).integers(0, 27, B), jnp.int32)

    def body(ops, carry):
        x, W, sidx = ops
        y = jnp.einsum(
            "bti,bio->bto",
            x + carry.astype(x.dtype) * 1e-30,
            W[sidx],
            preferred_element_type=x.dtype,
        )
        return _force_scalar(y)

    dt = timed_scan(body, (x, W, sidx), reps=reps)
    return 2.0 * B * M * K * N / dt / 1e12


def measure_hbm_bw(mb: int = 256) -> float:
    """Achieved HBM GB/s on a streaming bf16 add (read a + read b + write y)."""
    import jax
    import jax.numpy as jnp

    n = mb * 1024 * 1024 // 2
    a = jnp.ones((n,), jnp.bfloat16)
    b = jnp.full((n,), 2.0, jnp.bfloat16)

    def body(ops, carry):
        a, b = ops
        return _force_scalar(a + b + carry.astype(a.dtype) * 1e-30)

    dt = timed_scan(body, (a, b), reps=24)
    return 3.0 * n * 2 / dt / 1e9


# ---------------------------------------------------------------------------
# the step's GEMM inventory (flagship: B=64, C=208, T=360, D1=270, D2=320,
# F=1024, 5 ConvBlocks, gemm conv_impl with the custom VJP backward)
# ---------------------------------------------------------------------------


def gemm_inventory(B: int = 64, T: int = 360) -> list[dict]:
    """Every GEMM the train step runs, as (count, M, K, N, class) rows.

    Forward [ref: models.py:169-196 -> brain_encoder.py]:
      spatial mix, shared subject 1x1, gathered subject matmul, 5 blocks of
      {conv0,conv1}=3 taps each and conv2=3 taps to 2*D2, two 1x1 heads, CLIP
      logits.  Backward (custom VJP _gemm_conv_bwd): per tap dW=(Cin,M)x(M,Co)
      and dx=(M,Co)x(Co,Cin); 1x1 convs/einsums transpose to same-shape GEMMs.
    """
    M = B * T
    C, D1, D2, F = 208, 270, 320, 1024
    rows: list[dict] = []

    def add(cnt, m, k, n, cls, what):
        rows.append(
            {"count": cnt, "M": m, "K": k, "N": n, "cls": cls, "what": what,
             "gflops": 2.0 * cnt * m * k * n / 1e9}
        )

    # --- forward ---
    add(1, M, C, D1, "smallK", "spatial mix fwd")
    add(1, M, D1, D1, "smallK", "subject shared 1x1 fwd")
    add(1, M, D1, D1, "batched", "subject gathered matmul fwd")
    add(3, M, D1, D2, "tapA", "block0 conv0 taps fwd")
    add(3 * 4, M, D2, D2, "tapA", "block1-4 conv0 taps fwd")
    add(3 * 5, M, D2, D2, "tapA", "conv1 taps fwd")
    add(3 * 5, M, D2, 2 * D2, "tapB", "conv2 taps fwd (GLU width)")
    add(1, M, D2, 2 * D2, "tapB", "head1 fwd")
    add(1, M, 2 * D2, F, "head2", "head2 fwd")
    add(2, B, F * T, B, "clip", "CLIP logits fwd (ZY^T; reused for metrics)")

    # --- backward ---
    add(2, B, B, F * T, "clipT", "CLIP logits bwd (dZ, dY)")
    add(1, 2 * D2, M, F, "dW_head2", "head2 dW")
    add(1, M, F, 2 * D2, "dx_head2", "head2 dx")
    add(1, D2, M, 2 * D2, "dW_tapB", "head1 dW")
    add(1, M, 2 * D2, D2, "dx_tapB", "head1 dx")
    add(3 * 5, D2, M, 2 * D2, "dW_tapB", "conv2 taps dW")
    add(3 * 5, M, 2 * D2, D2, "dx_tapB", "conv2 taps dx")
    add(3 * 5, D2, M, D2, "dW_tapA", "conv1 taps dW")
    add(3 * 5, M, D2, D2, "tapA", "conv1 taps dx")
    add(3 * 4, D2, M, D2, "dW_tapA", "block1-4 conv0 taps dW")
    add(3 * 4, M, D2, D2, "tapA", "block1-4 conv0 taps dx")
    add(3, D1, M, D2, "dW_tapA", "block0 conv0 taps dW")
    add(3, M, D2, D1, "tapA", "block0 conv0 taps dx")
    add(2, M, D1, D1, "batched", "subject gathered matmul bwd (dx, dW)")
    add(1, D1, M, D1, "dW_tapA", "subject shared 1x1 dW")
    add(1, M, D1, D1, "smallK", "subject shared 1x1 dx")
    add(1, D1, M, C, "dW_tapA", "spatial mix dW (wts grad)")
    add(1, M, D1, C, "smallK", "spatial mix dx")
    return rows


def class_shapes(B: int = 64, T: int = 360) -> dict:
    """Representative measured shape per class: (M, K, N), or None for the
    gathered batched matmul. Scaled with the batch so --batch N measures the
    rates of the shapes that batch actually runs (GEMM efficiency is
    strongly M-dependent)."""
    M = B * T
    return {
        "tapA": (M, 320, 320),      # dominant: conv taps fwd + dx
        "tapB": (M, 320, 640),      # conv2 / head1 width
        "dx_tapB": (M, 640, 320),
        "dW_tapA": (320, M, 320),   # tall-contraction weight grads
        "dW_tapB": (320, M, 640),
        "head2": (M, 640, 1024),
        "dx_head2": (M, 1024, 640),
        "dW_head2": (640, M, 1024),
        "smallK": (M, 270, 270),
        "clip": (B, 1024 * T, B),
        "clipT": (B, B, 1024 * T),
        "batched": None,            # measured via measure_batched_gemm
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None, help="write the breakdown here")
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    log(f"backend={jax.default_backend()} device={getattr(dev, 'device_kind', dev)}")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import _chip_peak_flops, build_flagship_step

    out: dict = {"device": str(getattr(dev, "device_kind", dev)), "batch": args.batch}

    # 1. achieved peak + bandwidth
    log("measuring achieved peak GEMM (4096^3 bf16)")
    peak_meas = measure_gemm(4096, 4096, 4096, jnp.bfloat16, reps=24)
    bw = measure_hbm_bw()
    peak_datasheet = (_chip_peak_flops(dev) or 0) / 1e12
    out["peak_measured_tflops"] = round(peak_meas, 1)
    out["peak_datasheet_tflops"] = round(peak_datasheet, 1)
    out["hbm_bw_gbs"] = round(bw, 1)
    log(f"peak GEMM {peak_meas:.1f} TF/s (datasheet {peak_datasheet:.0f}); HBM {bw:.0f} GB/s")

    # 2. per-class achieved rates
    rates: dict[str, float] = {}
    shapes = class_shapes(args.batch)
    for cls, shape in shapes.items():
        if shape is None:
            r = measure_batched_gemm(args.batch, 360, 270, 270, jnp.bfloat16)
        else:
            M, K, N = shape
            r = measure_gemm(M, K, N, jnp.bfloat16)
        rates[cls] = r
        log(f"  {cls:9s} {str(shape):24s} {r:7.1f} TF/s ({100 * r / peak_meas:.0f}% of peak)")

    # the flagship step (conv_impl='gemm_pdw') computes conv dW via the fused
    # Pallas 3-tap reduction, not per-tap einsum GEMMs — measure THAT rate
    # for the dW classes so the floor reflects what the step actually runs
    if jax.default_backend() == "tpu":
        from speech_decoding_tpu.ops.pallas.tap_conv import tap_conv_dw

        for cls, cout in (("dW_tapA", 320), ("dW_tapB", 640)):
            x = jax.random.normal(jax.random.PRNGKey(0), (args.batch, 360, 320), jnp.float32).astype(jnp.bfloat16)
            g = jax.random.normal(jax.random.PRNGKey(1), (args.batch, 360, cout), jnp.float32).astype(jnp.bfloat16)

            def body(ops, carry):
                x, g = ops
                y = tap_conv_dw(x + carry.astype(x.dtype) * 1e-30, g, 2)
                return _force_scalar(y)

            dt = timed_scan(body, (x, g), reps=96)
            r = 2.0 * 3 * args.batch * 360 * 320 * cout / dt / 1e12
            rates[cls + "_einsum"] = rates[cls]
            rates[cls] = r
            log(f"  {cls:9s} fused-pallas-dW          {r:7.1f} TF/s (einsum taps: {rates[cls + '_einsum']:.1f})")
    out["class_rates_tflops"] = {k: round(v, 1) for k, v in rates.items()}

    # 3. inventory -> GEMM floor
    inv = gemm_inventory(args.batch)
    gemm_gflops = sum(r["gflops"] for r in inv)
    t_gemm = sum(r["gflops"] / 1e3 / rates[r["cls"]] for r in inv)  # seconds
    # minimal GEMM HBM bytes (operands once + output once, bf16)
    gemm_bytes = sum(
        2.0 * r["count"] * (r["M"] * r["K"] + r["K"] * r["N"] + r["M"] * r["N"])
        for r in inv
    )
    out["gemm_gflops"] = round(gemm_gflops, 1)
    out["gemm_floor_ms"] = round(t_gemm * 1e3, 3)
    out["gemm_min_bytes_mb"] = round(gemm_bytes / 1e6, 1)
    log(f"GEMM inventory: {gemm_gflops:.0f} GF -> floor {t_gemm * 1e3:.2f} ms at measured per-shape rates")

    # 4. the step itself: compiler totals + measured time
    log("building flagship step")
    step, state, batch, enc, collate = build_flagship_step(batch_size=args.batch)
    key = jax.random.PRNGKey(7)
    step_flops = step_bytes = None
    try:
        cost = step.lower(state, batch, key).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        step_flops = float(cost.get("flops", 0.0)) or None
        step_bytes = float(cost.get("bytes accessed", 0.0)) or None
    except Exception as e:
        log(f"cost_analysis unavailable: {e}")
    for _ in range(3):
        state, metrics = step(state, batch, key)
    float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = step(state, batch, key)
    float(metrics["loss"])
    t_step = (time.perf_counter() - t0) / args.steps
    out["step_ms"] = round(t_step * 1e3, 3)
    out["step_flops_gf"] = round(step_flops / 1e9, 1) if step_flops else None
    out["step_bytes_mb"] = round(step_bytes / 1e6, 1) if step_bytes else None
    log(f"measured step: {t_step * 1e3:.2f} ms"
        + (f" | compiler: {step_flops / 1e9:.0f} GF, {step_bytes / 1e6:.0f} MB accessed" if step_flops else ""))

    # 5. the verdict. Note the logical elementwise bytes the compiler counts
    # (bytes accessed - GEMM bytes) are NOT a floor: XLA fusion elides most
    # of them (the device trace shows mixed dot+elementwise fusions — there
    # is no clean GEMM/elementwise time split at runtime). The defensible
    # decomposition: the GEMM floor is hard (measured per-shape rates), and
    # whatever the step spends beyond it is the POST-FUSION elementwise/BN/
    # optimizer/metrics residue, whose implied HBM traffic at the measured
    # bandwidth tells how much fusion already eliminated.
    if step_bytes:
        ew_logical = max(step_bytes - gemm_bytes, 0.0)
        t_residue = max(t_step - t_gemm, 0.0)
        implied_ew_bytes = t_residue * bw * 1e9
        out["elementwise_logical_bytes_mb"] = round(ew_logical / 1e6, 1)
        out["non_gemm_residue_ms"] = round(t_residue * 1e3, 3)
        out["implied_fused_elementwise_mb"] = round(implied_ew_bytes / 1e6, 1)
        out["fusion_eliminated_frac"] = round(1 - implied_ew_bytes / ew_logical, 3) if ew_logical else None
        have_peak = bool(step_flops) and peak_datasheet > 0
        out["mfu_measured"] = round(step_flops / t_step / (peak_datasheet * 1e12), 4) if have_peak else None
        out["mfu_ceiling_gemm_only"] = round(step_flops / t_gemm / (peak_datasheet * 1e12), 4) if have_peak else None
        log(
            f"VERDICT: step {t_step * 1e3:.2f} ms = GEMM floor {t_gemm * 1e3:.2f} ms "
            f"(shape-imposed; MFU ceiling {100 * (out['mfu_ceiling_gemm_only'] or 0):.1f}%) "
            f"+ {t_residue * 1e3:.2f} ms non-GEMM residue"
        )
        log(
            f"residue ≈ {implied_ew_bytes / 1e9:.1f} GB of fused elementwise traffic at "
            f"{bw:.0f} GB/s (compiler counts {ew_logical / 1e9:.1f} GB logical -> fusion "
            f"already eliminates {100 * (out['fusion_eliminated_frac'] or 0):.0f}%); "
            f"measured MFU {100 * (out['mfu_measured'] or 0):.1f}%"
        )
    out["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    print(json.dumps(out))
    # artifact for bench.py extras (VERDICT r4 item 3: the MFU-ceiling proof
    # travels with the round's bench JSON)
    default_artifact = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "roofline_artifact.json",
    )
    for path in filter(None, [args.json, default_artifact]):
        with open(path, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
