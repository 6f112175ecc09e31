"""Capture a jax.profiler trace of the flagship train step and print a
per-op device-time summary (top ops + grouped totals) — no TensorBoard
round-trip, parsed in-process via jax.profiler.ProfileData.

Usage: python tools/trace_summary.py [xla|fused] [batch_size] [top_n]
"""

import glob
import os
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import jax


from tools.bench_fused_train import build_step  # single flagship-step definition


def summarize(trace_dir: str, n_steps: int, top_n: int = 25):
    files = glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
    )
    assert files, f"no xplane in {trace_dir}"
    data = jax.profiler.ProfileData.from_file(files[0])
    for plane in data.planes:
        if "TPU" not in plane.name:
            continue
        print(f"\n=== plane: {plane.name} ===")
        for line in plane.lines:
            per_op = defaultdict(float)
            for ev in line.events:
                per_op[ev.name.split(" = ")[0]] += ev.duration_ns
            total = sum(per_op.values())
            if total == 0:
                continue
            print(
                f"\n-- line '{line.name}': {total / 1e6 / n_steps:.3f} ms/step, "
                f"{len(per_op)} distinct ops --"
            )
            for name, dur in sorted(per_op.items(), key=lambda kv: -kv[1])[:top_n]:
                print(f"{dur / 1e6 / n_steps:8.3f}  {name[:100]}")


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "xla"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 25
    step, state, batch = build_step(mode == "fused", B)
    key = jax.random.PRNGKey(7)
    for _ in range(3):
        state, m = step(state, batch, key)
    float(m["loss"])
    # warm loop: the first ~100 dispatches on the tunneled chip are slow
    for _ in range(30):
        state, m = step(state, batch, key)
    float(m["loss"])

    n_steps = 20
    trace_dir = tempfile.mkdtemp(prefix=f"sd_trace_{mode}_")
    jax.profiler.start_trace(trace_dir)
    for _ in range(n_steps):
        state, m = step(state, batch, key)
    float(m["loss"])
    jax.profiler.stop_trace()
    print(f"trace in {trace_dir}")
    summarize(trace_dir, n_steps, top_n)


if __name__ == "__main__":
    main()
