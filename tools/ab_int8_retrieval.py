"""A/B: int8 serving-bank retrieval contraction strategies on the real chip.

Production path (inference.retrieve_topk_int8): store the bank int8 in HBM
(the 4x-traffic win) but CONVERT TO BF16 inside the dot — bf16 x bf16
products of int8-ranged values are exact (computed in f32 on the MXU) and
the f32 accumulation has no overflow, so no chunking and no (n, B, N) int32
partial round-trip. XLA fuses the int8 -> bf16 convert into the dot's
operand read (bank stays int8 in HBM).

Baseline kept LOCALLY here (it no longer ships in inference.py): the
chunked path splits the contraction into 2^17-term int8 x int8 -> int32
dots to dodge int32 overflow (flagship D = F*T = 369,408 could reach
D * 127^2 ~ 5.9e9 > 2^31 for flat-magnitude rows). Measured on v5e the
bf16-compute path beats it 1.4-1.6x and beats f32 retrieval at every bank
size (see inference.retrieve_topk_int8's docstring for the recorded sweep);
this script re-measures both so the A/B stays reproducible against HEAD.

Methodology per .claude/skills/verify: reps chained through a carry,
value-fetched at the end (block_until_ready is a no-op on the tunneled
backend); banks passed as jit ARGUMENTS, generated on device.
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from speech_decoding_tpu.inference import (  # noqa: E402
    quantize_rows_int8,
    retrieve_topk,
    retrieve_topk_int8,
)

B = 256
D = 1024 * 360  # flagship F * T: the serving bench's row size
K = 10

# ---- chunked-int32 baseline (formerly inference.retrieve_topk_int8_packed;
# retired from the production module after this A/B, kept here verbatim in
# spirit so the measurement that justified the retirement can be re-run) ----

_INT8_DOT_CHUNK = 2**17  # <= 2^31 / 127^2 terms per int32 dot: overflow-free


def pack_int8_bank(bank_q: jax.Array) -> jax.Array:
    """(N, D) int8 -> (n_chunks, N, chunk) int8, zero-padded: the chunked
    contraction's bank layout, relayout done ONCE at bank-set time."""
    n_rows, d = bank_q.shape
    if d <= _INT8_DOT_CHUNK:
        return bank_q[None]
    n = -(-d // _INT8_DOT_CHUNK)
    padded = jnp.pad(bank_q, ((0, 0), (0, n * _INT8_DOT_CHUNK - d)))
    return jnp.moveaxis(padded.reshape(n_rows, n, _INT8_DOT_CHUNK), 1, 0)


def retrieve_topk_int8_packed(Z, bank_q3, bank_scale, k: int = 10):
    """Chunked int8 x int8 -> int32 retrieval over a pack_int8_bank layout."""
    n, n_rows, chunk = bank_q3.shape
    z = jnp.reshape(Z.astype(jnp.float32), (Z.shape[0], -1))
    z = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-8)
    zscale = jnp.maximum(jnp.max(jnp.abs(z), axis=-1, keepdims=True), 1e-8) / 127.0
    zq = jnp.round(z / zscale).astype(jnp.int8)
    zq3 = pack_int8_bank(zq) if n > 1 else zq[None]
    # per-chunk exact int32 dots, f32 cross-chunk accumulation
    parts = jnp.einsum(
        "cbd,cnd->cbn", zq3, bank_q3, preferred_element_type=jnp.int32
    )
    sim = jnp.sum(parts.astype(jnp.float32), axis=0)
    sim = sim * zscale * bank_scale[None, :]
    return jax.lax.top_k(sim, min(int(k), n_rows))


def timed(fn, *args, reps=20):
    # warmup + compile
    out = fn(*args, 0.0)
    float(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        carry = 0.0
        for _ in range(reps):
            carry = fn(*args, carry)
        float(carry)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def main():
    n_list = [int(a) for a in sys.argv[1:]] or [2048, 4096]
    key = jax.random.PRNGKey(0)
    Z = jax.random.normal(key, (B, D), jnp.float32)

    @functools.partial(jax.jit, static_argnames="n")
    def make_bank(k2, n):
        rows = jax.random.normal(k2, (n, D), jnp.float32)
        return rows / jnp.linalg.norm(rows, axis=-1, keepdims=True)

    for N in n_list:
        bank = make_bank(jax.random.PRNGKey(1), N)
        q, scale = jax.jit(quantize_rows_int8)(bank)
        q3 = jax.jit(pack_int8_bank)(q)

        @jax.jit
        def f32_step(Zx, bk, carry):
            s, _ = retrieve_topk(Zx, bk, K)
            return jnp.sum(s) * 1e-30 + carry

        @jax.jit
        def int8_step(Zx, bq3, sc, carry):
            s, _ = retrieve_topk_int8_packed(Zx, bq3, sc, K)
            return jnp.sum(s) * 1e-30 + carry

        @jax.jit
        def bf16_step(Zx, bq, sc, carry):
            s, _ = retrieve_topk_int8(Zx, bq, sc, K)
            return jnp.sum(s) * 1e-30 + carry

        t_f32 = timed(lambda Zx, bk, c: f32_step(Zx, bk, c), Z, bank)
        t_i8 = timed(lambda Zx, a, b, c: int8_step(Zx, a, b, c), Z, q3, scale)
        t_bf = timed(lambda Zx, a, b, c: bf16_step(Zx, a, b, c), Z, q, scale)
        gb = N * D / 2**30
        print(
            f"N={N} (bank {gb * 4:.1f} GB f32 / {gb:.1f} GB int8): "
            f"f32 {t_f32 * 1e3:.2f} ms | int8-chunked {t_i8 * 1e3:.2f} ms | "
            f"int8-bf16 {t_bf * 1e3:.2f} ms  "
            f"(bf16 vs chunked: {t_i8 / t_bf:.2f}x, vs f32: {t_f32 / t_bf:.2f}x)"
        )
        # agreement check: top-1 ids of bf16 vs chunked variants
        _, ids_a = jax.jit(functools.partial(retrieve_topk_int8_packed, k=K))(Z, q3, scale)
        _, ids_b = jax.jit(functools.partial(retrieve_topk_int8, k=K))(Z, q, scale)
        import numpy as np

        agree = float(np.mean(np.asarray(ids_a[:, 0]) == np.asarray(ids_b[:, 0])))
        print(f"  top-1 agreement bf16 vs chunked: {agree:.3f}")
        del bank, q, q3, scale


if __name__ == "__main__":
    main()
