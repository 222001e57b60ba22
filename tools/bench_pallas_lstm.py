"""Pallas-vs-XLA LSTM A/B at TRAINING geometry (VERDICT r3 item 4).

The round-3 measurement only covered inference sizes (B=4); this sweep
covers the train-step working points (B in {32, 64}, T in {256, 512},
H in {64..512}) on the real chip.  Two comparisons per shape:

  * forward: the pallas recurrence (ops/pallas_lstm.py) vs the XLA
    lax.scan path with hoisted input projections (models/layers.py) —
    identical math, median blocked wall time.
  * forward+backward (XLA only): the scan path under jax.grad, the
    quantity a train step actually pays.  The pallas kernel has no
    custom VJP; if its FORWARD already loses to XLA's scan at a shape,
    a pallas training path cannot win there (its backward would face
    the same recurrence structure), so the forward sweep decides
    whether writing a backward kernel is worth it.

Writes a markdown table to stdout + JSON to --out.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=7)
    p.add_argument("--out", default=None)
    p.add_argument("--cpu", action="store_true", help="CPU smoke (interpret)")
    args = p.parse_args(argv)

    if args.cpu:
        import os

        os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from functools import partial

    from ensemble_svs_with_interactions_tpu.ops.pallas_lstm import (
        lstm_recurrence,
        lstm_recurrence_trainable,
        trainable_auto_blocks,
    )

    @partial(jax.jit, static_argnames=("unroll",))
    def xla_scan_forward(x, Wi, Wh, b, unroll=8):
        H = Wh.shape[0]
        xp = x @ Wi + b

        def body(carry, xp_t):
            c, h = carry
            z = xp_t + h @ Wh
            i = jax.nn.sigmoid(z[:, :H])
            f = jax.nn.sigmoid(z[:, H : 2 * H])
            g = jnp.tanh(z[:, 2 * H : 3 * H])
            o = jax.nn.sigmoid(z[:, 3 * H :])
            c = f * c + i * g
            h = o * jnp.tanh(c)
            return (c, h), h

        B = x.shape[0]
        carry0 = (jnp.zeros((B, H)), jnp.zeros((B, H)))
        _, ys = jax.lax.scan(body, carry0, xp.swapaxes(0, 1), unroll=unroll)
        return ys.swapaxes(0, 1)

    @partial(jax.jit, static_argnames=("unroll",))
    def xla_scan_fwdbwd(x, Wi, Wh, b, unroll=8):
        def loss(params):
            Wi_, Wh_, b_ = params
            ys = xla_scan_forward(x, Wi_, Wh_, b_, unroll=unroll)
            return jnp.mean(ys * ys)

        l, g = jax.value_and_grad(loss)((Wi, Wh, b))
        return l, g

    @partial(jax.jit, static_argnames=("chunk",))
    def pallas_forward(x, Wi, Wh, b, chunk):
        xw = x @ Wi + b
        return lstm_recurrence(xw, Wh, chunk=chunk, interpret=False)

    @partial(jax.jit, static_argnames=("chunk", "b_blk"))
    def pallas_fwdbwd(x, Wi, Wh, b, chunk, b_blk):
        # custom-VJP kernel (reverse-time BPTT in pallas, gates
        # recomputed); same loss/grad surface as xla_scan_fwdbwd
        def loss(params):
            Wi_, Wh_, b_ = params
            xw = x @ Wi_ + b_
            ys = lstm_recurrence_trainable(xw, Wh_, chunk, b_blk, False)
            return jnp.mean(ys * ys)

        return jax.value_and_grad(loss)((Wi, Wh, b))

    @jax.jit
    def _scalarize(out):
        return sum(jnp.sum(leaf) for leaf in jax.tree_util.tree_leaves(out))

    def timed(fn, *a, **k):
        # The tunnel-attached backend's block_until_ready can return
        # before device execution finishes (async enqueue), and fetching
        # a full output pays the ~23 MB/s tunnel D2H.  So: K chained
        # calls, then fetch ONE device-side scalar reduction of the last
        # output — stream ordering forces all K executions to complete,
        # the D2H is 4 bytes, and dividing by K amortizes the tunnel
        # round trip out of sub-ms kernels.  A null-jit baseline of the
        # same shape is subtracted.
        def fetch(out):
            float(np.asarray(_scalarize(out)))

        out = fn(*a, **k)
        fetch(out)  # warmup incl. compile
        K = 64
        reps = []
        for _ in range(args.steps):
            t0 = time.time()
            for _ in range(K):
                out = fn(*a, **k)
            fetch(out)
            reps.append((time.time() - t0) / K)
        return float(np.median(reps))

    shapes = [
        (B, T, H)
        for B in (32, 64)
        for T in (256, 512)
        for H in (64, 128, 256, 512)
    ]
    if args.cpu:
        shapes = [(8, 128, 32)]

    rows = []
    rng = np.random.default_rng(0)
    for B, T, H in shapes:
        x = jnp.asarray(rng.normal(size=(B, T, H)).astype(np.float32))
        Wi = jnp.asarray(rng.normal(size=(H, 4 * H)).astype(np.float32) * 0.05)
        Wh = jnp.asarray(rng.normal(size=(H, 4 * H)).astype(np.float32) * 0.05)
        b = jnp.zeros((4 * H,), jnp.float32)

        # pallas chunk: biggest that keeps xw+y blocks + weights in ~10MB VMEM
        budget = 10 * 1024 * 1024
        per_step = B * 5 * H * 4 + 1  # xw (4H) + y (H) per time step, f32
        chunk = max(8, min(T, int(budget - H * 4 * H * 4) // per_step))
        # round down to a divisor-friendly power of two
        chunk = 1 << (chunk.bit_length() - 1)
        chunk = min(chunk, T)

        t_xla_f = timed(xla_scan_forward, x, Wi, Wh, b)
        t_xla_fb = timed(xla_scan_fwdbwd, x, Wi, Wh, b)
        err = fb_err = ""
        try:
            if args.cpu:
                raise RuntimeError("pallas TPU kernel; skipped on CPU smoke")
            t_pal_f = timed(pallas_forward, x, Wi, Wh, b, chunk)
        except Exception as e:  # noqa: BLE001 — record and move on
            t_pal_f = None
            err = str(e).splitlines()[0][:80]
        fb_chunk, fb_bblk = trainable_auto_blocks(B, H, T)
        try:
            if args.cpu:
                raise RuntimeError("pallas TPU kernel; skipped on CPU smoke")
            t_pal_fb = timed(pallas_fwdbwd, x, Wi, Wh, b, fb_chunk, fb_bblk)
        except Exception as e:  # noqa: BLE001
            t_pal_fb = None
            fb_err = str(e).splitlines()[0][:80]
        rows.append({
            "B": B, "T": T, "H": H, "chunk": chunk,
            "fb_chunk": fb_chunk, "fb_bblk": fb_bblk,
            "xla_fwd_ms": round(t_xla_f * 1e3, 3),
            "xla_fwdbwd_ms": round(t_xla_fb * 1e3, 3),
            "pallas_fwd_ms": (round(t_pal_f * 1e3, 3)
                              if t_pal_f is not None else None),
            "pallas_vs_xla_fwd": (round(t_pal_f / t_xla_f, 3)
                                  if t_pal_f is not None else err),
            "pallas_fwdbwd_ms": (round(t_pal_fb * 1e3, 3)
                                 if t_pal_fb is not None else None),
            "pallas_vs_xla_fwdbwd": (round(t_pal_fb / t_xla_fb, 3)
                                     if t_pal_fb is not None else fb_err),
        })
        print(json.dumps(rows[-1]), flush=True)

    print("\n| B | T | H | XLA fwd (ms) | XLA fwd+bwd (ms) | pallas fwd (ms) | pallas/XLA fwd | pallas fwd+bwd (ms) | pallas/XLA fwd+bwd |")
    print("|---|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['B']} | {r['T']} | {r['H']} | {r['xla_fwd_ms']} | "
              f"{r['xla_fwdbwd_ms']} | {r['pallas_fwd_ms']} | "
              f"{r['pallas_vs_xla_fwd']} | {r['pallas_fwdbwd_ms']} | "
              f"{r['pallas_vs_xla_fwdbwd']} |")
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"backend": jax.default_backend(), "rows": rows}, f,
                      indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
