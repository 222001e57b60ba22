#!/usr/bin/env python
"""Per-component profile of the flagship multitrack train step.

Round-4 verdict Weak #2: the 64x256 flagship train step reaches 14% MFU
with a credible "scan-bound" narrative but no committed measurement of
where the step actually goes.  No xplane trace viewer exists in this
environment (no tensorflow/tensorboard profile plugin), so this tool
measures the breakdown directly:

1. full train step (fwd + bwd + Adam), the BENCH_TRAIN baseline;
2. forward-only loss (same loss_fn, no grad) -> fwd vs bwd+update split;
3. each submodule at the same geometry, forward and forward+backward:
   encoder (512x3 biLSTM), AR lf0 decoder (teacher-forced scan),
   mgc/vuv/bap FFConvLSTM decoders — built standalone at verbatim dims
   so XLA compiles each in isolation (sum > whole shows cross-component
   fusion/overlap; whole > sum shows glue cost);
4. inter-step host gap: K steps chained asynchronously (one final
   block) vs K steps blocked individually.

Timing: each jitted fn is dispatched K times back-to-back and blocked
once at the end — over the axon tunnel a per-call block pays ~28 ms RTT
which would swamp sub-100 ms kernels (CLAUDE.md "Benchmarking over the
tunnel").

Usage: python tools/profile_train_step.py [--tiny] [--batch 64]
           [--frames 256] [--reps 5] [--out PROFILE_TRAIN.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

IN_DIM = 86


_RTT_EST = [0.0]


def _fetch_barrier(out):
    """Force completion with a REAL device_get of one output leaf —
    block_until_ready lies over the axon tunnel (async enqueue;
    measured: it reported 5 ms for a step that takes 194 ms wall)."""
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.numpy.ravel(leaf)[0])


def timed_calls(fn, args, reps: int, inner: int = 4):
    """Median over ``reps`` of [dispatch ``inner`` back-to-back calls,
    fetch one scalar of the last] / inner, minus the fetch round trip.

    Adaptive inner: the tunnel fetch RTT is 40-80 ms with ±20 ms jitter,
    so a kernel must accumulate >= ~5x the RTT of device time per sample
    or the subtraction returns noise (first attempt measured a 54 ms
    biLSTM at 0.0 and a smaller one at 54 ms)."""

    def sample(inner):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            outs = [fn(*args) for _ in range(inner)]
            _fetch_barrier(outs[-1])
            ts.append((time.perf_counter() - t0 - _RTT_EST[0]) / inner)
        return float(max(np.median(ts), 0.0))

    for _ in range(2):  # compile + warm
        _fetch_barrier(fn(*args))
    est = sample(inner)
    rtt = _RTT_EST[0]
    if rtt > 0 and est * inner < 5 * rtt:
        inner = int(min(128, max(16, np.ceil(5 * rtt / max(est, 1e-4)))))
        est = sample(inner)
    return est


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--frames", type=int, default=256)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--tiny", action="store_true",
                   help="CPU-sized smoke (tiny dims, used by the suite)")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    from bench import _enable_compilation_cache, flagship_acoustic_config

    _enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from ensemble_svs_with_interactions_tpu.parallel import make_mesh, shard_batch
    from ensemble_svs_with_interactions_tpu.train.loop import build_optimizer
    from ensemble_svs_with_interactions_tpu.train.multitrack import (
        create_multitrack_acoustic_train_step,
    )
    from ensemble_svs_with_interactions_tpu.utils.config import instantiate

    if args.tiny:
        import __graft_entry__ as ge

        netg = ge._flagship_netg()
        ss = ge.STREAM_SIZES
        B, T = 2, 32
        reps, inner = 2, 2
    else:
        ac, ss = flagship_acoustic_config(4)
        netg = ac["netG"]
        B, T = args.batch, args.frames
        reps, inner = args.reps, 4
    out_dim = int(sum(ss))

    module = instantiate(netg)
    mesh = make_mesh()
    n_dev = int(np.prod(mesh.devices.shape))
    B = max(B - B % n_dev, n_dev)

    rngs = {
        "params": jax.random.PRNGKey(0),
        "dropout": jax.random.PRNGKey(1),
        "prenet": jax.random.PRNGKey(2),
        "zoneout": jax.random.PRNGKey(3),
    }
    zeros = jnp.zeros((1, 8, IN_DIM))
    ys = (jnp.zeros((1, 8, out_dim)), jnp.zeros((1, 8, out_dim)))
    spks1 = (jnp.zeros((1,), jnp.int32), jnp.ones((1,), jnp.int32))
    variables = module.init(
        rngs, zeros, zeros, spks1, jnp.asarray([8]), ys, train=True
    )

    optimizer = build_optimizer({"name": "Adam", "params": {"lr": 1e-3}})
    # donate=False so the same state can be passed repeatedly; the
    # donation saving is measured separately by bench_train --ab
    train_step, _ = create_multitrack_acoustic_train_step(
        module, optimizer, {"stream_sizes": list(ss)},
        pitch_reg_weight=1.0, sub_require_grad=True, donate=False,
    )
    state = {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
        "opt_state": optimizer.init(variables["params"]),
        "step": jnp.asarray(0),
    }
    state = jax.device_put(state)

    rng = np.random.default_rng(0)
    batch_np = {
        "in_feats0": rng.uniform(0, 1, (B, T, IN_DIM)).astype(np.float32),
        "out_feats0": rng.normal(size=(B, T, out_dim)).astype(np.float32),
        "in_feats1": rng.uniform(0, 1, (B, T, IN_DIM)).astype(np.float32),
        "out_feats1": rng.normal(size=(B, T, out_dim)).astype(np.float32),
        "spks0": np.zeros((B,), np.int32),
        "spks1": np.ones((B,), np.int32),
        "lengths": np.full((B,), T, dtype=np.int32),
    }
    sharded = shard_batch(batch_np, mesh)
    weights = {"logf0_diff": jnp.asarray(1.0), "mgc_diff": jnp.asarray(1.0)}
    key = jax.random.PRNGKey(0)

    prof = {"geometry": f"{B}x{T}", "n_devices": n_dev, "reps": reps}

    # estimate the fetch round trip once (subtracted from every sample)
    null = jax.jit(lambda x: x + 1.0)
    _fetch_barrier(null(jnp.zeros(())))
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _fetch_barrier(null(jnp.zeros(())))
        rtts.append(time.perf_counter() - t0)
    _RTT_EST[0] = float(np.median(rtts))
    prof["fetch_rtt_sec"] = round(_RTT_EST[0], 5)

    # 1. full step — can't chain (state not donated here), so dispatch the
    # SAME state repeatedly; XLA executes each fully (no caching of
    # results across distinct executions)
    def step_fn(state, batch, w, k):
        new_state, metrics = train_step(state, batch, w, k)
        return metrics["Loss"]

    prof["full_step_sec"] = timed_calls(
        step_fn, (state, sharded, weights, key), reps, inner
    )

    # 2. forward-only loss: jit the exact loss computation minus autodiff.
    # create_*_train_step closes over loss_fn; rebuild the equivalent here
    # by calling module.apply + the loss helpers through eval of one grad-
    # free jit.  Reuse train=True semantics (dropout active) to match.
    from ensemble_svs_with_interactions_tpu.train.multitrack import (
        multitrack_acoustic_loss,
    )
    from ensemble_svs_with_interactions_tpu.train import losses as L

    stream_sizes = list(ss)
    prediction_type = module.prediction_type()

    @jax.jit
    def fwd_only(params, batch_stats, batch, w, k):
        in0, in1 = batch["in_feats0"], batch["in_feats1"]
        out0, out1 = batch["out_feats0"], batch["out_feats1"]
        lengths = batch["lengths"]
        Tb = in0.shape[1]
        mask = (
            jnp.arange(Tb)[None, :] < lengths[:, None]
        ).astype(jnp.float32)[:, :, None]
        r1, r2, r3 = jax.random.split(k, 3)
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        outs = module.apply(
            variables, in0, in1, (batch["spks0"], batch["spks1"]),
            lengths, (out0, out1), train=True,
            rngs={"dropout": r1, "prenet": r2, "zoneout": r3},
            mutable=["batch_stats"] if batch_stats else False,
        )
        if batch_stats:
            outs, _ = outs
        (pred_main, lf0_res_main), (pred_sub, _) = outs
        lf, l1, l2 = multitrack_acoustic_loss(
            pred_main, pred_sub, out0, out1, mask, stream_sizes,
            prediction_type=prediction_type,
        )
        lp = L.pitch_regularization_loss(lf0_res_main, mask, 1.0)
        return lf + lp + w["logf0_diff"] * l1 + w["mgc_diff"] * l2

    prof["fwd_only_sec"] = timed_calls(
        fwd_only,
        (state["params"], state["batch_stats"], sharded, weights, key),
        reps, inner,
    )
    prof["bwd_plus_update_sec"] = prof["full_step_sec"] - prof["fwd_only_sec"]

    # same loss under value_and_grad but WITHOUT clip/Adam/apply_updates:
    # separates the composite backward from the optimizer tail
    grad_fn = jax.jit(jax.grad(fwd_only))
    prof["fwd_bwd_no_opt_sec"] = timed_calls(
        grad_fn,
        (state["params"], state["batch_stats"], sharded, weights, key),
        reps, inner,
    )
    prof["optimizer_tail_sec"] = (
        prof["full_step_sec"] - prof["fwd_bwd_no_opt_sec"]
    )

    # 3. submodules standalone at the same geometry
    sub_cfgs = {
        "encoder": netg["encoder"],
        "lf0_model": netg["lf0_model"],
        "mgc_model": netg["mgc_model"],
        "vuv_model": netg["vuv_model"],
        "bap_model": netg["bap_model"],
    }
    emb_dim = int(netg["speaker_embedding"]["embedding_dim"])
    enc_out = int(netg["encoder"]["out_dim"])
    x0 = jnp.asarray(batch_np["in_feats0"])
    x1 = jnp.asarray(batch_np["in_feats1"])
    se = jnp.zeros((B, 1, emb_dim))
    lens = jnp.asarray(batch_np["lengths"])
    dec_in = jnp.asarray(
        rng.normal(size=(B, T, enc_out + 2)).astype(np.float32)
    )
    y_lf0 = jnp.asarray(rng.normal(size=(B, T, 1)).astype(np.float32))

    def make_calls(name, cfg):
        sub = instantiate(cfg)
        if name == "encoder":
            a = (x0, x1, (se, se), lens)
            kw = {}
        elif name == "lf0_model":
            a = (x0, x1, se, se, lens, y_lf0)
            kw = {}
        else:
            a = (dec_in, lens)
            kw = {}
        srngs = {
            "params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "prenet": jax.random.PRNGKey(2),
            "zoneout": jax.random.PRNGKey(3),
        }
        v = sub.init(srngs, *a, train=True, **kw)
        has_bs = bool(v.get("batch_stats"))

        def fwd(params, *a):
            var = {"params": params}
            if has_bs:
                var["batch_stats"] = v["batch_stats"]
            out = sub.apply(
                var, *a, train=True,
                rngs={"dropout": jax.random.PRNGKey(1),
                      "prenet": jax.random.PRNGKey(2),
                      "zoneout": jax.random.PRNGKey(3)},
                mutable=["batch_stats"] if has_bs else False,
                **kw,
            )
            if has_bs:
                out, _ = out
            leaves = jax.tree_util.tree_leaves(out)
            return sum(jnp.sum(leaf.astype(jnp.float32)) for leaf in leaves)

        return v["params"], jax.jit(fwd), jax.jit(jax.grad(fwd)), a

    for name, cfg in sub_cfgs.items():
        params_s, fwd_j, grad_j, a = make_calls(name, dict(cfg))
        prof[f"{name}_fwd_sec"] = timed_calls(fwd_j, (params_s, *a), reps, inner)
        prof[f"{name}_fwdbwd_sec"] = timed_calls(
            grad_j, (params_s, *a), reps, inner
        )

    prof["submodule_fwd_sum_sec"] = float(
        sum(v for k, v in prof.items() if k.endswith("_fwd_sec"))
    )
    prof["submodule_fwdbwd_sum_sec"] = float(
        sum(v for k, v in prof.items() if k.endswith("_fwdbwd_sec"))
    )

    # 4. inter-step host gap: fetch-each-step vs chained dispatch with one
    # final fetch (the trainer's steady state fetches metrics per step)
    K = max(reps, 3)
    t0 = time.perf_counter()
    for _ in range(K):
        _, metrics = train_step(state, sharded, weights, key)
        _fetch_barrier(metrics["Loss"])
    blocked = (time.perf_counter() - t0) / K
    t0 = time.perf_counter()
    ms = [train_step(state, sharded, weights, key)[1]["Loss"] for _ in range(K)]
    _fetch_barrier(ms[-1])
    chained = (time.perf_counter() - t0) / K
    prof["step_fetch_each_sec"] = blocked
    prof["step_chained_sec"] = chained
    prof["host_gap_sec_per_step"] = blocked - chained

    prof = {
        k: (round(v, 5) if isinstance(v, float) else v) for k, v in prof.items()
    }
    prof["backend"] = jax.default_backend()
    print(json.dumps(prof))
    if args.out:
        Path(args.out).write_text(json.dumps(prof, indent=1) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
