"""Training-throughput benchmark: the paper's flagship multitrack
acoustic train step at verbatim recipe dims.

Prints ONE JSON line like bench.py (the driver's headline benchmark is
bench.py — this is the secondary, training-side number):

  {"metric": "train_frames_per_sec_flagship_multitrack", "value": N,
   "unit": "frames/s", ...}

What is measured: the FULL jitted data-parallel training step of
MultiTrackMultistreamSeparateF0ParametricModel (encoder 512x3 biLSTM,
AR residual-F0 decoder reduction 4, FFConvLSTM stream decoders) with
stream losses + inter-singer interaction losses + pitch regularization
and the Adam update, state donated (in-place buffer reuse) — the same
step the recipe trainers run (train/multitrack.py), sharded over all
available devices (reference equivalent: one DDP rank pair,
/root/reference/nnsvs/bin/train_acoustic_multitrack.py:493-637).

Batch geometry defaults to the recipe's working point: batch_max_frames
32000 per step (B pairs x T frames), frames/s counts MAIN-TRACK frames
(B*T per step) — the step also trains the sub-track pass, so total
model throughput is 2x this.

Usage:  python bench_train.py [--steps N] [--batch B] [--frames T]
        [--tiny]           # CPU-sized smoke (used by the test suite)
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

from bench import _enable_compilation_cache, _probe_accelerator, flagship_acoustic_config

IN_DIM = 86


def run(batch: int, frames: int, steps: int, netg_override=None):
    import jax
    import jax.numpy as jnp

    from ensemble_svs_with_interactions_tpu.parallel import make_mesh, shard_batch
    from ensemble_svs_with_interactions_tpu.train.loop import build_optimizer
    from ensemble_svs_with_interactions_tpu.train.multitrack import (
        create_multitrack_acoustic_train_step,
    )
    from ensemble_svs_with_interactions_tpu.utils.config import instantiate

    ac, ss = netg_override or flagship_acoustic_config(4)
    out_dim = int(sum(ss))
    module = instantiate(ac["netG"])

    mesh = make_mesh()
    n_dev = int(np.prod(mesh.devices.shape))
    B = max(batch - batch % n_dev, n_dev)  # shard evenly
    T = frames

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
    train_step, _ = create_multitrack_acoustic_train_step(
        module,
        optimizer,
        {"stream_sizes": list(ss)},
        pitch_reg_weight=1.0,
        sub_require_grad=True,
    )
    state = {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
        "opt_state": optimizer.init(variables["params"]),
        "step": jnp.asarray(0),
    }

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

    # warmup: compile + one real step
    for i in range(2):
        key, sk = jax.random.split(key)
        state, metrics = train_step(state, sharded, weights, sk)
    loss0 = float(metrics["Loss"])
    assert np.isfinite(loss0), f"non-finite warmup loss: {loss0}"

    t0 = time.time()
    for _ in range(steps):
        key, sk = jax.random.split(key)
        state, metrics = train_step(state, sharded, weights, sk)
    jax.block_until_ready(state["params"])
    elapsed = time.time() - t0

    return {
        "steps_per_sec": steps / elapsed,
        "frames_per_sec": steps * B * T / elapsed,
        "batch_pairs": B,
        "frames_per_batch": B * T,
        "n_devices": n_dev,
        "final_loss": float(metrics["Loss"]),
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--frames", type=int, default=2048)
    p.add_argument("--tiny", action="store_true",
                   help="CPU-sized smoke run (tiny dims, 2 steps)")
    args = p.parse_args(argv)

    _enable_compilation_cache()
    backend = _probe_accelerator()
    if not backend:
        print(json.dumps({
            "metric": "train_frames_per_sec_flagship_multitrack",
            "value": -1, "unit": "frames/s",
            "error": "accelerator unreachable (device enumeration timed "
                     "out — TPU tunnel down?)",
        }))
        return 1

    if args.tiny:
        import __graft_entry__ as ge

        netg = (
            {"netG": ge._flagship_netg(), "stream_sizes": ge.STREAM_SIZES},
            ge.STREAM_SIZES,
        )
        stats = run(batch=2, frames=64, steps=2, netg_override=netg)
    else:
        stats = run(args.batch, args.frames, args.steps)

    result = {
        "metric": "train_frames_per_sec_flagship_multitrack",
        "value": round(stats["frames_per_sec"], 1),
        "unit": "frames/s",
        "backend": backend,
        **{k: (round(v, 4) if isinstance(v, float) else v)
           for k, v in stats.items() if k != "frames_per_sec"},
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
