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

Batch geometry defaults to the recipe's working point: 64 pairs x
256-frame random crops (16384 frames per step — the packaged recipe's
use_random_segments geometry; --geom-ab sweeps it against the
full-length rows).  frames/s counts MAIN-TRACK frames (B*T per step) —
the step also trains the sub-track pass, so total model throughput is
2x this.

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


# v5e (v5 lite) MXU peak: 197 TFLOP/s bf16 (f32 matmuls also execute on
# the bf16 MXU via multi-pass, so one bf16-peak denominator keeps the two
# A/B arms comparable; the JSON labels the convention).
V5E_PEAK_FLOPS = 197e12


def run(batch: int, frames: int, steps: int, netg_override=None,
        use_amp: bool = False, donate: bool = True,
        cost_analysis: bool = True):
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
        use_amp=use_amp,
        donate=donate,
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

    # per-step XLA FLOPs from the compiled executable's cost analysis.
    # Lower/compile BEFORE warmup: with donation enabled a donated `state`
    # cannot be reused, and the persistent compilation cache makes the
    # warmup call below a cache hit for the same HLO.
    flops_per_step = None
    try:
        if not cost_analysis:
            raise RuntimeError("cost analysis disabled")
        cost = train_step.lower(state, sharded, weights, key).compile()
        ca = cost.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        if ca and "flops" in ca:
            flops_per_step = float(ca["flops"])
    except Exception:
        pass  # cost analysis is best-effort (older jax / backend quirks)

    # warmup: compile + one real step
    for i in range(2):
        key, sk = jax.random.split(key)
        state, metrics = train_step(state, sharded, weights, sk)
    loss0 = float(metrics["Loss"])
    assert np.isfinite(loss0), f"non-finite warmup loss: {loss0}"

    # per-step wall times (blocked): median separates tunnel outliers
    step_times = []
    for _ in range(steps):
        key, sk = jax.random.split(key)
        t0 = time.time()
        state, metrics = train_step(state, sharded, weights, sk)
        jax.block_until_ready(metrics["Loss"])
        step_times.append(time.time() - t0)
    median_step = float(np.median(step_times))

    out = {
        "steps_per_sec": 1.0 / median_step,
        "frames_per_sec": B * T / median_step,
        "median_step_sec": median_step,
        "all_step_sec": [round(t, 4) for t in step_times],
        "batch_pairs": B,
        "frames_per_batch": B * T,
        "geometry": f"{B}x{T}",
        "n_devices": n_dev,
        "use_amp": use_amp,
        "donate": donate,
        "final_loss": float(metrics["Loss"]),
    }
    if flops_per_step is not None:
        out["flops_per_step"] = flops_per_step
        out["tflops_per_sec"] = flops_per_step / median_step / 1e12
        out["mfu_vs_v5e_bf16_peak"] = (
            flops_per_step / median_step / V5E_PEAK_FLOPS
        )
    return out


def run_diffusion(batch: int, frames: int, steps: int,
                  use_amp: bool = False, donate: bool = True):
    """MXU-utilization reference point: the shipped DiffSinger acoustic
    config (FFTBlocks encoder 256x4 + DiffNet 20x256, reference dims —
    configs/acoustic/acoustic_diffusion_melf0.yaml) through the SAME
    single-track train step the recipe trainers use.

    The flagship multitrack model is biLSTM/AR-scan bound (sequential in
    T, thin per-step matmuls), so its MFU reflects the model family, not
    framework overhead; this conv/attention-heavy model shows what the
    same train-step machinery reaches when the workload is MXU-shaped.
    """
    import jax
    import jax.numpy as jnp

    from ensemble_svs_with_interactions_tpu.parallel import make_mesh, shard_batch
    from ensemble_svs_with_interactions_tpu.train.loop import (
        build_optimizer,
        create_train_step,
    )
    from ensemble_svs_with_interactions_tpu.utils.config import (
        instantiate,
        load_config,
    )

    from pathlib import Path

    import ensemble_svs_with_interactions_tpu as pkg

    cfg_path = (
        Path(pkg.__file__).parent
        / "configs" / "acoustic" / "acoustic_diffusion_melf0.yaml"
    )
    model_cfg = load_config(cfg_path)
    module = instantiate(model_cfg["netG"])
    in_dim = int(model_cfg["netG"]["in_dim"])
    out_dim = int(model_cfg["netG"]["out_dim"])

    mesh = make_mesh()
    n_dev = int(np.prod(mesh.devices.shape))
    B = max(batch - batch % n_dev, n_dev)
    T = frames

    rngs = {
        "params": jax.random.PRNGKey(0),
        "dropout": jax.random.PRNGKey(1),
        "diffusion": jax.random.PRNGKey(2),
    }
    variables = module.init(
        rngs,
        jnp.zeros((1, 8, in_dim)),
        jnp.asarray([8]),
        jnp.zeros((1, 8, out_dim)),
        train=True,
    )
    optimizer = build_optimizer({"name": "Adam", "params": {"lr": 1e-3}})
    train_step, _ = create_train_step(
        module, optimizer, dict(model_cfg), pitch_reg_weight=0.0,
        use_amp=use_amp, donate=donate,
    )
    state = {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
        "opt_state": optimizer.init(variables["params"]),
        "step": jnp.asarray(0),
    }

    rng_np = np.random.default_rng(0)
    batch_np = {
        "in_feats": rng_np.uniform(0, 1, (B, T, in_dim)).astype(np.float32),
        "out_feats": rng_np.normal(size=(B, T, out_dim)).astype(np.float32),
        "lengths": np.full((B,), T, dtype=np.int32),
    }
    sharded = shard_batch(batch_np, mesh)
    key = jax.random.PRNGKey(0)

    flops_per_step = None
    try:
        cost = train_step.lower(state, sharded, key).compile()
        ca = cost.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        if ca and "flops" in ca:
            flops_per_step = float(ca["flops"])
    except Exception:
        pass

    for _ in range(2):
        key, sk = jax.random.split(key)
        state, metrics = train_step(state, sharded, sk)
    assert np.isfinite(float(metrics["Loss"]))

    step_times = []
    for _ in range(steps):
        key, sk = jax.random.split(key)
        t0 = time.time()
        state, metrics = train_step(state, sharded, sk)
        jax.block_until_ready(metrics["Loss"])
        step_times.append(time.time() - t0)
    median_step = float(np.median(step_times))

    out = {
        "model": "diffsinger_melf0 (FFTBlocks 256x4 + DiffNet 20x256)",
        "steps_per_sec": 1.0 / median_step,
        "frames_per_sec": B * T / median_step,
        "median_step_sec": median_step,
        "batch": B,
        "frames_per_batch": B * T,
        "geometry": f"{B}x{T}",
        "n_devices": n_dev,
        "use_amp": use_amp,
        "donate": donate,
        "final_loss": float(metrics["Loss"]),
    }
    if flops_per_step is not None:
        out["flops_per_step"] = flops_per_step
        out["tflops_per_sec"] = flops_per_step / median_step / 1e12
        out["mfu_vs_v5e_bf16_peak"] = (
            flops_per_step / median_step / V5E_PEAK_FLOPS
        )
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=10)
    # defaults mirror the SHIPPED recipe geometry: 256-frame random crops
    # at 64 pairs/step (use_random_segments in the packaged multitrack
    # recipe; geometry_ab measured it ~2.2x the 8x2048 full-length row)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--frames", type=int, default=256)
    p.add_argument("--amp", action="store_true", help="bf16 fwd/bwd (use_amp)")
    p.add_argument("--no-donate", action="store_true",
                   help="disable state donation (A/B)")
    p.add_argument("--ab", action="store_true",
                   help="run the f32/amp and donate/no-donate A/B matrix")
    p.add_argument("--geom-ab", action="store_true",
                   help="constant-frames batch-geometry sweep "
                        "(8x2048 / 32x512 / 64x256)")
    p.add_argument("--diffusion", action="store_true",
                   help="MXU-shaped reference point: the shipped "
                        "DiffSinger melf0 model through the same step")
    p.add_argument("--out", default=None,
                   help="also write the JSON to this path (BENCH_TRAIN.json)")
    p.add_argument("--tiny", action="store_true",
                   help="CPU-sized smoke run (tiny dims, 2 steps)")
    args = p.parse_args(argv)

    metric_name = ("train_frames_per_sec_diffsinger_melf0"
                   if args.diffusion else
                   "train_frames_per_sec_flagship_multitrack")
    _enable_compilation_cache()
    backend = _probe_accelerator()
    if not backend:
        print(json.dumps({
            "metric": metric_name,
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
        # cost_analysis off: the extra lower+compile would double the
        # tiny smoke's (CPU, uncached) compile time for no signal
        stats = run(batch=2, frames=64, steps=2, netg_override=netg,
                    use_amp=args.amp, donate=not args.no_donate,
                    cost_analysis=False)
    elif args.diffusion:
        stats = run_diffusion(args.batch, args.frames, args.steps,
                              use_amp=args.amp, donate=not args.no_donate)
    elif args.geom_ab:
        # Constant-frames geometry sweep: the encoder/decoder scans are
        # SEQUENTIAL in T, so at fixed frames-per-step (B*T) shorter
        # sequences mean fewer sequential scan iterations and fatter
        # per-iteration matmuls on the MXU.  64x256 is the reference's
        # own AR working point (256-frame random crops,
        # /root/reference/nnsvs/train_util.py:595 collate_fn_random_segments).
        # Headline the arm matching --batch/--frames (the shipped recipe
        # default) so "--geom-ab --out BENCH_TRAIN.json" never silently
        # promotes a sweep arm over the default geometry.
        default_arm = f"{args.batch}x{args.frames}"
        geoms = [(8, 2048), (32, 512), (64, 256)]
        if (args.batch, args.frames) not in geoms:
            geoms.append((args.batch, args.frames))
        arms = {}
        for B, T in geoms:
            arms[f"{B}x{T}"] = run(B, T, args.steps,
                                   use_amp=args.amp,
                                   donate=not args.no_donate)
        stats = dict(arms[default_arm])
        stats["geometry_ab"] = {
            name: {k: (round(v, 4) if isinstance(v, float) else v)
                   for k, v in arm.items() if k != "all_step_sec"}
            for name, arm in arms.items()
        }
    elif args.ab:
        # A/B matrix at recipe dims: measure what use_amp and donation buy
        arms = {}
        for name, amp, donate in (
            ("f32_donate", False, True),
            ("amp_donate", True, True),
            ("amp_no_donate", True, False),
        ):
            arms[name] = run(args.batch, args.frames, args.steps,
                             use_amp=amp, donate=donate)
        stats = dict(arms["amp_donate"])
        stats["ab"] = {
            name: {k: (round(v, 4) if isinstance(v, float) else v)
                   for k, v in arm.items() if k != "all_step_sec"}
            for name, arm in arms.items()
        }
    else:
        stats = run(args.batch, args.frames, args.steps,
                    use_amp=args.amp, donate=not args.no_donate)

    result = {
        "metric": metric_name,
        "value": round(stats["frames_per_sec"], 1),
        "unit": "frames/s",
        "backend": backend,
        "peak_convention": "v5e bf16 MXU peak 197 TFLOP/s",
        **{k: (round(v, 4) if isinstance(v, float) else v)
           for k, v in stats.items() if k != "frames_per_sec"},
    }
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
