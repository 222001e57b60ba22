"""Generated reference baseline: same-box, same-weights acoustic-stage
inference speed — reference PyTorch vs this framework's JAX — on CPU.

BASELINE.md records that the reference publishes NO performance numbers;
its RTFs are only logged at runtime (reference nnsvs/svs.py:448-452) and
no trained model can be downloaded in this egress-less environment. This
tool *generates* the missing baseline for the stage that dominates model
compute: the paper's multitrack acoustic model
(MultiTrackMultistreamSeparateF0ParametricModel at verbatim recipe dims,
bench.flagship_acoustic_config) is built in the reference's own torch
code, its weights are ported onto our flax model (utils/torch_port —
the same machinery the parity suite uses, scope map from
tests/test_torch_port.py::test_port_flagship_multitrack), a short
teacher-forced forward proves both sides compute the same function, and
then both run `inference` on identical inputs on the same CPU.

Reported:
- torch_inference_sec      — reference model.inference(x_main, x_sub)
- jax_inference_sec        — our apply(method="inference") (both tracks,
                             compute-equivalent to the reference call)
- jax_inference_main_sec   — our inference_main (the as-shipped pipeline
                             path: pairwise synthesis discards sub-track
                             decoder output, so the engine skips it)
The TPU numbers for this same stage live in bench.py's stages_blocked_sec
("acoustic_blocked") — this tool is the CPU/CPU reference comparison.

Usage (needs the reference checkout, default /root/reference):
    python tools/bench_reference_torch.py [--frames 3000] [--runs 3]
        [--tiny] [--out BENCH_REFERENCE_TORCH.json]
"""

from __future__ import annotations

import argparse
import inspect
import json
import os
import sys
import time
import types
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path(os.environ.get("ESVS_REFERENCE_PATH", "/root/reference"))


def _install_reference_shims():
    """Stub the reference's native deps (same set the parity tests shim —
    tests/test_torch_port.py) so its torch model zoo imports without
    pyworld/pysptk/nnmnkwii/hydra wheels."""

    def shim(name, **attrs):
        # Only stub modules confirmed ABSENT: registering an empty
        # pkg_resources (etc.) over a real wheel would poison every later
        # import in the process.
        import importlib.util

        try:
            if importlib.util.find_spec(name) is not None:
                importlib.import_module(name)  # later fixups index sys.modules
                return
        except (ImportError, ValueError):
            pass  # parent missing/unimportable: the stub is needed
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules.setdefault(name, mod)

    shim("pkg_resources", resource_filename=lambda *a: "")
    for n in (
        "pyworld", "pysptk", "librosa", "soundfile",
        "nnmnkwii", "nnmnkwii.paramgen", "nnmnkwii.io", "nnmnkwii.io.hts",
        "nnmnkwii.frontend", "nnmnkwii.frontend.merlin",
        "nnmnkwii.preprocessing", "nnmnkwii.preprocessing.f0",
        "nnmnkwii.postfilters", "nnmnkwii.metrics", "parallel_wavegan",
    ):
        shim(n)
    sys.modules["nnmnkwii"].paramgen = sys.modules["nnmnkwii.paramgen"]
    sys.modules["nnmnkwii.paramgen"].mlpg = lambda *a, **k: None

    def _lfilter(waveform, a_coeffs, b_coeffs, clamp=True):
        import torch
        from scipy.signal import lfilter as sp_lfilter

        x = waveform.detach().numpy()
        out = sp_lfilter(
            b_coeffs.detach().numpy(), a_coeffs.detach().numpy(), x, axis=-1
        )
        return torch.from_numpy(out.astype(x.dtype))

    shim("torchaudio")
    shim("torchaudio.functional", lfilter=_lfilter)
    sys.modules["torchaudio"].functional = sys.modules["torchaudio.functional"]
    shim("hydra")
    shim(
        "hydra.utils",
        instantiate=lambda *a, **k: None,
        to_absolute_path=lambda p: p,
    )
    shim("omegaconf", OmegaConf=object, DictConfig=dict)
    if str(REFERENCE) not in sys.path:
        sys.path.append(str(REFERENCE))


def _torch_from_config(cfg: dict):
    """Instantiate the reference torch class mirrored by a `_target_`
    config dict (our configs use the reference's own kwarg names; any
    kwarg the torch signature lacks is dropped with a notice)."""
    import nnsvs.acoustic_models as A
    import nnsvs.model  # noqa: F401

    name = cfg["_target_"].rsplit(".", 1)[1]
    try:
        cls = getattr(A, name)
    except AttributeError:
        from nnsvs import model as M

        cls = getattr(M, name)
    kwargs = {}
    sig = inspect.signature(cls.__init__)
    # reference SpeakerEmbedding requires padding_idx; our config (like
    # the reference YAMLs' defaults) leaves it None
    if name == "SpeakerEmbedding":
        kwargs["padding_idx"] = None
    for k, v in cfg.items():
        if k == "_target_":
            continue
        if isinstance(v, dict) and "_target_" in v:
            v = _torch_from_config(v)
        if k in sig.parameters:
            kwargs[k] = v
        else:
            print(f"  [note] {name}: dropping kwarg {k!r} "
                  "(not in reference signature)")
    return cls(**kwargs)


def _flagship_configs(tiny: bool):
    sys.path.insert(0, str(REPO))
    import bench

    ac, ss = bench.flagship_acoustic_config(4)
    netg = ac["netG"]
    if tiny:
        # CI smoke dims: same classes/topology, small widths
        netg["encoder"].update(embed_dim=8, hidden_dim=8, out_dim=16,
                               num_layers=1)
        netg["lf0_model"].update(embed_dim=8, ff_hidden_dim=8,
                                 conv_hidden_dim=8, lstm_hidden_dim=4,
                                 num_lstm_layers=1, decoder_hidden_dim=8)
        for k in ("mgc_model", "vuv_model", "bap_model"):
            netg[k].update(in_dim=18, ff_hidden_dim=8, conv_hidden_dim=8,
                           lstm_hidden_dim=4, num_lstm_layers=1)
        netg["speaker_embedding"]["embedding_dim"] = 8
    return netg, ss


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=3000,
                   help="frames per track (5 ms hop: 3000 = 15 s audio)")
    p.add_argument("--runs", type=int, default=3)
    p.add_argument("--tiny", action="store_true",
                   help="CI smoke: tiny dims, 64 frames, 1 run")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)
    if args.tiny:
        args.frames, args.runs = 64, 1

    if not (REFERENCE / "nnsvs").exists():
        print(json.dumps({"error": f"reference checkout not at {REFERENCE}"}))
        return 1

    # CPU on both sides: force before jax import (the axon sitecustomize
    # pins the TPU backend otherwise)
    os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, str(REPO))
    import bench

    bench._enable_compilation_cache()  # suite reruns skip the CPU compile
    import jax.numpy as jnp
    import torch

    _install_reference_shims()
    sys.path.insert(0, str(REPO))
    from ensemble_svs_with_interactions_tpu.utils.config import (
        _wrap,
        instantiate,
    )
    from ensemble_svs_with_interactions_tpu.utils.torch_port import (
        torch_to_flax,
    )

    netg, ss = _flagship_configs(args.tiny)
    # reproduce the reference's sub-track encoder routing exactly (the
    # parity flag the port suite uses — multistream.py:520-522 in the
    # reference; our default routing differs)
    netg["compat_sub_encoder_outs"] = True
    IN, OUT = netg["in_dim"], netg["out_dim"]
    print(f"building reference torch model ({'tiny' if args.tiny else 'verbatim recipe'} dims)...")
    torch.manual_seed(11)
    tm = _torch_from_config(netg).eval()
    n_params = sum(int(np.prod(t.shape)) for t in tm.state_dict().values())
    print(f"  {n_params/1e6:.1f} M params")

    print("porting weights torch -> flax...")
    fm = instantiate(_wrap(netg))
    B, Tp = 1, 16
    rngs = {
        "params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
        "prenet": jax.random.PRNGKey(2), "zoneout": jax.random.PRNGKey(3),
    }
    spks = (jnp.zeros((B,), jnp.int32), jnp.ones((B,), jnp.int32))
    fv = fm.init(
        rngs, jnp.zeros((B, Tp, IN)), jnp.zeros((B, Tp, IN)), spks,
        jnp.asarray([Tp]), (jnp.zeros((B, Tp, OUT)),) * 2, train=True,
    )
    scopes = [
        ("encoder.", "/encoder"), ("mgc_model.", "/mgc_model"),
        ("lf0_model.", "/lf0_model"), ("vuv_model.", "/vuv_model"),
        ("bap_model.", "/bap_model"),
        ("speaker_embedding.", "/speaker_embedding"),
    ]
    fv, n_ported = torch_to_flax(
        {k: v.numpy() for k, v in tm.state_dict().items()}, fv,
        scope_pairs=scopes,
    )
    print(f"  ported {n_ported} tensors")

    ph_s = netg["encoder"]["in_ph_start_idx"]
    ph_e = netg["encoder"]["in_ph_end_idx"]

    def make_inputs(T, seed):
        # linguistic-feature-shaped input: ONE-HOT phone block (the
        # reference's track-merge asserts sum<=1), binary rest flag,
        # min-max-normalized lf0 score in (0,1)
        rng = np.random.default_rng(seed)

        def one(s):
            x = rng.uniform(0.0, 1.0, (B, T, IN)).astype(np.float32)
            x[:, :, ph_s:ph_e] = 0.0
            ph = rng.integers(ph_s, ph_e, (B, T))
            for b in range(B):
                x[b, np.arange(T), ph[b]] = 1.0
            x[:, :, netg["in_rest_idx"]] = (
                rng.uniform(size=(B, T)) < 0.1
            ).astype(np.float32)
            x[:, :, netg["in_lf0_idx"]] = rng.uniform(0.3, 0.7, (B, T)).astype(
                np.float32
            )
            return x

        return one(0), one(1)

    # --- parity spot check (short, deterministic: recipe prenet_layers=0).
    # The AR lf0 decoder's feedback loop amplifies fp32 rounding noise, so
    # torch-f32 vs jax-f32 is NOT a valid equivalence test at recipe dims:
    # measured 2026-08-21, torch f32 deviates from its own f64 run by
    # ~1.6e-3 on this very check while our f32 stays within ~3e-6 of the
    # torch-f64 oracle.  So the oracle is the reference model run in
    # float64; we assert OUR f32 output matches it, and report the
    # reference's own f32 deviation for context.
    import copy

    xs, xs2 = make_inputs(32, 1)
    tspk32 = [torch.zeros(B, dtype=torch.long), torch.ones(B, dtype=torch.long)]
    tm64 = copy.deepcopy(tm).double()
    with torch.no_grad():
        t_out = tm.inference(
            torch.from_numpy(xs), torch.from_numpy(xs2), tspk32,
            torch.tensor([32]),
        )
        t_out64 = tm64.inference(
            torch.from_numpy(xs).double(), torch.from_numpy(xs2).double(),
            tspk32, torch.tensor([32]),
        )
    del tm64
    f_out = fm.apply(
        fv, jnp.asarray(xs), jnp.asarray(xs2), spks, jnp.asarray([32]),
        method="inference", rngs={"prenet": jax.random.PRNGKey(9)},
    )
    t_main64 = t_out64[0].numpy()
    err = float(np.max(np.abs(np.asarray(f_out[0]) - t_main64)))
    err_torch_f32 = float(np.max(np.abs(t_out[0].numpy() - t_main64)))
    print(f"parity vs torch-f64 oracle (T=32, main track): ours {err:.3e}, "
          f"reference's own f32 {err_torch_f32:.3e}")
    # Equivalence under chaos: our f32 must sit no farther from the f64
    # oracle than the reference's own f32 does (x3 headroom), or within
    # an absolute 5e-4 when the loop happens to be tame.
    assert err < max(5e-4, 3.0 * err_torch_f32), (
        "ported model diverged beyond the reference's own fp32 noise — "
        "speed comparison void")

    # --- benchmark
    T = args.frames
    x0, x1 = make_inputs(T, 2)
    tx0, tx1 = torch.from_numpy(x0), torch.from_numpy(x1)
    tspk = [torch.zeros(B, dtype=torch.long), torch.ones(B, dtype=torch.long)]
    tlen = torch.tensor([T])

    def timed(fn, runs):
        ts = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)), ts

    with torch.no_grad():
        tm.inference(tx0, tx1, tspk, tlen)  # warm-up
        torch_sec, torch_all = timed(
            lambda: tm.inference(tx0, tx1, tspk, tlen), args.runs
        )

    jx0, jx1, jlen = jnp.asarray(x0), jnp.asarray(x1), jnp.asarray([T])
    prng = {"prenet": jax.random.PRNGKey(9)}

    @jax.jit
    def j_full(v, a, b, ln):
        return fm.apply(v, a, b, spks, ln, method="inference", rngs=prng)

    @jax.jit
    def j_main(v, a, b, ln):
        return fm.apply(v, a, b, spks, ln, method="inference_main",
                        rngs=prng)

    print("compiling jax inference (CPU)...")
    jax.block_until_ready(j_full(fv, jx0, jx1, jlen))
    jax_sec, jax_all = timed(
        lambda: jax.block_until_ready(j_full(fv, jx0, jx1, jlen)), args.runs
    )
    if args.tiny:
        # suite smoke: skip the inference_main arm — it costs a second
        # CPU compile and the committed full-dims artifact carries it
        jmain_sec, jmain_all = jax_sec, jax_all
    else:
        jax.block_until_ready(j_main(fv, jx0, jx1, jlen))
        jmain_sec, jmain_all = timed(
            lambda: jax.block_until_ready(j_main(fv, jx0, jx1, jlen)),
            args.runs,
        )

    audio_sec = T * 0.005
    result = {
        "metric": "acoustic_stage_inference_sec_cpu_same_weights",
        "frames": T,
        "audio_seconds": audio_sec,
        "params_millions": round(n_params / 1e6, 2),
        "parity_vs_torch_f64_oracle": err,
        "reference_own_f32_vs_f64": err_torch_f32,
        "torch_inference_sec": round(torch_sec, 4),
        "torch_rtf": round(torch_sec / audio_sec, 4),
        "jax_inference_sec": round(jax_sec, 4),
        "jax_rtf": round(jax_sec / audio_sec, 4),
        "jax_inference_main_sec": round(jmain_sec, 4),
        "jax_main_rtf": round(jmain_sec / audio_sec, 4),
        "speedup_full_vs_torch": round(torch_sec / jax_sec, 3),
        "speedup_main_vs_torch": round(torch_sec / jmain_sec, 3),
        "all_runs": {"torch": [round(t, 4) for t in torch_all],
                     "jax_full": [round(t, 4) for t in jax_all],
                     "jax_main": [round(t, 4) for t in jmain_all]},
        "note": ("CPU/CPU, identical ported weights, B=1 pair; the "
                 "shipped pipeline runs this stage on TPU — see bench.py "
                 "stages_blocked_sec.acoustic_blocked"),
    }
    print(json.dumps(result))
    if args.out:
        Path(args.out).write_text(json.dumps(result, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
