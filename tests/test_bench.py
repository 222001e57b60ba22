"""Smoke tests for the benchmark entry points (CPU; the real numbers run
on the TPU via the driver)."""

import json
import os
import pathlib
import subprocess
import sys

REPO_ROOT = pathlib.Path(__file__).parent.parent


def _cpu_env():
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""  # disable the axon TPU registration
    env["JAX_PLATFORMS"] = "cpu"
    # opt level 0: these smokes assert plumbing and finite losses, not
    # kernel quality; the XLA CPU optimization pipeline was ~30% of the
    # tiny train-step smoke's 120 s (suite diet, 2026-08-21)
    env["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=8 "
                        "--xla_backend_optimization_level=0")
    return env


def test_bench_train_tiny_smoke():
    """bench_train --tiny runs the full multitrack train step on the
    8-device CPU mesh and prints one valid JSON line."""
    out = subprocess.run(
        [sys.executable, "bench_train.py", "--tiny"],
        cwd=REPO_ROOT, env=_cpu_env(), capture_output=True, text=True,
        timeout=560,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    data = json.loads(out.stdout.strip().splitlines()[-1])
    assert data["metric"] == "train_frames_per_sec_flagship_multitrack"
    assert data["value"] > 0
    assert data["backend"] == "cpu"
    assert data["n_devices"] == 8
    assert "final_loss" in data


def test_bench_flagship_config_instantiates():
    """bench.py's shared flagship acoustic config builds the paper's
    model class with the recipe stream layout."""
    sys.path.insert(0, str(REPO_ROOT))
    import bench

    from ensemble_svs_with_interactions_tpu.utils.config import instantiate

    ac, ss = bench.flagship_acoustic_config(4)
    module = instantiate(ac["netG"])
    assert type(module).__name__ == (
        "MultiTrackMultistreamSeparateF0ParametricModel"
    )
    assert ss == [60, 1, 1, 5]
    assert ac["has_dynamic_features"] == [False, False, False, False]


def test_bench_reference_torch_tiny_smoke():
    """tools/bench_reference_torch.py --tiny: builds the reference torch
    flagship, ports weights, passes the f64-oracle parity gate, and
    emits the head-to-head JSON (the committed full-dims artifact is
    BENCH_REFERENCE_TORCH.json).  Needs the reference checkout."""
    import pytest

    if not pathlib.Path("/root/reference/nnsvs").exists():
        pytest.skip("reference checkout unavailable")
    out = subprocess.run(
        [sys.executable, "tools/bench_reference_torch.py", "--tiny"],
        cwd=REPO_ROOT, env=_cpu_env(), capture_output=True, text=True,
        timeout=560,
    )
    assert out.returncode == 0, (out.stdout[-1500:], out.stderr[-1500:])
    data = json.loads(out.stdout.strip().splitlines()[-1])
    assert data["metric"] == "acoustic_stage_inference_sec_cpu_same_weights"
    assert data["torch_inference_sec"] > 0
    assert data["jax_inference_sec"] > 0
    # equivalence under AR-loop chaos: our f32 sits no farther from the
    # torch-f64 oracle than 3x the reference's own f32 noise
    assert data["parity_vs_torch_f64_oracle"] <= max(
        5e-4, 3.0 * data["reference_own_f32_vs_f64"]
    )


def test_bench_probe_conditions_cpu():
    """bench._probe_conditions returns all probe keys and a verdict; on
    CPU the 'tunnel' probes are near-instant so the shape of the result
    is what's under test (the TPU numbers are validated operationally)."""
    sys.path.insert(0, str(REPO_ROOT))
    import bench

    p = bench._probe_conditions()
    for key in ("rtt_ms", "h2d_mbps", "d2h_mbps", "host_gemm_ms"):
        assert p[key] > 0, p
    assert p["conditions"] in ("nominal", "degraded")
    assert isinstance(p["degraded"], list)
    assert set(bench.NOMINAL) >= {"rtt_ms", "h2d_mbps", "d2h_mbps",
                                  "host_gemm_ms", "rtf"}
