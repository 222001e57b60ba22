"""Smoke tests for the small utility CLIs that had no direct coverage:
run_svs, overwrite_phoneme_flags, merge_postfilters, visualize_vibrato,
plot_metrics (reference utils/*.py equivalents)."""

import json
import pathlib

import jax
import numpy as np
import pytest
from flax import serialization
from scipy.io import wavfile

from ensemble_svs_with_interactions_tpu.io import hts
from tests.util import NIT_LAB, build_tiny_packed_model


@pytest.fixture(scope="module")
def packed(tmp_path_factory):
    return build_tiny_packed_model(tmp_path_factory.mktemp("packed"))


@pytest.fixture(scope="module")
def short_lab(tmp_path_factory):
    labels = hts.load(NIT_LAB)
    n = next(i for i, e in enumerate(labels.end_times) if e > 6e7)
    p = tmp_path_factory.mktemp("lab") / "test.lab"
    labels[: max(n, 10)].save(p)
    return p


def test_run_svs_cli(tmp_path, packed, short_lab):
    from ensemble_svs_with_interactions_tpu.bin.run_svs import main
    from ensemble_svs_with_interactions_tpu.pretrained import register_model

    register_model("test/tiny_pack", packed)
    out = tmp_path / "out.wav"
    rc = main(["test/tiny_pack", str(short_lab), str(out)])
    assert rc == 0
    sr, x = wavfile.read(out)
    assert len(x) > sr  # at least 1 s of audio came out


def test_overwrite_phoneme_flags_cli(tmp_path, short_lab):
    from ensemble_svs_with_interactions_tpu.bin.overwrite_phoneme_flags import main

    out_dir = tmp_path / "flagged"
    rc = main([str(short_lab), "xx", str(out_dir)])
    assert rc == 0
    rewritten = hts.load(out_dir / short_lab.name)
    assert len(rewritten) == len(hts.load(short_lab))
    assert all("^xx_" in c for c in rewritten.contexts)
    # directory mode consumes every .lab in the input dir
    rc = main([str(out_dir), "yy", str(tmp_path / "flagged2")])
    assert rc == 0
    again = hts.load(tmp_path / "flagged2" / short_lab.name)
    assert all("^yy_" in c for c in again.contexts)


def test_merge_postfilters_cli(tmp_path):
    import yaml

    from ensemble_svs_with_interactions_tpu.bin.merge_postfilters import main
    from ensemble_svs_with_interactions_tpu.utils.config import (
        instantiate,
        load_config,
    )

    ss = [8, 1, 1, 3]
    pf_target = (
        "ensemble_svs_with_interactions_tpu.models.postfilters.Conv2dPostFilter"
    )

    def dump_phase(name, in_dim):
        cfg = {
            "netG": {
                "_target_": pf_target,
                "channels": 4,
                "kernel_size": [3, 3],
            }
        }
        cfg_path = tmp_path / f"{name}.yaml"
        cfg_path.write_text(yaml.safe_dump(cfg))
        model = instantiate(cfg["netG"])
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            np.zeros((1, 16, in_dim), np.float32),
        )
        ckpt_path = tmp_path / f"{name}.ckpt"
        ckpt_path.write_bytes(serialization.to_bytes({"params": variables["params"]}))
        return cfg_path, ckpt_path

    mgc_cfg, mgc_ckpt = dump_phase("mgc", 8 - 2)  # mgc_offset=2 passthrough
    bap_cfg, bap_ckpt = dump_phase("bap", 3)

    out_dir = tmp_path / "merged"
    rc = main([
        str(out_dir),
        "--mgc-config", str(mgc_cfg), "--mgc-ckpt", str(mgc_ckpt),
        "--bap-config", str(bap_cfg), "--bap-ckpt", str(bap_ckpt),
        "--stream-sizes", ",".join(map(str, ss)),
    ])
    assert rc == 0

    # the merged pack must instantiate and run as a MultistreamPostFilter
    merged_cfg = load_config(out_dir / "postfilter_model.yaml")
    merged = instantiate(merged_cfg.netG)
    tree = serialization.msgpack_restore(
        (out_dir / "postfilter_model.params").read_bytes()
    )
    x = np.random.default_rng(0).normal(size=(1, 16, sum(ss))).astype(np.float32)
    out = merged.apply(
        {"params": tree["params"]},
        x,
        np.array([16]),
        method="inference",
        rngs={"noise": jax.random.PRNGKey(2)},
    )
    out = np.asarray(out)
    assert out.shape == x.shape
    # mgc energy dims (offset) + lf0 + vuv pass through unchanged
    np.testing.assert_allclose(out[..., :2], x[..., :2], atol=1e-6)
    np.testing.assert_allclose(out[..., 8:10], x[..., 8:10], atol=1e-6)
    # filtered regions actually changed
    assert np.abs(out[..., 2:8] - x[..., 2:8]).max() > 1e-5
    assert np.abs(out[..., 10:] - x[..., 10:]).max() > 1e-5


def test_visualize_vibrato_cli(tmp_path):
    pytest.importorskip("matplotlib")
    from ensemble_svs_with_interactions_tpu.bin.visualize_vibrato import main

    # 2 s tone at 220 Hz with 5.5 Hz vibrato, +-50 cents
    fs = 16000
    t = np.arange(2 * fs) / fs
    f0 = 220.0 * 2.0 ** (50.0 / 1200.0 * np.sin(2 * np.pi * 5.5 * t))
    phase = 2 * np.pi * np.cumsum(f0) / fs
    x = (0.5 * np.sin(phase) * 32767).astype(np.int16)
    wav_path = tmp_path / "vib.wav"
    wavfile.write(wav_path, fs, x)

    out_png = tmp_path / "vib.png"
    rc = main([str(wav_path), str(out_png), "--f0-floor", "120", "--f0-ceil", "700"])
    assert rc == 0
    assert out_png.exists() and out_png.stat().st_size > 0


def test_plot_metrics_cli(tmp_path):
    pytest.importorskip("matplotlib")
    from ensemble_svs_with_interactions_tpu.bin.plot_metrics import main

    exp = tmp_path / "exp_a"
    exp.mkdir()
    rows = [
        {"step": i, "train_no_dev/Loss": 1.0 / (i + 1), "dev/Loss": 1.2 / (i + 1)}
        for i in range(5)
    ]
    (exp / "metrics.jsonl").write_text("\n".join(json.dumps(r) for r in rows))
    out_png = tmp_path / "curves.png"
    rc = main([str(exp), "--metric", "Loss", "--out", str(out_png)])
    assert rc == 0
    assert out_png.exists() and out_png.stat().st_size > 0


def test_prepare_features_multitrack_vs_sync(tmp_path, monkeypatch):
    """The _sync CLI (and only it) forces note-time dumps — the reference
    split between prepare_features_multitrack.py and
    prepare_features_multitrack_sync.py:91-309."""
    from ensemble_svs_with_interactions_tpu.bin import (
        prepare_features_multitrack as mt,
    )
    from ensemble_svs_with_interactions_tpu.bin import (
        prepare_features_multitrack_sync as mt_sync,
    )

    captured = []
    monkeypatch.setattr(mt, "run", lambda config: captured.append(config))

    cfg = tmp_path / "prep.yaml"
    cfg.write_text("out_dir: %s\n" % tmp_path)

    assert mt.main([str(cfg)]) == 0
    assert not captured[-1].get("save_note_times", False)

    assert mt_sync.main([str(cfg)]) == 0
    assert captured[-1].get("save_note_times") is True

    # explicit override still reaches the shared runner
    assert mt.main([str(cfg), "save_note_times=true"]) == 0
    assert captured[-1].get("save_note_times") in (True, "true")
