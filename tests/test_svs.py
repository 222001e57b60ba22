"""End-to-end SPSVS test: pack tiny random models, run full svs() on real
reference labels (pattern from reference tests/test_svs.py, but offline —
no pretrained download needed)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ensemble_svs_with_interactions_tpu import gen
from ensemble_svs_with_interactions_tpu.io import hts
from ensemble_svs_with_interactions_tpu.svs import SPSVS
from ensemble_svs_with_interactions_tpu.utils.config import instantiate
from ensemble_svs_with_interactions_tpu.utils.packing import pack_model
from tests.util import HED, NIT_LAB
from ensemble_svs_with_interactions_tpu.utils.scalers import (
    MinMaxScaler,
    StandardScaler,
)

SR = 24000
MGC_DIM, BAP_DIM = 8, 3  # 24 kHz -> 3 aperiodicity bands
STREAM_SIZES = [MGC_DIM * 3, 3, 1, BAP_DIM * 3]
HAS_DYN = [True, True, False, True]
OUT_DIM = sum(STREAM_SIZES)  # 37
STATIC_DIM = MGC_DIM + 1 + 1 + BAP_DIM  # 13


def _identity_minmax(dim):
    return MinMaxScaler(np.zeros(dim), np.ones(dim))


def _out_scaler(dim, lf0_slice):
    mean = np.zeros(dim)
    scale = np.ones(dim) * 0.1
    # plausible lf0 statistics so exp() stays sane
    mean[lf0_slice] = np.log(220.0)
    var = scale**2
    return StandardScaler(mean, var, scale)


@pytest.fixture(scope="module")
def packed_model_dir(tmp_path_factory):
    hed = HED

    out = tmp_path_factory.mktemp("packed_model")
    key = jax.random.PRNGKey(0)

    def init_model(cfg, in_dim):
        module = instantiate(cfg["netG"])
        x = jnp.zeros((1, 8, in_dim))
        variables = module.init(
            {"params": key, "dropout": jax.random.PRNGKey(1)}, x, jnp.asarray([8])
        )
        return module, variables

    timelag_cfg = {
        "netG": {
            "_target_": "ensemble_svs_with_interactions_tpu.models.MDN",
            "in_dim": 82,
            "hidden_dim": 8,
            "out_dim": 1,
            "num_gaussians": 2,
        },
        "stream_sizes": [1],
        "has_dynamic_features": [False],
        "num_windows": 1,
    }
    duration_cfg = {
        "netG": {
            "_target_": "ensemble_svs_with_interactions_tpu.models.MDN",
            "in_dim": 82,
            "hidden_dim": 8,
            "out_dim": 1,
            "num_gaussians": 2,
        },
        "stream_sizes": [1],
        "has_dynamic_features": [False],
        "num_windows": 1,
    }
    acoustic_cfg = {
        "netG": {
            "_target_": "ensemble_svs_with_interactions_tpu.models.FFConvLSTM",
            "in_dim": 86,
            "ff_hidden_dim": 8,
            "conv_hidden_dim": 8,
            "lstm_hidden_dim": 4,
            "out_dim": OUT_DIM,
        },
        "stream_sizes": STREAM_SIZES,
        "has_dynamic_features": HAS_DYN,
        "num_windows": 3,
    }

    _, tl_vars = init_model(timelag_cfg, 82)
    _, du_vars = init_model(duration_cfg, 82)
    _, ac_vars = init_model(acoustic_cfg, 86)

    # duration out scaler must yield positive durations: mean ~10 frames
    dur_out = StandardScaler(np.array([10.0]), np.array([4.0]), np.array([2.0]))
    tl_out = StandardScaler(np.array([0.0]), np.array([4.0]), np.array([2.0]))
    lf0_slice = slice(MGC_DIM * 3, MGC_DIM * 3 + 1)
    ac_out = _out_scaler(OUT_DIM, lf0_slice)

    pack_model(
        out,
        {
            "sample_rate": SR,
            "frame_period": 5,
            "feature_type": "world",
            "use_world_codec": True,
            "relative_f0": False,
        },
        hed,
        {
            "timelag": {
                "model_config": timelag_cfg,
                "variables": tl_vars,
                "in_scaler": _identity_minmax(82),
                "out_scaler": tl_out,
            },
            "duration": {
                "model_config": duration_cfg,
                "variables": du_vars,
                "in_scaler": _identity_minmax(82),
                "out_scaler": dur_out,
            },
            "acoustic": {
                "model_config": acoustic_cfg,
                "variables": ac_vars,
                "in_scaler": _identity_minmax(86),
                "out_scaler": ac_out,
            },
        },
    )
    return out


@pytest.fixture(scope="module")
def engine(packed_model_dir):
    return SPSVS(packed_model_dir, verbose=1)


@pytest.fixture
def short_labels():
    labels = hts.load(NIT_LAB)
    # use a ~7 second prefix to keep the test fast
    n = 0
    for i, e in enumerate(labels.end_times):
        if e > 7 * 1e7:
            n = i
            break
    return labels[: max(n, 10)]


def test_spsvs_svs_end_to_end(engine, short_labels):
    wav, sr = engine.svs(short_labels, vocoder_type="world")
    assert sr == SR
    assert wav.dtype == np.int16
    assert len(wav) > sr  # at least a second of audio
    assert np.isfinite(wav.astype(np.float64)).all()
    assert np.abs(wav.astype(np.int64)).max() > 0


def test_spsvs_predict_timing(engine, short_labels):
    duration_modified = engine.predict_timing(short_labels)
    assert len(duration_modified) == len(short_labels)
    # monotone non-decreasing, strictly positive durations
    durs = np.asarray(duration_modified.end_times) - np.asarray(
        duration_modified.start_times
    )
    assert (durs > 0).all()
    starts = duration_modified.start_times
    assert all(b >= a for a, b in zip(starts, starts[1:]))


def test_spsvs_stage_by_stage(engine, short_labels):
    duration_modified = engine.predict_timing(short_labels)
    acoustic = engine.predict_acoustic(duration_modified)
    assert acoustic.shape[1] == STATIC_DIM  # MLPG applied
    streams = engine.postprocess_acoustic(acoustic, duration_modified)
    mgc, lf0, vuv, bap = streams
    assert mgc.shape[1] == MGC_DIM
    assert lf0.shape[1] == 1
    assert bap.shape[1] == BAP_DIM
    assert (bap <= 0).all()  # clipped to [-60, 0]
    wav = engine.predict_waveform(streams, vocoder_type="world")
    hop = SR * 5 // 1000
    assert len(wav) == len(mgc) * hop


def test_postprocess_duration_mdn_fallback():
    """Negative variance-scaled durations must fall back to uniform scaling."""
    labels = hts.HTSLabels()
    shift = 50000
    for i, ph in enumerate(["a", "b", "c"]):
        labels.append((i * 10 * shift, (i + 1) * 10 * shift, ph), strict=False)
    mu = np.array([[5.0], [100.0], [5.0]])  # middle phone absurdly long
    sigma_sq = np.array([[100.0], [0.01], [100.0]])
    lag = np.zeros((3, 1))
    out, d_norms = gen.postprocess_duration(labels, (mu, sigma_sq), lag)
    durs = (
        np.asarray(out.end_times) - np.asarray(out.start_times)
    ) // shift
    assert (durs > 0).all()


def test_svs_with_packed_neural_vocoder(tmp_path):
    """Pack a tiny uSFGAN vocoder next to the SVS models; SPSVS must load
    it and synthesize with vocoder_type='auto' -> 'usfgan'."""
    import jax
    import jax.numpy as jnp

    from ensemble_svs_with_interactions_tpu.utils.config import instantiate, _wrap
    from ensemble_svs_with_interactions_tpu.utils.packing import save_model_phase
    from tests.util import build_tiny_packed_model

    model_dir = tmp_path / "packed"
    build_tiny_packed_model(model_dir, sr=24000, mgc_dim=8, bap_dim=3)

    # frame_period=5ms @ 24kHz -> hop 120 = 4*5*6 upsampling
    voc_cfg = {
        "netG": {
            "_target_": "ensemble_svs_with_interactions_tpu.models.vocoders.USFGANGenerator",
            "in_channels": 1,
            "aux_channels": 8 + 3,  # mgc + bap
            "residual_channels": 4,
            "gate_channels": 8,
            "skip_channels": 4,
            "aux_context_window": 0,
            "source_network_params": {
                "blockA": 1, "cycleA": 1, "blockF": 0, "cycleF": 0,
                "cascade_mode": 0,
            },
            "filter_network_params": {
                "blockA": 0, "cycleA": 0, "blockF": 1, "cycleF": 1,
                "cascade_mode": 0,
            },
            "upsample_params": {"upsample_scales": [4, 5, 6]},
        },
        "signal_types": ["sine"],
    }
    module = instantiate(_wrap(voc_cfg["netG"]))
    Tf, up = 4, 120
    variables = module.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, Tf * up, 1)),
        jnp.zeros((1, Tf, 11)),
        jnp.ones((1, Tf * up)),
    )
    save_model_phase(model_dir, "vocoder", voc_cfg, variables)

    engine = SPSVS(model_dir)
    assert engine.vocoder is not None
    assert engine.default_vocoder_type == "usfgan"
    labels = hts.load(NIT_LAB)[:12]
    wav, sr = engine.svs(labels, vocoder_type="auto")
    assert sr == 24000
    assert len(wav) > 1000
    assert np.isfinite(np.asarray(wav, dtype=np.float64)).all()


def test_svs_merlin_postfilter(engine, short_labels):
    """post_filter_type='merlin' sharpens formants while preserving
    spectral energy (0th-coef compensation)."""
    wav, sr = engine.svs(short_labels, post_filter_type="merlin")
    assert len(wav) > 1000
    assert np.isfinite(np.asarray(wav, dtype=np.float64)).all()


def test_spsvs_timing_api_parity(engine, short_labels):
    """Standalone predict_timelag/predict_duration/postprocess_duration
    (reference svs.py:318,349,378) compose into modified labels."""
    lag100, lag = engine.predict_timelag(short_labels)
    assert lag.shape[1] == 1
    dur = engine.predict_duration(short_labels)
    mu = dur[0] if isinstance(dur, tuple) else dur
    assert len(mu) == len(short_labels)
    mod = engine.postprocess_duration(short_labels, dur, lag100)
    assert len(mod) > 0
    assert "SPSVS(" in repr(engine)
    assert engine.set_device("tpu") is engine


def test_fill_silence_to_rest(engine, short_labels):
    """fill_silence_to_rest crossfades long rests toward the silence
    spectral estimate (reference gen.py:1480-1841)."""
    mod = engine.predict_timing(short_labels)
    ac = engine.predict_acoustic(mod)
    mgc_plain = engine.postprocess_acoustic(ac, mod)[0]
    mgc_fill = engine.postprocess_acoustic(ac, mod, fill_silence_to_rest=True)[0]
    changed = np.abs(mgc_plain - mgc_fill).mean(axis=1) > 1e-6
    assert changed.any()  # long rests exist in the fixture prefix
    assert not changed.all()  # voiced frames untouched
    # filled rest frames approach the silence estimate mgc0 = -23.3
    assert mgc_fill[:, 0].min() < -20.0


def test_gen_spsvs_static_features_truncates_both_sides():
    """Defensive length alignment must trim the acoustic streams too:
    labels shorter than acoustic features + force_fix_vuv previously
    raised IndexError in correct_vuv_by_phone (ragged mask)."""
    T, n = 20, 15
    stream_sizes = [4, 1, 1, 2]
    acoustic = np.random.default_rng(0).normal(size=(T, 8)).astype(np.float32)
    # raw frame features: col1 = C-VUV_Voiced flag (index >0: the
    # reference's correct_vuv_by_phone ignores a voiced flag at column 0),
    # col2 = pitch (unused with relative_f0=False)
    ling = np.zeros((n, 3), np.float32)
    ling[5:10, 1] = 1.0
    binary_dict = {0: ("dummy", None), 1: ("C-VUV_Voiced", None)}
    mgc, lf0, vuv, bap = gen.gen_spsvs_static_features(
        labels=None,
        acoustic_features=acoustic,
        binary_dict=binary_dict,
        numeric_dict={},
        stream_sizes=stream_sizes,
        has_dynamic_features=[False] * 4,
        pitch_idx=2,
        num_windows=1,
        relative_f0=False,
        force_fix_vuv=True,
        linguistic_features=ling,
    )
    assert len(mgc) == len(lf0) == len(vuv) == len(bap) == n
    assert np.all(vuv[5:10] == 1.0)  # voiced flag applied


def test_predict_waveform_neutrino_interpolates_lf0():
    """Neural vocoders receive the continuous (interpolated) lf0 contour,
    not lf0=0 (-> exp(0)=1 Hz excitation) at unvoiced frames
    (reference svs.py:950-952)."""
    from ensemble_svs_with_interactions_tpu.neutrino import NEUTRINO

    eng = object.__new__(NEUTRINO)
    captured = {}

    def fake_predict_waveform(streams, vocoder_type="world"):
        captured["streams"] = streams
        return np.zeros(100, np.float32)

    eng.predict_waveform = fake_predict_waveform
    eng.postprocess_waveform = lambda w: w
    T = 10
    f0 = np.zeros((T, 1))
    f0[3:7, 0] = 220.0
    eng.predict_waveform_neutrino(
        f0, np.zeros((T, 4)), np.zeros((T, 1)), vocoder_type="usfgan"
    )
    mgc_s, lf0_s, vuv_s, bap_s = captured["streams"]
    np.testing.assert_allclose(lf0_s[3:7, 0], np.log(220.0), atol=1e-6)
    # unvoiced head/tail carry the interpolated contour, not zeros
    np.testing.assert_allclose(lf0_s[:3, 0], np.log(220.0), atol=1e-6)
    np.testing.assert_allclose(lf0_s[7:, 0], np.log(220.0), atol=1e-6)
    assert vuv_s[0, 0] == 0 and vuv_s[3, 0] == 1


def test_postprocess_duration_rounds_off_grid_labels():
    """Labels with times off the 5 ms grid: note lengths must come from
    rounded times (the reference rounds in place during predict_*; the
    step-by-step API here keeps caller labels untouched)."""
    labels = hts.HTSLabels()
    shift = 50000
    # off-grid by 20000 (0.4 frames)
    for i, ph in enumerate(["a", "b", "c"]):
        s = i * 10 * shift + (20000 if i else 0)
        e = (i + 1) * 10 * shift + 20000
        labels.append((s, e, ph), strict=False)
    before = (list(labels.start_times), list(labels.end_times))
    durations = np.array([[10.0], [10.0], [10.0]])
    lag = np.zeros((3, 1))
    out, _ = gen.postprocess_duration(labels, durations, lag)
    # caller labels are NOT mutated
    assert (list(labels.start_times), list(labels.end_times)) == before
    # all output times land on the frame grid
    for t in list(out.start_times) + list(out.end_times):
        assert t % shift == 0, t
    # identical result as pre-rounded labels
    rounded = labels.copy()
    rounded.frame_shift = shift
    rounded.round_()
    out2, _ = gen.postprocess_duration(rounded, durations, lag)
    assert list(out.end_times) == list(out2.end_times)


def test_packed_config_timing_plumbing(tmp_path):
    """SPSVS reads timelag.allowed_range{,_rest} and log_f0_conditioning
    from the packed config (reference svs.py:338-341)."""
    from tests.util import build_tiny_packed_model
    import yaml

    model_dir = tmp_path / "packed"
    build_tiny_packed_model(model_dir, sr=24000)
    cfg_path = model_dir / "config.yaml"
    cfg = yaml.safe_load(cfg_path.read_text())
    cfg["timelag"] = {"allowed_range": [-3, 3], "allowed_range_rest": [-7, 7]}
    cfg["log_f0_conditioning"] = True
    cfg_path.write_text(yaml.safe_dump(cfg))
    eng = SPSVS(model_dir)
    assert eng._timelag_ranges() == ((-3, 3), (-7, 7))
    assert eng._log_f0_conditioning() is True

    captured = {}
    orig = gen.predict_timelag

    def spy(*args, **kw):
        captured.update(kw)
        return orig(*args, **kw)

    gen.predict_timelag = spy
    try:
        labels = hts.HTSLabels()
        shift = 50000
        for i, ph in enumerate(["pau", "a", "pau"]):
            labels.append(
                (i * 20 * shift, (i + 1) * 20 * shift, f"x^x-{ph}+x=x/A:x"),
                strict=False,
            )
        eng.predict_timelag(labels)
    finally:
        gen.predict_timelag = orig
    assert captured["allowed_range"] == (-3, 3)
    assert captured["allowed_range_rest"] == (-7, 7)


def test_svs_rejects_unknown_types(tmp_path):
    from tests.util import build_tiny_packed_model

    model_dir = tmp_path / "packed"
    build_tiny_packed_model(model_dir, sr=24000)
    eng = SPSVS(model_dir)
    with pytest.raises(ValueError, match="Unknown vocoder type"):
        eng.svs(hts.HTSLabels(), vocoder_type="wrld")
    with pytest.raises(ValueError, match="Unknown post-filter type"):
        eng.svs(hts.HTSLabels(), post_filter_type="GV")


def test_gen_spsvs_static_features_relative_f0():
    """relative_f0=True adds the predicted lf0 DIFFERENCE back onto the
    score-derived log-F0 (reference gen.py:1942-1959): with a constant
    midi A4 score and diff_lf0=0.1, the reconstructed lf0 must be
    log(440)+0.1 on voiced frames."""
    T = 12
    diff = 0.1
    acoustic = np.zeros((T, 5), np.float32)
    acoustic[:, 2] = diff  # lf0 stream carries the residual
    acoustic[:, 3] = 1.0  # fully voiced
    ling = np.zeros((T, 2), np.float32)
    ling[:, 1] = 69.0  # midi A4 = 440 Hz
    mgc, lf0, vuv, bap = gen.gen_spsvs_static_features(
        labels=None,
        acoustic_features=acoustic,
        binary_dict={},
        numeric_dict={},
        stream_sizes=[2, 1, 1, 1],
        has_dynamic_features=[False] * 4,
        pitch_idx=1,
        num_windows=1,
        relative_f0=True,
        force_fix_vuv=False,
        linguistic_features=ling,
    )
    assert lf0.shape == (T, 1)
    assert np.allclose(lf0, np.log(440.0) + diff, atol=1e-5)
    # unvoiced frames drop to 0 Hz before the final interp
    acoustic[:6, 3] = 0.0
    _, lf0_uv, vuv_uv, _ = gen.gen_spsvs_static_features(
        labels=None,
        acoustic_features=acoustic,
        binary_dict={},
        numeric_dict={},
        stream_sizes=[2, 1, 1, 1],
        has_dynamic_features=[False] * 4,
        pitch_idx=1,
        num_windows=1,
        relative_f0=True,
        force_fix_vuv=False,
        linguistic_features=ling,
    )
    assert np.all(vuv_uv[:6] == 0.0)
    # interp1d keeps lf0 continuous through the unvoiced region
    assert np.allclose(lf0_uv, np.log(440.0) + diff, atol=1e-5)


def test_gen_spsvs_static_features_vibrato_diff_stream():
    """5-stream layout: the 5th stream is an F0 vibrato DIFFERENCE in Hz,
    scaled by vibrato_scale and added after V/UV gating (reference
    gen.py:1978-1984 vib add-back)."""
    T = 10
    acoustic = np.zeros((T, 6), np.float32)
    acoustic[:, 2] = np.log(440.0)  # absolute lf0 (relative_f0=False)
    acoustic[:, 3] = 1.0
    acoustic[:, 5] = 5.0  # vibrato diff in Hz
    ling = np.zeros((T, 2), np.float32)
    _, lf0, _, _ = gen.gen_spsvs_static_features(
        labels=None,
        acoustic_features=acoustic,
        binary_dict={},
        numeric_dict={},
        stream_sizes=[2, 1, 1, 1, 1],
        has_dynamic_features=[False] * 5,
        pitch_idx=1,
        num_windows=1,
        relative_f0=False,
        force_fix_vuv=False,
        vibrato_scale=2.0,
        linguistic_features=ling,
    )
    assert np.allclose(np.exp(lf0), 440.0 + 2.0 * 5.0, atol=1e-3)


def test_gen_spsvs_static_features_vibrato_sine_flags_gate():
    """6-stream layout: vibrato (m_a, m_f) sine re-synthesis is gated by
    the vib_flags stream — flags < 0.5 zero the parameters, leaving F0
    untouched (reference gen.py:1966-1977)."""
    T = 10
    acoustic = np.zeros((T, 8), np.float32)
    acoustic[:, 2] = np.log(440.0)
    acoustic[:, 3] = 1.0
    acoustic[:, 5] = 80.0  # m_a (extent, cents)
    acoustic[:, 6] = 5.0  # m_f (rate, Hz)
    acoustic[:, 7] = 0.0  # flags OFF everywhere
    ling = np.zeros((T, 2), np.float32)
    kw = dict(
        labels=None,
        binary_dict={},
        numeric_dict={},
        stream_sizes=[2, 1, 1, 1, 2, 1],
        has_dynamic_features=[False] * 6,
        pitch_idx=1,
        num_windows=1,
        relative_f0=False,
        force_fix_vuv=False,
        linguistic_features=ling,
    )
    _, lf0_off, _, _ = gen.gen_spsvs_static_features(
        acoustic_features=acoustic, **kw
    )
    assert np.allclose(np.exp(lf0_off), 440.0, atol=1e-3)
    acoustic_on = acoustic.copy()
    acoustic_on[:, 7] = 1.0  # flags ON -> sinusoidal modulation applied
    _, lf0_on, _, _ = gen.gen_spsvs_static_features(
        acoustic_features=acoustic_on, **kw
    )
    f0_on = np.exp(lf0_on).flatten()
    assert not np.allclose(f0_on, 440.0, atol=1e-3)
    # modulation stays within the clipped extent (<=150 cents) bound
    assert np.all(np.abs(1200 * np.log2(f0_on / 440.0)) <= 150 * 1.01)
