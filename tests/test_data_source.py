"""Feature-extraction tests (pattern from reference tests/test_preprocess.py)."""

import numpy as np
import pytest

from ensemble_svs_with_interactions_tpu.data import (
    DurationFeatureSource,
    MusicalLinguisticSource,
    TimeLagFeatureSource,
    WORLDAcousticSource,
)
from ensemble_svs_with_interactions_tpu.data.data_source import logmelfilterbank

from tests.util import HED


@pytest.fixture
def utt_list(tmp_path, fixture_data_dir):
    p = tmp_path / "utt_list.txt"
    p.write_text("nitech_jp_song070_f001_004\n")
    return p


def test_musical_linguistic_source(utt_list, fixture_data_dir):
    src = MusicalLinguisticSource(
        utt_list, str(fixture_data_dir), HED, add_frame_features=False
    )
    files = src.collect_files()
    assert len(files) == 1
    feats = src.collect_features(files[0])
    assert feats.shape[1] == 82
    # pitch columns interpolated to log-Hz (no negative placeholder left)
    assert (feats[:, 50:53] > 3).all()  # log(30 Hz) ~ 3.4


def test_duration_source(utt_list, fixture_data_dir):
    src = DurationFeatureSource(utt_list, str(fixture_data_dir))
    feats = src.collect_features(src.collect_files()[0])
    assert feats.shape[1] == 1
    assert (feats > 0).all()


def test_timelag_source(utt_list, fixture_data_dir):
    src = TimeLagFeatureSource(
        utt_list, str(fixture_data_dir), str(fixture_data_dir)
    )
    score, align = src.collect_files()
    lag = src.collect_features(score[0], align[0])
    # same file -> zero lag
    assert np.allclose(lag, 0.0)


@pytest.mark.parametrize("relative_f0", [False, True])
def test_world_acoustic_source(utt_list, fixture_data_dir, relative_f0):
    src = WORLDAcousticSource(
        utt_list,
        str(fixture_data_dir),
        str(fixture_data_dir),
        HED,
        f0_extractor="dio",
        sample_rate=24000,
        mgc_order=24,
        relative_f0=relative_f0,
        use_world_codec=True,
    )
    wavs, labs = src.collect_files()
    features, wave, pf_features = src.collect_features(wavs[0], labs[0])
    # streams: mgc 25*3 + lf0 3 + vuv 1 + bap 3*3 = 88
    assert features.shape[1] == 25 * 3 + 3 + 1 + 3 * 3
    assert np.isfinite(features).all()
    assert len(wave) == len(features) * 120  # 5 ms at 24 kHz
    assert pf_features.shape[0] == features.shape[0]
    vuv = features[:, 25 * 3 + 3]
    assert set(np.unique(vuv)) <= {0.0, 1.0}
    assert 0.1 < vuv.mean() < 0.95  # some voiced and some unvoiced
    if relative_f0:
        difflf0 = features[:, 25 * 3]
        assert np.abs(difflf0).max() <= np.log(2.0) + 1e-6


def test_logmelfilterbank():
    rng = np.random.default_rng(0)
    x = rng.normal(size=24000)
    mel = logmelfilterbank(x, 24000, num_mels=80)
    assert mel.shape[1] == 80
    assert np.isfinite(mel).all()


def test_world_acoustic_source_parselmouth_mode(utt_list, fixture_data_dir):
    """The parselmouth-style extractor (praat AC + score-informed range,
    reference data_source.py:313-338) needs explicit floor/ceil and
    produces a well-formed feature matrix."""
    src = WORLDAcousticSource(
        utt_list,
        str(fixture_data_dir),
        str(fixture_data_dir),
        HED,
        f0_extractor="parselmouth",
        f0_floor=120,
        f0_ceil=700,
        sample_rate=24000,
        mgc_order=24,
        relative_f0=False,
        use_world_codec=True,
    )
    wavs, labs = src.collect_files()
    features, wave, _ = src.collect_features(wavs[0], labs[0])
    assert np.isfinite(features).all()
    vuv = features[:, 25 * 3 + 3]
    assert 0.1 < vuv.mean() < 0.95

    # the explicit-range requirement is enforced
    import pytest as _pytest

    bad = WORLDAcousticSource(
        utt_list, str(fixture_data_dir), str(fixture_data_dir), HED,
        f0_extractor="parselmouth", sample_rate=24000, mgc_order=24,
        f0_floor=None, f0_ceil=None,
    )
    with _pytest.raises(AssertionError):
        bad.collect_features(wavs[0], labs[0])


def test_normalize_subphone_features():
    """YAML `none` arrives as the string "none"; all spellings of "no
    subphone features" canonicalize to None and size 0."""
    from ensemble_svs_with_interactions_tpu.frontend.merlin import (
        get_frame_feature_size,
        normalize_subphone_features,
    )

    for v in (None, "none", "None", "NULL", ""):
        assert normalize_subphone_features(v) is None
        assert get_frame_feature_size(v) == 0
    assert normalize_subphone_features("coarse_coding") == "coarse_coding"
    assert get_frame_feature_size("coarse_coding") == 4


def test_worldacousticsource_accepts_subphone_features(tmp_path):
    """acoustic.params may carry subphone_features (the canonical home
    run_recipe packs from); splatting params into WORLDAcousticSource
    must not raise."""
    from ensemble_svs_with_interactions_tpu.data.data_source import (
        WORLDAcousticSource,
    )

    src = WORLDAcousticSource(
        utt_list=str(tmp_path / "nonexistent.list"),
        wav_root=str(tmp_path),
        label_root=str(tmp_path),
        question_path=HED,
        subphone_features="none",
        res_type="kaiser_best",
    )
    assert src.sample_rate == 48000
