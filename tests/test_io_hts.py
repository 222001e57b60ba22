"""Tests for HTS label I/O and question sets (mirrors reference test_io.py)."""

import numpy as np
import pytest

from ensemble_svs_with_interactions_tpu.frontend import merlin
from ensemble_svs_with_interactions_tpu.io import hts
from tests.util import HED, NIT_LAB


@pytest.fixture
def dev_hed_path():
    import pathlib

    return pathlib.Path(HED)


@pytest.fixture
def fixture_labels():
    return hts.load(NIT_LAB)


def test_load_labels(fixture_labels):
    labels = fixture_labels
    assert len(labels) > 10
    assert labels.start_times[0] == 0
    assert labels.is_full_context()
    # monotone non-decreasing start times
    assert all(
        s2 >= s1 for s1, s2 in zip(labels.start_times, labels.start_times[1:])
    )
    mono = hts.full_to_mono(labels)
    assert mono.contexts[0] == "pau"


def test_question_set_dims(dev_hed_path):
    binary_dict, numeric_dict = hts.load_question_set(dev_hed_path)
    # jp_dev_latest.hed: 86-dim acoustic / 82-dim timelag-duration input,
    # in_rest_idx=0, in_lf0_idx=51 (hed header comment)
    assert len(binary_dict) + len(numeric_dict) == 82
    assert hts.get_pitch_index(binary_dict, numeric_dict) == 51
    pitch_indices = hts.get_pitch_indices(binary_dict, numeric_dict)
    assert pitch_indices == [50, 51, 52]
    assert binary_dict[0][0] == "C-Phone_Muon"


def test_linguistic_features_phone_level(dev_hed_path, fixture_labels):
    binary_dict, numeric_dict = hts.load_question_set(dev_hed_path)
    feats = merlin.linguistic_features(fixture_labels, binary_dict, numeric_dict)
    assert feats.shape == (len(fixture_labels), 82)
    # first label is a pau -> rest flag set
    assert feats[0, 0] == 1.0
    # binary features are {0,1}
    assert set(np.unique(feats[:, : len(binary_dict)])) <= {0.0, 1.0}
    # pitch (E column, idx 51) of second label should be midi(F4) = 65
    assert feats[1, 51] == 65.0


def test_linguistic_features_frame_level(dev_hed_path, fixture_labels):
    binary_dict, numeric_dict = hts.load_question_set(dev_hed_path)
    feats = merlin.linguistic_features(
        fixture_labels,
        binary_dict,
        numeric_dict,
        add_frame_features=True,
        subphone_features="coarse_coding",
    )
    assert feats.shape == (fixture_labels.num_frames(), 86)
    # coarse coding features in [0, 1]
    cc = feats[:, 82:85]
    assert cc.min() >= 0.0 and cc.max() <= 1.0
    # frame count feature is positive
    assert (feats[:, 85] > 0).all()


def test_duration_features(fixture_labels):
    durs = merlin.duration_features(fixture_labels)
    assert durs.shape == (len(fixture_labels), 1)
    assert (durs > 0).all()
    assert durs.sum() == fixture_labels.num_frames()


def test_note_indices(fixture_labels):
    idx = hts.get_note_indices(fixture_labels)
    assert idx[0] == 0
    assert len(idx) <= len(fixture_labels)
    assert sorted(idx) == idx


def test_note_name_to_midi():
    assert hts.note_name_to_midi("A4") == 69
    assert hts.note_name_to_midi("C4") == 60
    assert hts.note_name_to_midi("Ab4") == 68
    assert hts.note_name_to_midi("C#3") == 49
    assert hts.note_name_to_midi("xx") == -1


def test_segment_labels(fixture_labels):
    segments = hts.segment_labels(
        fixture_labels, silence_threshold=0.1, min_duration=1.0
    )
    assert len(segments) >= 1
    for seg in segments:
        assert seg.start_times[0] == 0
        assert len(seg) > 0
    # total phone count is preserved or reduced only by boundary bookkeeping
    total = sum(len(s) for s in segments)
    assert total >= len(fixture_labels) - 2


def test_merge_sil():
    labels = hts.HTSLabels()
    for i, ph in enumerate(["sil", "sil", "a", "sil"]):
        labels.append((i * 10, (i + 1) * 10, ph), strict=False)
    merged = hts.merge_sil(labels)
    assert len(merged) == 3
    assert merged.end_times[0] == 20


def test_label2phrases(fixture_labels):
    phrases = hts.label2phrases(fixture_labels)
    assert len(phrases) >= 2
    # phrases alternate silence / voiced
    sil_flags = [hts.is_silence_context(p.contexts[0]) for p in phrases]
    for a, b in zip(sil_flags, sil_flags[1:]):
        assert a != b


def test_phrases_str(fixture_labels):
    note_indices = hts.get_note_indices(fixture_labels)
    text = hts.label2phrases_str(fixture_labels, note_indices)
    lines = text.strip().split("\n")
    assert len(lines) >= 2
    for line in lines:
        cols = line.split(" ", 3)
        assert int(cols[0]) >= 0
        assert int(cols[2]) in (0, 1)


def test_roundtrip_save(tmp_path, fixture_labels):
    out = tmp_path / "x.lab"
    fixture_labels.save(out)
    loaded = hts.load(out)
    assert loaded.start_times == fixture_labels.start_times
    assert loaded.contexts == fixture_labels.contexts


# ---------------------------------------------------------------------------
# State-alignment (HMM) label support — the Merlin state-level modes the
# reference inherits via nnmnkwii (frontend contract completeness).
# ---------------------------------------------------------------------------


@pytest.fixture
def state_labels(fixture_labels):
    """Synthesize a 5-state alignment from the phone-level fixture."""
    out = hts.HTSLabels()
    for s, e, c in fixture_labels:
        # split each phone into 5 states on 50000-unit boundaries
        bounds = np.linspace(s, e, 6)
        bounds = (np.round(bounds / 50000) * 50000).astype(np.int64)
        bounds[0], bounds[-1] = s, e
        for k in range(5):
            if bounds[k + 1] > bounds[k]:
                out.append((bounds[k], bounds[k + 1], f"{c}[{k + 2}]"), strict=False)
    return out


def test_is_state_alignment(fixture_labels, state_labels):
    assert not fixture_labels.is_state_alignment()
    assert state_labels.is_state_alignment()


def test_state_alignment_full_features(dev_hed_path, fixture_labels, state_labels):
    binary_dict, numeric_dict = hts.load_question_set(dev_hed_path)
    feats = merlin.linguistic_features(
        state_labels,
        binary_dict,
        numeric_dict,
        add_frame_features=True,
        subphone_features="full",
    )
    assert feats.shape == (fixture_labels.num_frames(), 82 + 9)
    d = 82
    # fractions in (0, 1]
    for col in (d, d + 1, d + 7, d + 8):
        assert feats[:, col].min() > 0.0 and feats[:, col].max() <= 1.0 + 1e-6
    # state indices forward 1..5, backward 5..1, and they mirror
    assert set(np.unique(feats[:, d + 3])) <= set(np.arange(1.0, 6.0))
    np.testing.assert_allclose(feats[:, d + 3] + feats[:, d + 4], 6.0)
    # phone duration column consistent with the phone-level durations
    phone_durs = merlin.duration_features(fixture_labels)[:, 0]
    expanded = np.repeat(phone_durs, phone_durs.astype(int))
    np.testing.assert_allclose(feats[:, d + 5], expanded)
    # fraction-through-phone forward is increasing within each phone
    fwd = feats[:, d + 8]
    starts = np.concatenate([[0], np.cumsum(phone_durs.astype(int))[:-1]])
    for st, dur in zip(starts[:5], phone_durs[:5].astype(int)):
        seg = fwd[st : st + dur]
        assert (np.diff(seg) > 0).all()
        assert abs(seg[-1] - 1.0) < 1e-6
    # phone-context features match the phone-level extraction
    phone_feats = merlin.linguistic_features(fixture_labels, binary_dict, numeric_dict)
    np.testing.assert_allclose(feats[:, :82], np.repeat(phone_feats, phone_durs.astype(int), axis=0))


@pytest.mark.parametrize(
    "mode,ncols",
    [("state_only", 1), ("frame_only", 1), ("uniform_state", 2),
     ("minimal_frame", 2), ("coarse_coding", 4)],
)
def test_state_alignment_modes(dev_hed_path, fixture_labels, state_labels, mode, ncols):
    binary_dict, numeric_dict = hts.load_question_set(dev_hed_path)
    feats = merlin.linguistic_features(
        state_labels, binary_dict, numeric_dict,
        add_frame_features=True, subphone_features=mode,
    )
    assert feats.shape == (fixture_labels.num_frames(), 82 + ncols)
    if mode == "uniform_state":
        assert set(np.unique(feats[:, 83])) <= set(np.arange(1.0, 6.0))
    if mode == "frame_only":
        assert feats[:, 82].min() > 0 and feats[:, 82].max() <= 1.0 + 1e-6


def test_state_alignment_rows_without_frame_features(dev_hed_path, fixture_labels, state_labels):
    binary_dict, numeric_dict = hts.load_question_set(dev_hed_path)
    per_phone = merlin.linguistic_features(state_labels, binary_dict, numeric_dict)
    assert per_phone.shape == (len(fixture_labels), 82)
    per_state = merlin.linguistic_features(
        state_labels, binary_dict, numeric_dict, subphone_features="state_only"
    )
    assert per_state.shape == (len(state_labels), 82)
    # state-level duration features: one row per phone, 5 state columns
    durs = merlin.duration_features(state_labels)
    assert durs.shape[0] == len(fixture_labels)
    np.testing.assert_allclose(
        durs.sum(axis=1), merlin.duration_features(fixture_labels)[:, 0]
    )


def test_cqs_decimal_capture(tmp_path):
    """CQS with nnmnkwii's documented ([\\d.]+) decimal capture syntax."""
    hed = tmp_path / "q.hed"
    hed.write_text(
        'QS "sil" {*-sil+*}\n'
        'CQS "e5_tempo" {~([\\d.]+)!}\n'
    )
    binary_dict, numeric_dict = hts.load_question_set(hed)
    name, regex = numeric_dict[0]
    m = regex.search("x^y-a+b=c/E:xx]xx^0=4~120.5!1@8#24+xx")
    assert m is not None and m.group(1) == "120.5"
