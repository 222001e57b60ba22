"""MusicXML -> full-context label frontend (pysinsy replacement,
reference svs.py:783-788, streamlit_demo/app.py:26)."""

from pathlib import Path

import numpy as np
import pytest

from ensemble_svs_with_interactions_tpu.frontend.musicxml import (
    g2p_ja,
    midi_to_name,
    musicxml_to_labels,
    parse_musicxml,
)
from ensemble_svs_with_interactions_tpu.frontend import merlin as fe
from ensemble_svs_with_interactions_tpu.io import hts

XML = Path("/root/reference/nnsvs/_example_data/haruga_kita.xml")
from ensemble_svs_with_interactions_tpu.utils import packaged_question_path

HED = Path(packaged_question_path())

pytestmark = pytest.mark.skipif(
    not XML.exists(), reason="reference example data unavailable"
)


def test_g2p_ja():
    assert g2p_ja("は") == ["h", "a"]
    assert g2p_ja("しゃ") == ["sh", "a"]
    assert g2p_ja("ん") == ["N"]
    assert g2p_ja("っ") == ["cl"]
    assert g2p_ja("きょ") == ["ky", "o"]
    assert g2p_ja("ハル") == ["h", "a", "r", "u"]  # katakana folds to hiragana
    assert g2p_ja("ー", prev_vowel="a") == ["a"]  # long vowel continues
    assert g2p_ja("ka") == ["k", "a"]  # romaji passthrough


def test_midi_to_name_roundtrip():
    for midi in (57, 60, 61, 69, 72):
        assert hts.note_name_to_midi(midi_to_name(midi)) == midi


def test_parse_musicxml_notes():
    notes = parse_musicxml(XML)
    assert len(notes) > 20
    voiced = [n for n in notes if n.midi is not None]
    assert len(voiced) > 15
    # timing is contiguous and frame-aligned
    for n in notes:
        assert n.duration > 0 and n.start % 50000 == 0
    for a, b in zip(notes[:-1], notes[1:]):
        assert b.start == a.start + a.duration
    # tempo and meter were picked up from the score
    assert voiced[0].tempo > 0
    assert voiced[0].beats in (2, 3, 4, 6)


def test_musicxml_to_labels_drives_the_featurizer():
    labels = musicxml_to_labels(XML)
    assert len(labels) > 40
    # score-label convention: all phones of a note share the note times
    note_indices = hts.get_note_indices(labels)
    assert 10 < len(note_indices) < len(labels)

    binary_dict, numeric_dict = hts.load_question_set(HED)
    feats = fe.linguistic_features(labels, binary_dict, numeric_dict)
    assert feats.shape[1] == 82
    assert np.isfinite(feats).all()
    pitch_idx = hts.get_pitch_index(binary_dict, numeric_dict)
    midi = feats[:, pitch_idx]
    assert (midi > 0).mean() > 0.5  # voiced notes carry score pitch
    assert 40 < midi[midi > 0].min() and midi[midi > 0].max() < 100

    frame_feats = fe.linguistic_features(
        labels, binary_dict, numeric_dict,
        add_frame_features=True, subphone_features="coarse_coding",
    )
    assert frame_feats.shape[1] == 86
    assert np.isfinite(frame_feats).all()
    # rest flag (in_rest_idx 0) fires on the leading silence
    assert frame_feats[0, 0] == 1.0

    # phrase structure: label2phrases finds the rest-separated phrases
    phrases = hts.label2phrases(labels)
    assert len(phrases) >= 1


def test_musicxml_end_to_end_synthesis(tmp_path):
    """A score drives the full packed-model pipeline to a waveform."""
    from tests.util import build_tiny_packed_model
    from ensemble_svs_with_interactions_tpu.svs import SPSVS

    model_dir = tmp_path / "model"
    model_dir.mkdir()
    build_tiny_packed_model(model_dir)
    engine = SPSVS(model_dir)
    labels = musicxml_to_labels(XML)
    # trim to the first ~6 seconds to keep the CPU run fast
    keep = [i for i, e in enumerate(labels.end_times) if e <= 6e7]
    labels = labels[: max(len(keep), 12)]
    wav, sr = engine.svs(labels)
    assert sr == engine.sample_rate
    assert len(wav) > sr  # at least a second of audio
    assert np.isfinite(np.asarray(wav, np.float64)).all()


def test_neutrino_accepts_musicxml(tmp_path):
    from tests.util import build_tiny_packed_model
    from ensemble_svs_with_interactions_tpu.neutrino import NEUTRINO

    model_dir = tmp_path / "model"
    model_dir.mkdir()
    build_tiny_packed_model(model_dir)
    engine = NEUTRINO(model_dir)
    labels = engine.musicxml_to_labels(XML)
    assert len(labels) > 40


def test_padding_silence_carries_key_signature(tmp_path):
    """Leading/trailing pau labels must carry the key number (e3) of the
    score — real Sinsy/NEUTRINO pau labels do — not fifths=0's key."""
    xml = tmp_path / "amajor.xml"
    xml.write_text(
        """<?xml version="1.0" encoding="UTF-8"?>
<score-partwise version="3.1">
  <part-list><score-part id="P1"><part-name>v</part-name></score-part></part-list>
  <part id="P1">
    <measure number="1">
      <attributes>
        <divisions>4</divisions>
        <key><fifths>3</fifths></key>
        <time><beats>4</beats><beat-type>4</beat-type></time>
      </attributes>
      <direction><sound tempo="120"/></direction>
      <note><pitch><step>A</step><octave>4</octave></pitch>
            <duration>8</duration><lyric><text>あ</text></lyric></note>
      <note><pitch><step>E</step><octave>4</octave></pitch>
            <duration>8</duration><lyric><text>か</text></lyric></note>
    </measure>
  </part>
</score-partwise>
"""
    )
    labels = musicxml_to_labels(xml)
    key = "^9="  # (7 * 3) % 12 == 9, A-major key number
    assert key in labels.contexts[0], labels.contexts[0]  # leading pau
    assert key in labels.contexts[-1], labels.contexts[-1]  # trailing pau
    assert all(key in c for c in labels.contexts)


@pytest.mark.parametrize(
    "name", ["get_over.xml", "song070_f00001_063.xml", "yuki.xml"]
)
def test_all_reference_example_scores_parse(name):
    """Every bundled reference example score (nnsvs/_example_data/) must
    survive the full parse -> labels -> linguistic-features path."""
    path = XML.parent / name
    if not path.exists():
        pytest.skip("reference example data unavailable")
    notes = parse_musicxml(path)
    assert len(notes) > 10
    labels = musicxml_to_labels(path)
    assert len(labels) > len(notes) // 2
    if HED.exists():
        binary_dict, numeric_dict = hts.load_question_set(HED)
        feats = fe.linguistic_features(labels, binary_dict, numeric_dict)
        assert feats.shape[0] == len(labels)
        assert np.isfinite(feats).all()
