"""UST (UTAU score) -> full-context label frontend (utaupy ust2hts
replacement, reference neutrino_compat/server.py:156-171)."""

from pathlib import Path

import numpy as np
import pytest

from ensemble_svs_with_interactions_tpu.frontend import merlin as fe
from ensemble_svs_with_interactions_tpu.frontend.ust import (
    clean_lyric,
    load_table,
    parse_ust,
    ust_to_labels,
)
from ensemble_svs_with_interactions_tpu.io import hts

from ensemble_svs_with_interactions_tpu.utils import packaged_question_path

HED = Path(packaged_question_path())

UST = """[#VERSION]
UST Version1.2
[#SETTING]
Tempo=120.00
Tracks=1
ProjectName=test
[#0000]
Length=480
Lyric=R
NoteNum=60
[#0001]
Length=480
Lyric=か
NoteNum=60
[#0002]
Length=240
Lyric=ー
NoteNum=62
[#0003]
Length=480
Lyric=a た
NoteNum=64
Tempo=!150
[#0004]
Length=480
Lyric=R
NoteNum=60
[#0005]
Length=240
Lyric=r
NoteNum=60
[#TRACKEND]
"""


def test_clean_lyric():
    assert clean_lyric("か") == "か"
    assert clean_lyric("a か") == "か"  # VCV
    assert clean_lyric("- か") == "か"  # CV prefix
    assert clean_lyric("かC4") == "か"  # voice-bank pitch suffix
    assert clean_lyric(" R ") == "R"


def test_parse_ust_timing_and_phonemes(tmp_path):
    p = tmp_path / "song.ust"
    p.write_text(UST, encoding="utf-8")
    notes = parse_ust(p)
    # rest, か, ー, た, rest(+merged r)
    assert len(notes) == 5
    assert [n.midi for n in notes] == [None, 60, 62, 64, None]
    # 480 ticks @120bpm = 0.5 s; contiguous, 5 ms aligned
    assert notes[0].duration == 5_000_000
    assert notes[1].start == 5_000_000
    assert notes[2].duration == 2_500_000  # 240 ticks
    # local tempo !150: 480 ticks = 0.4 s
    assert notes[3].duration == 4_000_000
    for a, b in zip(notes[:-1], notes[1:]):
        assert b.start == a.start + a.duration
        assert a.start % 50000 == 0
    # adjacent rests merged (R 480 ticks + r 240 ticks, both @150bpm)
    assert notes[4].duration == 4_000_000 + 2_000_000
    # phonemization: か -> k a; ー melisma continues the vowel; VCV "a た"
    assert notes[1].phonemes == ["k", "a"]
    assert notes[2].phonemes == ["a"]
    assert notes[3].phonemes == ["t", "a"]


def test_parse_ust_shift_jis(tmp_path):
    p = tmp_path / "sjis.ust"
    p.write_bytes(UST.encode("cp932"))
    notes = parse_ust(p)
    assert [n.midi for n in notes] == [None, 60, 62, 64, None]
    assert notes[1].phonemes == ["k", "a"]


def test_parse_ust_table_override(tmp_path):
    table_path = tmp_path / "kana2phonemes.table"
    table_path.write_text("か g a\n# comment\nた d a\n", encoding="utf-8")
    table = load_table(table_path)
    assert table["か"] == ["g", "a"]
    notes = parse_ust(UST, table=table_path)
    assert notes[1].phonemes == ["g", "a"]
    assert notes[3].phonemes == ["d", "a"]


def test_ust_to_labels_drives_the_featurizer():
    labels = ust_to_labels(UST)
    # 0.5 s padding on both sides + note phones; note times shared
    assert labels.start_times[0] == 0
    note_indices = hts.get_note_indices(labels)
    assert 3 <= len(note_indices) <= len(labels)
    if not HED.exists():
        pytest.skip("reference hed unavailable")
    binary_dict, numeric_dict = hts.load_question_set(HED)
    feats = fe.linguistic_features(labels, binary_dict, numeric_dict)
    assert feats.shape[1] == 82
    assert np.isfinite(feats).all()
    pitch_idx = hts.get_pitch_index(binary_dict, numeric_dict)
    midi = feats[:, pitch_idx]
    assert set(np.unique(midi[midi > 0])) == {60.0, 62.0, 64.0}


def test_neutrino_engine_ust_with_packed_table(tmp_path):
    """The engine picks up the pack's ENUNU kana2phonemes.table
    automatically (reference server.py:163-171) and synthesizes from
    a UST score end-to-end."""
    from tests.util import build_tiny_packed_model
    from ensemble_svs_with_interactions_tpu.neutrino import NEUTRINO

    model_dir = tmp_path / "model"
    model_dir.mkdir()
    build_tiny_packed_model(model_dir)
    (model_dir / "kana2phonemes.table").write_text(
        "か g a\n", encoding="utf-8"
    )
    engine = NEUTRINO(model_dir)
    ust_path = tmp_path / "song.ust"
    ust_path.write_text(UST, encoding="utf-8")
    labels = engine.ust_to_labels(ust_path)
    assert any("-g+" in c for c in labels.contexts)  # table applied
    timing = engine.predict_timing(labels.copy())
    assert len(timing) == len(labels)
    wav, sr = engine.svs(labels)
    assert sr == engine.sample_rate
    assert len(wav) > sr // 2
    assert np.isfinite(np.asarray(wav, np.float64)).all()


def test_neutrino_cli_accepts_ust(tmp_path):
    from tests.util import build_tiny_packed_model
    from ensemble_svs_with_interactions_tpu.bin.neutrino import main

    model_dir = tmp_path / "model"
    model_dir.mkdir()
    build_tiny_packed_model(model_dir)
    ust_path = tmp_path / "song.ust"
    ust_path.write_text(UST, encoding="utf-8")
    timing = tmp_path / "timing.lab"
    rc = main([
        str(ust_path), str(timing), str(tmp_path / "o.f0"),
        str(tmp_path / "o.mgc"), str(tmp_path / "o.bap"), str(model_dir),
    ])
    assert rc == 0
    assert timing.exists() and (tmp_path / "o.f0").stat().st_size > 0


def test_neutrino_server_accepts_scores(tmp_path):
    """POST /timing with raw UST (and MusicXML) text instead of labels."""
    import json
    import threading
    import urllib.request
    from http.server import ThreadingHTTPServer

    from tests.util import build_tiny_packed_model
    from ensemble_svs_with_interactions_tpu.bin import neutrino_server as srv

    model_dir = tmp_path / "model"
    model_dir.mkdir()
    build_tiny_packed_model(model_dir)
    srv._MODEL_ROOT = tmp_path
    server = ThreadingHTTPServer(("127.0.0.1", 0), srv.Handler)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{port}"
        req = urllib.request.Request(
            f"{base}/timing",
            json.dumps({"model": "model", "ust": UST}).encode(),
            {"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            out = json.loads(r.read())
        assert out["name"] and len(out["timing_labels"]) > 0
        # the converted labels are stored: /acoustic works by name
        req = urllib.request.Request(
            f"{base}/acoustic",
            json.dumps({"model": "model", "name": out["name"]}).encode(),
            {"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            ac = json.loads(r.read())
        assert "f0" in ac
    finally:
        server.shutdown()
