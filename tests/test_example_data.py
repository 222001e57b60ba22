"""Tests for the packaged first-party example data — deliberately NOT
gated on the reference checkout (these must pass wherever the wheel is
installed)."""

from pathlib import Path

import numpy as np
import pytest

from ensemble_svs_with_interactions_tpu.frontend import merlin as fe
from ensemble_svs_with_interactions_tpu.frontend.musicxml import (
    musicxml_to_labels,
    parse_musicxml,
)
from ensemble_svs_with_interactions_tpu.io import hts

from ensemble_svs_with_interactions_tpu.utils import packaged_question_path

HED = Path(packaged_question_path())


def test_packaged_example_score():
    """The packaged first-party example score parses and featurizes
    without the reference checkout (reference ships _example_data/ and
    util.example_xml_file)."""
    from ensemble_svs_with_interactions_tpu.utils.misc import example_xml_file

    path = example_xml_file()
    notes = parse_musicxml(path)
    assert [n.lyric for n in notes if n.lyric] == list("さくらさいた")
    labels = musicxml_to_labels(path)
    assert len(labels) >= 10  # pau + phonemes + pau
    if HED.exists():
        binary_dict, numeric_dict = hts.load_question_set(HED)
        feats = fe.linguistic_features(labels, binary_dict, numeric_dict)
        assert feats.shape[0] == len(labels)
        assert np.isfinite(feats).all()


def test_packaged_example_ust_matches_musicxml():
    """The packaged example UST is the same six-note phrase as the
    MusicXML; both frontends must agree on lyrics, pitches and phones."""
    from ensemble_svs_with_interactions_tpu.frontend.ust import (
        parse_ust,
        ust_to_labels,
    )
    from ensemble_svs_with_interactions_tpu.utils.misc import (
        example_ust_file,
        example_xml_file,
    )

    ust_notes = parse_ust(example_ust_file())
    xml_notes = parse_musicxml(example_xml_file())
    assert [n.lyric for n in ust_notes if n.lyric not in ("", "R")] == list(
        "さくらさいた"
    )
    assert [n.midi for n in ust_notes if n.midi is not None] == [
        n.midi for n in xml_notes if n.midi is not None
    ]
    ust_labels = ust_to_labels(example_ust_file())
    xml_labels = musicxml_to_labels(example_xml_file())
    # same phone sequence through both frontends
    assert [c.split("-")[1].split("+")[0] for c in ust_labels.contexts] == [
        c.split("-")[1].split("+")[0] for c in xml_labels.contexts
    ]
