"""Engine-level ensemble synthesis tests (CPU, tiny models).

Covers the two paths the headline benchmark exercises:
- single-track packs batched across N independent tracks
- multitrack (cross-conditioned) packs running the paper's pairwise
  pipeline (reference nnsvs/bin/synthesis_multitrack.py:30-289,
  nnsvs/svs.py:619-746)
plus segmented_synthesis (reference svs.py segment_labels path).
"""

import numpy as np
import pytest

from ensemble_svs_with_interactions_tpu.io import hts
from ensemble_svs_with_interactions_tpu.svs import SPSVS
from tests.util import (
    NIT_LAB,
    build_tiny_multitrack_packed_model,
    build_tiny_packed_model,
)

SR = 24000


@pytest.fixture
def short_labels():
    labels = hts.load(NIT_LAB)
    n = 0
    for i, e in enumerate(labels.end_times):
        if e > 7 * 1e7:
            n = i
            break
    return labels[: max(n, 10)]


@pytest.fixture(scope="module")
def mt_engine(tmp_path_factory):
    model_dir = tmp_path_factory.mktemp("packed_mt")
    build_tiny_multitrack_packed_model(model_dir, sr=SR)
    return SPSVS(model_dir, verbose=1)


@pytest.fixture(scope="module")
def st_engine(tmp_path_factory):
    model_dir = tmp_path_factory.mktemp("packed_st")
    build_tiny_packed_model(model_dir, sr=SR)
    return SPSVS(model_dir, verbose=1)


def test_multitrack_pack_detection(mt_engine, st_engine):
    assert mt_engine.is_multitrack
    assert mt_engine.spk_list == ["spk0", "spk1"]
    assert not st_engine.is_multitrack


def test_svs_ensemble_multitrack(mt_engine, short_labels):
    """2-singer ensemble through a packed multitrack model: each track is
    the main track of one cross-conditioned pair."""
    labels_list = [short_labels.copy(), short_labels.copy()]
    wavs, sr = mt_engine.svs_ensemble(labels_list, spk_ids=[0, 1])
    assert sr == SR
    assert len(wavs) == 2
    for wav in wavs:
        assert wav.dtype == np.int16
        assert len(wav) > sr
        assert np.isfinite(wav.astype(np.float64)).all()
        assert np.abs(wav.astype(np.int64)).max() > 0
    # stage timings recorded for the benchmark JSON (dispatch-labelled:
    # the device wait lands in whichever later stage first blocks)
    assert set(mt_engine.last_stage_times) >= {
        "timing_feats", "acoustic_dispatch", "postproc_dispatch", "vocoder",
    }


def test_svs_ensemble_multitrack_explicit_pairs(mt_engine, short_labels):
    labels_list = [short_labels.copy(), short_labels.copy()]
    wavs, _ = mt_engine.svs_ensemble(
        labels_list, spk_ids=[1, 0], pairs=[1, 0]
    )
    assert len(wavs) == 2


def test_svs_raises_on_multitrack_pack(mt_engine, short_labels):
    with pytest.raises(ValueError, match="multitrack"):
        mt_engine.svs(short_labels)


def test_svs_ensemble_singletrack(st_engine, short_labels):
    """Ensemble of 3 independent tracks batches through the single-track
    acoustic model + fused WORLD vocoder."""
    wavs, sr = st_engine.svs_ensemble([short_labels.copy() for _ in range(3)])
    assert sr == SR
    assert len(wavs) == 3
    for wav in wavs:
        assert wav.dtype == np.int16
        assert np.abs(wav.astype(np.int64)).max() > 0
    # identical inputs -> identical acoustic predictions (batching must not
    # leak between rows; the vocoder itself draws per-row aperiodicity
    # noise, so waveforms are compared upstream of it)
    assert len(wavs[0]) == len(wavs[1]) == len(wavs[2])
    mod = st_engine.predict_timing(short_labels.copy())
    feats, _raw = st_engine._frame_features([mod.copy(), mod.copy()])
    preds = st_engine.acoustic_model.inference_batch(feats)
    np.testing.assert_allclose(np.asarray(preds[0]), np.asarray(preds[1]))


def test_svs_ensemble_float_dtype(st_engine, short_labels):
    wavs, _ = st_engine.svs_ensemble(
        [short_labels.copy(), short_labels.copy()], dtype=np.float32
    )
    assert all(w.dtype != np.int16 for w in wavs)


def test_svs_ensemble_mesh_sharded(mt_engine, short_labels, monkeypatch):
    """SPMD inference: the pairwise ensemble sharded over a 2-device mesh
    (batch axis split, parameters replicated) must reproduce the
    single-device render.  No reference analogue — torch inference there
    is single-GPU (nnsvs/svs.py:304)."""
    from ensemble_svs_with_interactions_tpu.parallel import make_mesh

    labels_list = [short_labels.copy(), short_labels.copy()]
    # compare on the host postprocess path (mesh mode always uses it)
    monkeypatch.setenv("ESVS_DISABLE_FUSED_POST", "1")
    wavs_ref, _ = mt_engine.svs_ensemble(labels_list, spk_ids=[0, 1])
    try:
        mt_engine.set_mesh(make_mesh(2))
        wavs_mesh, sr = mt_engine.svs_ensemble(labels_list, spk_ids=[0, 1])
    finally:
        mt_engine.set_mesh(None)
    assert sr == SR
    assert len(wavs_mesh) == 2
    for wm, wr in zip(wavs_mesh, wavs_ref):
        assert len(wm) == len(wr)
        a = wm.astype(np.float64) / 32767.0
        b = wr.astype(np.float64) / 32767.0
        assert np.sqrt(((a - b) ** 2).mean()) < 1e-4
        assert np.corrcoef(a, b)[0, 1] > 0.9999


def test_svs_ensemble_mesh_fused(mt_engine, short_labels):
    """Mesh mode runs the FUSED device postprocess+vocoder path too: with
    2 tracks on 2 devices both runs use a single [2] vocoder chunk (same
    noise keys), so the sharded render must match the single-device one."""
    from ensemble_svs_with_interactions_tpu.parallel import make_mesh

    labels_list = [short_labels.copy(), short_labels.copy()]
    wavs_ref, _ = mt_engine.svs_ensemble(labels_list, spk_ids=[0, 1])
    assert mt_engine.last_stage_times  # fused path ran
    try:
        mt_engine.set_mesh(make_mesh(2))
        assert mt_engine._fused_post_ok("world", "gv", [100, 100])
        wavs_mesh, _ = mt_engine.svs_ensemble(labels_list, spk_ids=[0, 1])
    finally:
        mt_engine.set_mesh(None)
    for wm, wr in zip(wavs_mesh, wavs_ref):
        assert len(wm) == len(wr)
        a = wm.astype(np.float64) / 32767.0
        b = wr.astype(np.float64) / 32767.0
        assert np.sqrt(((a - b) ** 2).mean()) < 1e-4
        assert np.corrcoef(a, b)[0, 1] > 0.9999


def test_fused_postprocess_mesh_padding_streams(tmp_path, short_labels):
    """3 tracks on a 2-device mesh pad the fused postprocess batch to 4
    rows; the real rows' (mgc, lf0, vuv, bap) streams must be unchanged
    (the vocoder's noise draw depends on batch shape, so parity is
    checked at the deterministic stream level).  Uses a static-stream
    pack — the fused path's supported configuration."""
    from ensemble_svs_with_interactions_tpu.parallel import make_mesh

    model_dir = tmp_path / "packed_static"
    build_tiny_packed_model(model_dir, sr=SR, dynamic_features=False)
    engine = SPSVS(model_dir, verbose=1)

    mod = engine.predict_timing(short_labels.copy())
    feats, raw = engine._frame_features([mod.copy() for _ in range(3)])

    def _streams():
        out_dev, lengths = engine.acoustic_model.inference_batch(
            feats, device_out=True
        )
        if isinstance(out_dev, tuple):
            out_dev = out_dev[0]
        streams = engine._fused_postprocess(out_dev, lengths, raw, "gv")
        return [np.asarray(s) for s in streams]

    ref = _streams()
    try:
        engine.set_mesh(make_mesh(2))
        mesh_streams = _streams()
    finally:
        engine.set_mesh(None)
    assert mesh_streams[0].shape[0] == 4  # padded to the mesh size
    for sm, sr in zip(mesh_streams, ref):
        np.testing.assert_allclose(sm[:3], sr, rtol=1e-4, atol=1e-5)


def test_svs_ensemble_mesh_padding(st_engine, short_labels, monkeypatch):
    """3 tracks on a 2-device mesh: the batch pads to 4 rows to shard
    evenly; padding rows must not leak into the real outputs."""
    from ensemble_svs_with_interactions_tpu.parallel import make_mesh

    labels_list = [short_labels.copy() for _ in range(3)]
    monkeypatch.setenv("ESVS_DISABLE_FUSED_POST", "1")
    wavs_ref, _ = st_engine.svs_ensemble(labels_list)
    try:
        st_engine.set_mesh(make_mesh(2))
        wavs_mesh, _ = st_engine.svs_ensemble(labels_list)
    finally:
        st_engine.set_mesh(None)
    assert len(wavs_mesh) == 3
    for wm, wr in zip(wavs_mesh, wavs_ref):
        assert len(wm) == len(wr)
        a = wm.astype(np.float64) / 32767.0
        b = wr.astype(np.float64) / 32767.0
        assert np.sqrt(((a - b) ** 2).mean()) < 1e-4


def test_segmented_synthesis(st_engine):
    """segmented_synthesis splits long songs on rests and concatenates the
    per-segment waveforms (reference svs.py segment_labels path)."""
    labels = hts.load(NIT_LAB)
    # ~12 s prefix: enough to contain internal rests
    n = 0
    for i, e in enumerate(labels.end_times):
        if e > 12 * 1e7:
            n = i
            break
    labels = labels[: max(n, 10)]
    segs = hts.segment_labels(labels.copy())
    wav_seg, sr = st_engine.svs(labels.copy(), segmented_synthesis=True)
    assert sr == SR
    assert len(wav_seg) > sr
    assert np.isfinite(wav_seg.astype(np.float64)).all()
    if len(segs) > 1:
        # total length is within one segment-boundary rounding of the
        # unsegmented render
        wav_full, _ = st_engine.svs(labels.copy(), segmented_synthesis=False)
        assert abs(len(wav_seg) - len(wav_full)) < sr


def test_svs_streaming(st_engine):
    """svs_streaming yields one chunk per rest-delimited segment, in
    order, and pipelining must not change the numerics: the chunks are
    identical to a serial per-segment render via the same stage APIs."""
    labels = hts.load(NIT_LAB)
    n = 0
    for i, e in enumerate(labels.end_times):
        if e > 12 * 1e7:
            n = i
            break
    labels = labels[: max(n, 10)]

    chunks = list(st_engine.svs_streaming(labels.copy()))
    dur_mod = st_engine.predict_timing(labels.copy())
    segments = hts.segment_labels(dur_mod)
    assert len(chunks) == len(segments)
    assert all(c.dtype == np.float32 for c in chunks)
    assert all(len(c) > 0 for c in chunks)
    assert all(np.isfinite(c).all() for c in chunks)

    # serial reference render through the same per-segment chain
    from ensemble_svs_with_interactions_tpu import gen

    hts_frame_shift = int(st_engine.frame_period * 1e4)
    for seg, chunk in zip(segments, chunks):
        seg.frame_shift = hts_frame_shift
        acoustic = st_engine.predict_acoustic(seg)
        streams = st_engine.postprocess_acoustic(acoustic, seg)
        wav = st_engine.predict_waveform(streams, vocoder_type="world")
        ref = np.asarray(
            gen.bandpass_filter(
                np.asarray(wav, np.float64).reshape(-1), SR
            )
        ).astype(np.float32)
        np.testing.assert_array_equal(chunk, ref)


def test_svs_streaming_int16_and_depth(st_engine, short_labels):
    """int16 mode converts with clipping; pipeline_depth=1 (no pipelining)
    yields the same chunks as the default depth."""
    chunks = list(st_engine.svs_streaming(short_labels.copy(),
                                          dtype=np.int16))
    assert all(c.dtype == np.int16 for c in chunks)
    serial = list(st_engine.svs_streaming(short_labels.copy(),
                                          dtype=np.int16,
                                          pipeline_depth=1))
    assert len(chunks) == len(serial)
    for a, b in zip(chunks, serial):
        np.testing.assert_array_equal(a, b)


def test_svs_streaming_rejects_multitrack(mt_engine, short_labels):
    with pytest.raises(ValueError, match="multitrack"):
        list(mt_engine.svs_streaming(short_labels.copy()))


def test_fused_postprocess_parity(mt_engine, short_labels, monkeypatch):
    """The fused device postprocess+vocoder path must reproduce the host
    pipeline (GV postfilter, interp1d, filtfilt trajectory smoothing):
    identical int16 wavs up to float32-vs-float64 rounding."""
    labels_list = [short_labels.copy(), short_labels.copy()]
    wavs_fused, _ = mt_engine.svs_ensemble(labels_list, spk_ids=[0, 1])
    assert mt_engine.last_stage_times  # fused path ran

    monkeypatch.setenv("ESVS_DISABLE_FUSED_POST", "1")
    wavs_host, _ = mt_engine.svs_ensemble(labels_list, spk_ids=[0, 1])

    for wf, wh in zip(wavs_fused, wavs_host):
        assert len(wf) == len(wh)
        a = wf.astype(np.float64) / 32767.0
        b = wh.astype(np.float64) / 32767.0
        # bit-near: tiny quantization-level differences only
        diff = np.abs(a - b)
        assert np.median(diff) <= 2 / 32767.0
        assert np.sqrt((diff**2).mean()) < 5e-3, np.sqrt((diff**2).mean())
        # strongly correlated waveforms (same audio)
        corr = np.corrcoef(a, b)[0, 1]
        assert corr > 0.999, corr


def test_fused_postprocess_parity_gv_off(mt_engine, short_labels, monkeypatch):
    labels_list = [short_labels.copy(), short_labels.copy()]
    wavs_fused, _ = mt_engine.svs_ensemble(
        labels_list, spk_ids=[0, 1], post_filter_type="off"
    )
    monkeypatch.setenv("ESVS_DISABLE_FUSED_POST", "1")
    wavs_host, _ = mt_engine.svs_ensemble(
        labels_list, spk_ids=[0, 1], post_filter_type="off"
    )
    for wf, wh in zip(wavs_fused, wavs_host):
        a = wf.astype(np.float64) / 32767.0
        b = wh.astype(np.float64) / 32767.0
        assert np.sqrt(((a - b) ** 2).mean()) < 5e-3


def test_fused_postprocess_parity_ragged(mt_engine, short_labels, monkeypatch):
    """Tracks of different lengths exercise the ragged (roll/flip)
    filtfilt and masked GV paths; both must still match the host."""
    shorter = short_labels[: max(len(short_labels) - 4, 10)]
    labels_list = [short_labels.copy(), shorter.copy()]
    wavs_fused, _ = mt_engine.svs_ensemble(labels_list, spk_ids=[0, 1])
    monkeypatch.setenv("ESVS_DISABLE_FUSED_POST", "1")
    wavs_host, _ = mt_engine.svs_ensemble(labels_list, spk_ids=[0, 1])
    assert len(wavs_fused[0]) != len(wavs_fused[1])
    for wf, wh in zip(wavs_fused, wavs_host):
        assert len(wf) == len(wh)
        a = wf.astype(np.float64) / 32767.0
        b = wh.astype(np.float64) / 32767.0
        assert np.sqrt(((a - b) ** 2).mean()) < 5e-3
        assert np.corrcoef(a, b)[0, 1] > 0.999
