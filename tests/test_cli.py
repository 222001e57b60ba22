"""CLI surface tests: anasyn, evaluate_timing, generate, NEUTRINO/NSF,
neutrino server, pretrained registry, pitch augmentation."""

import json
import threading
import urllib.request

import numpy as np
import pytest
from scipy.io import wavfile

from ensemble_svs_with_interactions_tpu.io import hts
from tests.util import HED, NIT_LAB, build_tiny_packed_model

SR = 24000


@pytest.fixture(scope="module")
def packed(tmp_path_factory, ):
    return build_tiny_packed_model(tmp_path_factory.mktemp("packed"))


@pytest.fixture(scope="module")
def short_lab(tmp_path_factory):
    labels = hts.load(NIT_LAB)
    n = next(i for i, e in enumerate(labels.end_times) if e > 6e7)
    p = tmp_path_factory.mktemp("lab") / "test.lab"
    labels[: max(n, 10)].save(p)
    return p


def test_anasyn_cli(tmp_path, fixture_data_dir):
    from ensemble_svs_with_interactions_tpu.bin.anasyn import main

    out = tmp_path / "anasyn.wav"
    rc = main([
        str(fixture_data_dir / "nitech_jp_song070_f001_004.wav"),
        str(out), "--sample-rate", str(SR), "--use-codec", "--mgc-order", "24",
        "--f0-floor", "150", "--f0-ceil", "700",
    ])
    assert rc == 0
    sr, x = wavfile.read(out)
    assert sr == SR and np.abs(x.astype(np.int64)).max() > 0


def test_evaluate_timing_cli(tmp_path, packed, short_lab):
    from ensemble_svs_with_interactions_tpu.bin.evaluate_timing import main

    lab_dir = short_lab.parent
    out = tmp_path / "timing_eval"
    rc = main([str(packed), str(lab_dir), str(lab_dir), str(out)])
    assert rc == 0
    assert len(list((out / "timelag").glob("*.npy"))) == 1
    assert len(list((out / "duration").glob("*.npy"))) == 1


def test_neutrino_and_nsf_cli(tmp_path, packed, short_lab):
    from ensemble_svs_with_interactions_tpu.bin.neutrino import main as neutrino
    from ensemble_svs_with_interactions_tpu.bin.nsf import main as nsf

    timing = tmp_path / "timing.lab"
    f0 = tmp_path / "out.f0"
    mgc = tmp_path / "out.mgc"
    bap = tmp_path / "out.bap"
    phrase = tmp_path / "phraselist.txt"
    rc = neutrino([
        str(short_lab), str(timing), str(f0), str(mgc), str(bap), str(packed),
        "-i", str(phrase),
    ])
    assert rc == 0
    assert timing.exists() and phrase.exists()
    assert f0.stat().st_size > 0

    wav_out = tmp_path / "nsf.wav"
    rc = nsf([str(f0), str(mgc), str(bap), str(packed), str(wav_out)])
    assert rc == 0
    sr, x = wavfile.read(wav_out)
    assert sr == SR and len(x) > SR


def test_neutrino_server(packed, short_lab):
    from ensemble_svs_with_interactions_tpu.bin import neutrino_server as srv
    from http.server import ThreadingHTTPServer

    srv._MODEL_ROOT = packed.parent
    server = ThreadingHTTPServer(("127.0.0.1", 0), srv.Handler)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        with urllib.request.urlopen(f"{base}/models") as r:
            models = json.loads(r.read())["models"]
        assert packed.name in models

        labels_text = short_lab.read_text()
        req = urllib.request.Request(
            f"{base}/timing",
            json.dumps({"model": packed.name, "labels": labels_text}).encode(),
            {"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            out = json.loads(r.read())
        assert "timing_labels" in out and len(out["timing_labels"]) > 0
        assert "phraselist" in out
        assert out["name"]

        req = urllib.request.Request(
            f"{base}/acoustic",
            json.dumps(
                {
                    "model": packed.name,
                    "name": out["name"],
                    "timing_labels": out["timing_labels"],
                }
            ).encode(),
            {"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            ac = json.loads(r.read())
        assert ac["mgc_dim"] == 8 and ac["bap_dim"] == 3

        # the NEUTRINO round-trip: user-edited MONO timing labels +
        # server-stored full labels
        from ensemble_svs_with_interactions_tpu.io import hts as _hts

        mono = _hts.full_to_mono(_hts.loads(out["timing_labels"]))
        req = urllib.request.Request(
            f"{base}/acoustic",
            json.dumps(
                {
                    "model": packed.name,
                    "name": out["name"],
                    "timing_labels": str(mono),
                }
            ).encode(),
            {"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            ac2 = json.loads(r.read())
        assert ac2["mgc_dim"] == 8

        # /acoustic without labels or a stored name is a clear 400
        req = urllib.request.Request(
            f"{base}/acoustic",
            json.dumps(
                {"model": packed.name, "timing_labels": out["timing_labels"]}
            ).encode(),
            {"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(req)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()


def test_neutrino_server_stream(packed, short_lab):
    """/stream returns a chunked WAV whose PCM equals the concatenated
    svs_streaming chunks (bit-exact)."""
    from ensemble_svs_with_interactions_tpu.bin import neutrino_server as srv
    from ensemble_svs_with_interactions_tpu.neutrino import NEUTRINO
    from http.server import ThreadingHTTPServer

    srv._MODEL_ROOT = packed.parent
    server = ThreadingHTTPServer(("127.0.0.1", 0), srv.Handler)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        labels_text = short_lab.read_text()
        req = urllib.request.Request(
            f"{base}/stream",
            json.dumps({"model": packed.name, "labels": labels_text}).encode(),
            {"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            assert r.headers["Content-Type"] == "audio/wav"
            body = r.read()  # urllib decodes the chunked framing
        assert body[:4] == b"RIFF" and body[8:12] == b"WAVE"
        pcm = np.frombuffer(body[44:], dtype=np.int16)
        assert len(pcm) > SR // 2

        engine = NEUTRINO(packed)
        expected = np.concatenate(
            list(engine.svs_streaming(hts.loads(labels_text), dtype=np.int16))
        )
        np.testing.assert_array_equal(pcm, expected)

        # labels nor stored name -> 400 (shared resolution helper)
        req = urllib.request.Request(
            f"{base}/stream",
            json.dumps({"model": packed.name}).encode(),
            {"Content-Type": "application/json"},
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req)
        assert exc.value.code == 400
    finally:
        server.shutdown()


def test_pretrained_registry(packed, tmp_path, monkeypatch):
    from ensemble_svs_with_interactions_tpu import pretrained
    from ensemble_svs_with_interactions_tpu.pretrained import (
        create_svs_engine,
        is_pretrained_model_ready,
        register_model,
        retrieve_pretrained_model,
    )

    # point the cache at tmp so the real user cache (which may hold a
    # previously downloaded model) can't flip the readiness asserts below
    monkeypatch.setattr(pretrained, "DEFAULT_CACHE_DIR", tmp_path / "cache")

    register_model("tiny_test", packed)
    assert retrieve_pretrained_model("tiny_test") == packed
    assert is_pretrained_model_ready("tiny_test")
    engine = create_svs_engine("tiny_test")
    assert engine.sample_rate == SR
    with pytest.raises(ValueError):
        retrieve_pretrained_model("no/such/model")
    assert not is_pretrained_model_ready("no/such/model")
    # named remote entries are not ready until downloaded + ported
    assert not is_pretrained_model_ready("r9y9/yoko_latest")


def test_pitch_augmentation(tmp_path):
    from ensemble_svs_with_interactions_tpu.bin.pitch_augmentation import main

    root = tmp_path / "dump"
    (root / "in_acoustic").mkdir(parents=True)
    (root / "out_acoustic").mkdir(parents=True)
    x = np.zeros((10, 86), np.float32)
    x[:, 51] = 5.5  # lf0 conditioning column
    y = np.zeros((10, 67), np.float32)
    y[:, 60] = 5.5
    np.save(root / "in_acoustic" / "utt1-feats.npy", x)
    np.save(root / "out_acoustic" / "utt1-feats.npy", y)
    rc = main([
        str(root), "100",
        "--question-path", HED,
        "--acoustic-lf0-idx", "60",
    ])
    assert rc == 0
    xa = np.load(root / "in_acoustic" / "utt1_aug+100-feats.npy")
    ya = np.load(root / "out_acoustic" / "utt1_aug+100-feats.npy")
    shift = 100 * np.log(2) / 1200
    assert np.allclose(xa[:, 51], 5.5 + shift, atol=1e-6)
    assert np.allclose(ya[:, 60], 5.5 + shift, atol=1e-6)


def _pack_tiny_multitrack(out_dir):
    import jax
    import jax.numpy as jnp

    from ensemble_svs_with_interactions_tpu.utils.config import instantiate, _wrap
    from ensemble_svs_with_interactions_tpu.utils.packing import pack_model
    from ensemble_svs_with_interactions_tpu.utils.scalers import (
        MinMaxScaler,
        StandardScaler,
    )

    ss = [10, 1, 1, 3]
    out_dim = sum(ss)
    rngs = {
        "params": jax.random.PRNGKey(0),
        "dropout": jax.random.PRNGKey(1),
        "prenet": jax.random.PRNGKey(2),
        "zoneout": jax.random.PRNGKey(3),
    }

    timing_net = {
        "_target_": "ensemble_svs_with_interactions_tpu.models.MultiTrackVariancePredictor",
        "in_dim": 164,
        "out_dim": 1,
        "num_speaker": 2,
        "spk_embed_dim": 4,
        "num_layers": 1,
        "hidden_dim": 8,
        "use_mdn": True,
        "num_gaussians": 2,
    }
    timing_cfg = {
        "netG": timing_net,
        "stream_sizes": [1],
        "has_dynamic_features": [False],
        "num_windows": 1,
    }
    tm = instantiate(_wrap(timing_net))
    spks = (jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32))
    timing_vars = tm.init(rngs, jnp.zeros((1, 8, 164)), spks, jnp.asarray([8]),
                          train=True)

    from tests.test_multitrack import _tiny_multitrack_acoustic_netG

    ac_net = _tiny_multitrack_acoustic_netG(in_dim=86, out_dim=out_dim)
    ac_net["stream_sizes"] = ss
    ac_net["in_lf0_idx"] = 51
    ac_net["lf0_model"]["in_lf0_idx"] = 51
    ac_net["mgc_model"]["out_dim"] = ss[0]
    ac_net["bap_model"]["out_dim"] = ss[3]
    ac_cfg = {
        "netG": ac_net,
        "stream_sizes": ss,
        "has_dynamic_features": [False] * 4,
        "num_windows": 1,
    }
    am = instantiate(_wrap(ac_net))
    ys = (jnp.zeros((1, 8, out_dim)), jnp.zeros((1, 8, out_dim)))
    ac_vars = am.init(
        rngs, jnp.zeros((1, 8, 86)), jnp.zeros((1, 8, 86)), spks,
        jnp.asarray([8]), ys, train=True,
    )

    mean = np.zeros(out_dim)
    scale = np.ones(out_dim) * 0.1
    mean[ss[0]] = np.log(260.0)
    pack_model(
        out_dir,
        {"sample_rate": 24000, "frame_period": 5, "feature_type": "world",
         "use_world_codec": True, "relative_f0": False},
        HED,
        {
            "timelag": {
                "model_config": timing_cfg, "variables": timing_vars,
                "in_scaler": MinMaxScaler(np.zeros(82), np.ones(82)),
                "out_scaler": StandardScaler(np.zeros(1), np.ones(1) * 4,
                                             np.ones(1) * 2),
            },
            "duration": {
                "model_config": timing_cfg, "variables": timing_vars,
                "in_scaler": MinMaxScaler(np.zeros(82), np.ones(82)),
                "out_scaler": StandardScaler(np.ones(1) * 10, np.ones(1) * 4,
                                             np.ones(1) * 2),
            },
            "acoustic": {
                "model_config": ac_cfg, "variables": ac_vars,
                "in_scaler": MinMaxScaler(np.zeros(86), np.ones(86)),
                "out_scaler": StandardScaler(mean, scale**2, scale),
            },
        },
    )


def test_synthesis_multitrack_cli(tmp_path):
    """Pairwise multitrack synthesis: wav + feature + timing dumps."""
    from ensemble_svs_with_interactions_tpu.bin.synthesis_multitrack import main
    from ensemble_svs_with_interactions_tpu.io import hts

    packed = tmp_path / "packed_mt"
    _pack_tiny_multitrack(packed)

    labels = hts.load(NIT_LAB)
    n = next(i for i, e in enumerate(labels.end_times) if e > 4e7)
    lab_dir = tmp_path / "lab"
    lab_dir.mkdir()
    labels[: max(n, 10)].save(lab_dir / "alto_seg1.lab")
    labels[: max(n, 10)].save(lab_dir / "soprano_seg1.lab")

    out = tmp_path / "synth_mt"
    rc = main([str(packed), str(lab_dir), str(out), "--spk-names",
               "alto,soprano", "--verbose", "0"])
    assert rc == 0
    wavs = list((out / "wav").glob("*.wav"))
    assert len(wavs) == 2  # (alto,soprano) and (soprano,alto)
    for sub in ("mgc", "logF0", "vuv", "bap", "timelag", "duration"):
        assert len(list((out / sub).glob("*.npy"))) == 2, sub
    lag = np.load(next((out / "timelag").glob("*.npy")))
    assert lag.ndim == 1 and len(lag) > 0


def test_pretrained_named_entries():
    """The registry ships the reference's published model names
    (reference pretrained/__init__.py:14-25)."""
    from ensemble_svs_with_interactions_tpu.pretrained import (
        get_available_model_ids,
        model_registry,
    )

    ids = get_available_model_ids()
    assert "r9y9/yoko_latest" in ids
    assert model_registry["r9y9/yoko_latest"]["url"].startswith("https://")


def test_neutrino_server_score_store_lru(monkeypatch):
    """The score store is LRU-bounded; old entries are evicted, recent
    ones kept (touched entries refreshed)."""
    from ensemble_svs_with_interactions_tpu.bin import neutrino_server as srv

    monkeypatch.setattr(srv, "_SCORES", type(srv._SCORES)())
    monkeypatch.setattr(srv, "_SCORES_MAX", 3)
    for i in range(4):
        srv._store_score(f"s{i}", "x")
    assert list(srv._SCORES) == ["s1", "s2", "s3"]
    srv._store_score("s1", "y")  # touch refreshes recency
    srv._store_score("s4", "x")
    assert list(srv._SCORES) == ["s3", "s1", "s4"]


def test_neutrino_server_concurrent_engine_load(monkeypatch, packed):
    """Concurrent requests for one model build its engine exactly once,
    and a slow load must not serialize other models' lookups behind the
    global lock."""
    from ensemble_svs_with_interactions_tpu.bin import neutrino_server as srv

    monkeypatch.setattr(srv, "_MODEL_ROOT", packed.parent)
    monkeypatch.setattr(srv, "_ENGINES", {})
    monkeypatch.setattr(srv, "_ENGINE_LOCKS", {})
    calls = []
    real = srv.NEUTRINO

    class Counting(real):
        def __init__(self, path):
            calls.append(str(path))
            super().__init__(path)

    monkeypatch.setattr(srv, "NEUTRINO", Counting)
    out, errs = [], []

    def fetch():
        try:
            out.append(srv._engine(packed.name))
        except Exception as e:  # pragma: no cover - surfaced by assert
            errs.append(e)

    threads = [threading.Thread(target=fetch) for _ in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    assert len(calls) == 1  # built exactly once
    assert all(e is out[0] for e in out)


def test_neutrino_server_mgmt_endpoints(packed, short_lab, tmp_path):
    """Endpoint parity with the reference server (server.py:68-223):
    /healthcheck, /models/{id} info, /models/create upload, /phrases."""
    import base64
    import tarfile
    from http.server import ThreadingHTTPServer

    from ensemble_svs_with_interactions_tpu.bin import neutrino_server as srv

    root = tmp_path / "models"
    root.mkdir()
    srv._MODEL_ROOT = root
    server = ThreadingHTTPServer(("127.0.0.1", 0), srv.Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{server.server_address[1]}"

    def post(path, obj, expect_error=None):
        req = urllib.request.Request(
            f"{base}{path}", json.dumps(obj).encode(),
            {"Content-Type": "application/json"},
        )
        if expect_error is not None:
            with pytest.raises(urllib.error.HTTPError) as exc:
                urllib.request.urlopen(req)
            assert exc.value.code == expect_error
            return None
        with urllib.request.urlopen(req) as r:
            return json.loads(r.read())

    try:
        with urllib.request.urlopen(f"{base}/healthcheck") as r:
            assert json.loads(r.read()) == {"healthcheck": "OK"}

        # empty root: nothing listed, info is a 404
        with urllib.request.urlopen(f"{base}/models") as r:
            assert json.loads(r.read())["models"] == []
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(f"{base}/models/ghost")
        assert exc.value.code == 404

        # GET model info must not escape the model root: http.client
        # sends the path verbatim (no ../ normalization)
        import http.client

        conn = http.client.HTTPConnection(
            "127.0.0.1", server.server_address[1]
        )
        conn.request("GET", "/models/../outside")
        assert conn.getresponse().status == 404
        conn.close()

        # upload the packed model as a nested tar.gz
        tarball = tmp_path / "pack.tar.gz"
        with tarfile.open(tarball, "w:gz") as tf:
            tf.add(packed, arcname="uploaded_voice")
        pack_b64 = base64.b64encode(tarball.read_bytes()).decode()
        out = post("/models/create", {"model_id": "voice1", "pack": pack_b64})
        assert out == {"model_id": "voice1"}
        assert (root / "voice1" / "config.yaml").exists()
        assert not list(root.glob("*.partial"))
        with urllib.request.urlopen(f"{base}/models") as r:
            assert json.loads(r.read())["models"] == ["voice1"]

        # path-traversal and junk ids are rejected without touching disk
        post("/models/create", {"model_id": "../evil", "pack": pack_b64},
             expect_error=500)
        post("/models/create", {"model_id": "bad", "pack": base64.b64encode(
            b"not a tarball").decode()}, expect_error=500)
        assert sorted(p.name for p in root.iterdir()) == ["voice1"]

        # model info returns the packed config
        with urllib.request.urlopen(f"{base}/models/voice1") as r:
            info = json.loads(r.read())
        assert info["config"]["sample_rate"] == SR
        assert "repr" in info

        # /phrases enumerates the phraselist for the uploaded model
        out = post("/phrases", {"model": "voice1",
                                "labels": short_lab.read_text()})
        assert out["num_phrases"] >= 1
        assert isinstance(out["phraselist"], str) and out["phraselist"]
    finally:
        server.shutdown()
