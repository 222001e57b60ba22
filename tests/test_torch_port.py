"""Torch -> flax weight-porting parity tests.

Imports the reference's torch model zoo (with stub modules for its
native deps) to verify that ported weights reproduce the reference
forward pass bit-near-exactly — the strongest behavioral-parity check
in the suite.
"""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not (REFERENCE / "nnsvs").exists(), reason="reference checkout unavailable"
)


@pytest.fixture(scope="module")
def ref_models():
    """Import nnsvs.model with stub native deps."""

    def shim(name, **attrs):
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules.setdefault(name, mod)

    shim("pkg_resources", resource_filename=lambda *a: "")
    for n in (
        "pyworld", "pysptk", "librosa", "soundfile",
        "nnmnkwii", "nnmnkwii.paramgen", "nnmnkwii.io", "nnmnkwii.io.hts",
        "nnmnkwii.frontend", "nnmnkwii.frontend.merlin",
        "nnmnkwii.preprocessing", "nnmnkwii.preprocessing.f0",
        "nnmnkwii.postfilters", "nnmnkwii.metrics", "parallel_wavegan",
    ):
        shim(n)
    sys.modules["nnmnkwii"].paramgen = sys.modules["nnmnkwii.paramgen"]
    sys.modules["nnmnkwii.paramgen"].mlpg = lambda *a, **k: None
    def _lfilter(waveform, a_coeffs, b_coeffs, clamp=True):
        # torchaudio.functional.lfilter(x, a, b) == scipy lfilter(b, a, x)
        import torch
        from scipy.signal import lfilter as sp_lfilter

        x = waveform.detach().numpy()
        out = sp_lfilter(
            b_coeffs.detach().numpy(), a_coeffs.detach().numpy(), x, axis=-1
        )
        return torch.from_numpy(out.astype(x.dtype))

    shim("torchaudio")
    shim("torchaudio.functional", lfilter=_lfilter)
    sys.modules["torchaudio"].functional = sys.modules["torchaudio.functional"]
    shim("hydra")
    shim(
        "hydra.utils",
        instantiate=lambda *a, **k: None,
        to_absolute_path=lambda p: p,
    )
    shim("omegaconf", OmegaConf=object, DictConfig=dict)
    # append, not insert(0): the reference checkout has its own top-level
    # `tests` package that would otherwise shadow ours for later test files
    if str(REFERENCE) not in sys.path:
        sys.path.append(str(REFERENCE))
    import nnsvs.acoustic_models  # noqa: F401 — make shimmed import available
    import nnsvs.model as M

    return M


def _port(torch_model, flax_model, x_np, init_args=()):
    import jax
    import jax.numpy as jnp

    from ensemble_svs_with_interactions_tpu.utils.torch_port import torch_to_flax

    fv = flax_model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros(x_np.shape, jnp.float32),
        *init_args,
        jnp.asarray([x_np.shape[1]]),
    )
    pv, n = torch_to_flax(
        {k: v.numpy() for k, v in torch_model.state_dict().items()}, fv
    )
    return pv, n


def test_port_mdn(ref_models):
    import jax.numpy as jnp
    import torch

    from ensemble_svs_with_interactions_tpu.models import MDN

    torch.manual_seed(0)
    tm = ref_models.MDN(in_dim=6, hidden_dim=8, out_dim=2, num_gaussians=2).eval()
    fm = MDN(in_dim=6, hidden_dim=8, out_dim=2, num_gaussians=2, num_layers=1)
    x = np.random.default_rng(0).normal(size=(1, 7, 6)).astype(np.float32)
    pv, n = _port(tm, fm, x)
    assert n == 4
    with torch.no_grad():
        t_pi, t_sig, t_mu = tm(torch.from_numpy(x), [7])
    f_pi, f_sig, f_mu = fm.apply(pv, jnp.asarray(x), jnp.asarray([7]))
    np.testing.assert_allclose(np.asarray(f_mu), t_mu.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(f_pi), t_pi.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(f_sig), t_sig.numpy(), atol=1e-5)


def test_port_lstmrnn(ref_models):
    import jax.numpy as jnp
    import torch

    from ensemble_svs_with_interactions_tpu.models import LSTMRNN

    torch.manual_seed(1)
    tm = ref_models.LSTMRNN(
        in_dim=6, hidden_dim=5, out_dim=3, num_layers=2, bidirectional=True
    ).eval()
    fm = LSTMRNN(in_dim=6, hidden_dim=5, out_dim=3, num_layers=2, bidirectional=True)
    x = np.random.default_rng(1).normal(size=(1, 9, 6)).astype(np.float32)
    pv, n = _port(tm, fm, x)
    assert n == 5  # 4 LSTM cells + output Dense
    with torch.no_grad():
        t_out = tm(torch.from_numpy(x), [9])
    f_out = fm.apply(pv, jnp.asarray(x), jnp.asarray([9]))
    np.testing.assert_allclose(np.asarray(f_out), t_out.numpy(), atol=1e-5)


def test_port_ffconvlstm(ref_models):
    import jax.numpy as jnp
    import torch

    from ensemble_svs_with_interactions_tpu.models import FFConvLSTM

    torch.manual_seed(2)
    tm = ref_models.FFConvLSTM(
        in_dim=10, ff_hidden_dim=8, conv_hidden_dim=6, lstm_hidden_dim=4, out_dim=3
    ).eval()
    fm = FFConvLSTM(
        in_dim=10, ff_hidden_dim=8, conv_hidden_dim=6, lstm_hidden_dim=4, out_dim=3
    )
    x = np.random.default_rng(2).normal(size=(1, 6, 10)).astype(np.float32)
    pv, n = _port(tm, fm, x)
    assert n == 14
    with torch.no_grad():
        t_out = tm(torch.from_numpy(x), [6])
    t = t_out[0] if isinstance(t_out, (list, tuple)) else t_out
    f_out = fm.apply(pv, jnp.asarray(x), jnp.asarray([6]))
    np.testing.assert_allclose(np.asarray(f_out), t.numpy(), atol=1e-5)


def test_port_shape_mismatch_raises(ref_models):
    import torch

    from ensemble_svs_with_interactions_tpu.models import MDN

    torch.manual_seed(0)
    tm = ref_models.MDN(in_dim=6, hidden_dim=8, out_dim=2, num_gaussians=2).eval()
    fm = MDN(in_dim=6, hidden_dim=16, out_dim=2, num_gaussians=2, num_layers=1)
    x = np.zeros((1, 4, 6), np.float32)
    with pytest.raises(ValueError, match="shape mismatch"):
        _port(tm, fm, x)


def test_port_ar_decoder_teacher_forced(ref_models):
    """BiLSTMResF0NonAttentiveDecoder: ported weights must reproduce the
    reference's teacher-forced forward bit-exactly (incl. the reference's
    current-frame prenet conditioning quirk, tacotron_f0.py:178-189)."""
    import jax
    import jax.numpy as jnp
    import torch

    from nnsvs.acoustic_models import (  # noqa: E501 — shimmed import
        BiLSTMResF0NonAttentiveDecoder as TModel,
    )

    from ensemble_svs_with_interactions_tpu.models.acoustic import (
        BiLSTMResF0NonAttentiveDecoder as FModel,
    )
    from ensemble_svs_with_interactions_tpu.utils.torch_port import torch_to_flax

    torch.manual_seed(7)
    kw = dict(
        in_dim=12, ff_hidden_dim=8, conv_hidden_dim=6, lstm_hidden_dim=4,
        num_lstm_layers=1, out_dim=1, decoder_layers=1, decoder_hidden_dim=8,
        prenet_layers=1, prenet_hidden_dim=4, prenet_dropout=0.0,
        zoneout=0.0, reduction_factor=1, in_lf0_idx=3, out_lf0_idx=0,
        in_lf0_min=5.0, in_lf0_max=6.5, out_lf0_mean=5.9, out_lf0_scale=0.23,
    )
    tm = TModel(**kw).eval()
    fm = FModel(**kw)
    fv = fm.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "prenet": jax.random.PRNGKey(2), "zoneout": jax.random.PRNGKey(3)},
        jnp.zeros((1, 6, 12)), jnp.asarray([6]), jnp.zeros((1, 6, 1)),
        train=True,
    )
    pv, n = torch_to_flax(
        {k: v.numpy() for k, v in tm.state_dict().items()}, fv
    )
    assert n == 14
    x = np.random.default_rng(3).normal(size=(1, 6, 12)).astype(np.float32)
    y = np.random.default_rng(4).normal(size=(1, 6, 1)).astype(np.float32)
    with torch.no_grad():
        t_out, t_res = tm(torch.from_numpy(x), [6], torch.from_numpy(y))
    f_out, f_res = fm.apply(
        pv, jnp.asarray(x), jnp.asarray([6]), jnp.asarray(y),
        rngs={"prenet": jax.random.PRNGKey(9),
              "zoneout": jax.random.PRNGKey(10)},
    )
    np.testing.assert_allclose(np.asarray(f_out), t_out.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(f_res), t_res.numpy(), atol=1e-6)


def test_port_res_skip_f0_ffconvlstm(ref_models):
    import jax
    import jax.numpy as jnp
    import torch

    from nnsvs.acoustic_models import ResSkipF0FFConvLSTM as TModel

    from ensemble_svs_with_interactions_tpu.models.acoustic import (
        ResSkipF0FFConvLSTM as FModel,
    )
    from ensemble_svs_with_interactions_tpu.utils.torch_port import torch_to_flax

    torch.manual_seed(5)
    kw = dict(
        in_dim=12, ff_hidden_dim=8, conv_hidden_dim=6, lstm_hidden_dim=4,
        out_dim=5, in_lf0_idx=3, out_lf0_idx=2,
        in_lf0_min=5.0, in_lf0_max=6.5, out_lf0_mean=5.9, out_lf0_scale=0.23,
    )
    tm = TModel(**kw).eval()
    fm = FModel(**kw)
    fv = fm.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 6, 12)), jnp.asarray([6]),
    )
    pv, n = torch_to_flax(
        {k: v.numpy() for k, v in tm.state_dict().items()}, fv
    )
    x = np.random.default_rng(3).normal(size=(1, 6, 12)).astype(np.float32)
    with torch.no_grad():
        t_out, t_res = tm(torch.from_numpy(x), [6])
    f_out, f_res = fm.apply(pv, jnp.asarray(x), jnp.asarray([6]))
    np.testing.assert_allclose(np.asarray(f_out), t_out.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(f_res), t_res.numpy(), atol=1e-5)


def test_port_bilstm_postnet_decoder(ref_models):
    """BiLSTMNonAttentiveDecoder with a residual Post-Net and AR
    initial_value: ported weights must reproduce the reference's
    teacher-forced [coarse, fine] forward (acoustic_models/tacotron.py:
    118-300, postnet.py:9)."""
    import jax
    import jax.numpy as jnp
    import torch

    from nnsvs.acoustic_models import BiLSTMNonAttentiveDecoder as TModel

    from ensemble_svs_with_interactions_tpu.models.acoustic import (
        BiLSTMNonAttentiveDecoder as FModel,
    )
    from ensemble_svs_with_interactions_tpu.utils.torch_port import torch_to_flax

    torch.manual_seed(11)
    kw = dict(
        in_dim=12, ff_hidden_dim=8, conv_hidden_dim=6, lstm_hidden_dim=4,
        num_lstm_layers=1, out_dim=3, decoder_layers=1, decoder_hidden_dim=8,
        prenet_layers=1, prenet_hidden_dim=4, prenet_dropout=0.0,
        zoneout=0.0, reduction_factor=1, embed_dim=None,
        postnet_layers=2, postnet_channels=5, postnet_kernel_size=5,
        postnet_dropout=0.0, initial_value=-4.0,
    )
    tm = TModel(**kw).eval()
    fm = FModel(**kw)
    fv = fm.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "prenet": jax.random.PRNGKey(2), "zoneout": jax.random.PRNGKey(3)},
        jnp.zeros((1, 6, 12)), jnp.asarray([6]), jnp.zeros((1, 6, 3)),
        train=True,
    )
    pv, _ = torch_to_flax(
        {k: v.numpy() for k, v in tm.state_dict().items()}, fv
    )
    x = np.random.default_rng(13).normal(size=(1, 6, 12)).astype(np.float32)
    y = np.random.default_rng(14).normal(size=(1, 6, 3)).astype(np.float32)
    with torch.no_grad():
        t_coarse, t_fine = tm(torch.from_numpy(x), [6], torch.from_numpy(y))
    f_coarse, f_fine = fm.apply(
        pv, jnp.asarray(x), jnp.asarray([6]), jnp.asarray(y),
        rngs={"prenet": jax.random.PRNGKey(9),
              "zoneout": jax.random.PRNGKey(10)},
    )
    np.testing.assert_allclose(np.asarray(f_coarse), t_coarse.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(f_fine), t_fine.numpy(), atol=1e-5)


def test_port_flagship_multitrack(ref_models):
    """THE paper's acoustic model: MultiTrackMultistreamSeparateF0
    ParametricModel ported end-to-end, teacher-forced forward parity
    (compat_sub_encoder_outs reproduces the reference's sub-track
    encoder routing, multistream.py:520-522)."""
    import jax
    import jax.numpy as jnp
    import torch

    from nnsvs.acoustic_models import (
        MultiTrackBiLSTMResF0NonAttentiveDecoder as TLf0,
        MultiTrackMultistreamSeparateF0ParametricModel as TTop,
    )

    from ensemble_svs_with_interactions_tpu.utils.config import (
        _wrap,
        instantiate as finst,
    )
    from ensemble_svs_with_interactions_tpu.utils.torch_port import torch_to_flax

    torch.manual_seed(11)
    IN, OUT = 8, 17
    SS = [10, 1, 1, 5]
    ENC_OUT, EMB = 6, 4
    ph = dict(in_ph_start_idx=1, in_ph_end_idx=4, embed_dim=EMB)
    lf0_kw = dict(
        in_dim=IN, ff_hidden_dim=8, conv_hidden_dim=6, lstm_hidden_dim=4,
        num_lstm_layers=1, out_dim=1, decoder_layers=1, decoder_hidden_dim=8,
        prenet_layers=0, prenet_dropout=0.0, zoneout=0.0, reduction_factor=1,
        downsample_by_conv=False, in_lf0_idx=5, out_lf0_idx=0,
        in_lf0_min=5.0, in_lf0_max=6.5, out_lf0_mean=5.9, out_lf0_scale=0.23,
        **ph,
    )
    enc_kw = dict(in_dim=IN, hidden_dim=4, out_dim=ENC_OUT, num_layers=1, **ph)
    dec_kw = dict(
        in_dim=ENC_OUT + 2, ff_hidden_dim=8, conv_hidden_dim=8, lstm_hidden_dim=4
    )
    tm = TTop(
        in_dim=IN, out_dim=OUT, stream_sizes=SS, reduction_factor=1,
        encoder=ref_models.MultiTrackLSTMEncoder(**enc_kw),
        mgc_model=ref_models.FFConvLSTM(**dec_kw, out_dim=SS[0]),
        lf0_model=TLf0(**lf0_kw),
        vuv_model=ref_models.FFConvLSTM(**dec_kw, out_dim=SS[2]),
        bap_model=ref_models.FFConvLSTM(**dec_kw, out_dim=SS[3]),
        speaker_embedding=ref_models.SpeakerEmbedding(2, EMB, None),
        in_rest_idx=0, in_lf0_idx=5, in_lf0_min=5.0, in_lf0_max=6.5,
        out_lf0_idx=SS[0], out_lf0_mean=5.9, out_lf0_scale=0.23,
    ).eval()
    pre = "ensemble_svs_with_interactions_tpu.models"
    netG = {
        "_target_": f"{pre}.acoustic.MultiTrackMultistreamSeparateF0ParametricModel",
        "in_dim": IN, "out_dim": OUT, "stream_sizes": SS, "reduction_factor": 1,
        "in_rest_idx": 0, "in_lf0_idx": 5, "out_lf0_idx": SS[0],
        "in_lf0_min": 5.0, "in_lf0_max": 6.5,
        "out_lf0_mean": 5.9, "out_lf0_scale": 0.23,
        "compat_sub_encoder_outs": True,
        "encoder": {"_target_": f"{pre}.MultiTrackLSTMEncoder", **enc_kw},
        "lf0_model": {
            "_target_": f"{pre}.acoustic.MultiTrackBiLSTMResF0NonAttentiveDecoder",
            **lf0_kw,
        },
        "mgc_model": {"_target_": f"{pre}.FFConvLSTM", **dec_kw, "out_dim": SS[0]},
        "vuv_model": {"_target_": f"{pre}.FFConvLSTM", **dec_kw, "out_dim": SS[2]},
        "bap_model": {"_target_": f"{pre}.FFConvLSTM", **dec_kw, "out_dim": SS[3]},
        "speaker_embedding": {
            "_target_": f"{pre}.SpeakerEmbedding",
            "num_embeddings": 2, "embedding_dim": EMB,
        },
    }
    fm = finst(_wrap(netG))
    B, T = 1, 6
    rngs = {
        "params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
        "prenet": jax.random.PRNGKey(2), "zoneout": jax.random.PRNGKey(3),
    }
    spks = (jnp.zeros((B,), jnp.int32), jnp.ones((B,), jnp.int32))
    ys0 = (jnp.zeros((B, T, OUT)), jnp.zeros((B, T, OUT)))
    fv = fm.init(
        rngs, jnp.zeros((B, T, IN)), jnp.zeros((B, T, IN)), spks,
        jnp.asarray([T]), ys0, train=True,
    )
    SCOPES = [
        ("encoder.", "/encoder"), ("mgc_model.", "/mgc_model"),
        ("lf0_model.", "/lf0_model"), ("vuv_model.", "/vuv_model"),
        ("bap_model.", "/bap_model"),
        ("speaker_embedding.", "/speaker_embedding"),
    ]
    pv, n = torch_to_flax(
        {k: v.numpy() for k, v in tm.state_dict().items()}, fv,
        scope_pairs=SCOPES,
    )
    assert n == 63
    rng = np.random.default_rng(8)

    def make_x():
        x = (rng.normal(size=(B, T, IN)) * 0.3).astype(np.float32)
        x[:, :, 1:4] = 0
        for t in range(T):
            x[0, t, 1 + rng.integers(0, 3)] = 1.0
        return x

    x0, x1 = make_x(), make_x()
    y0 = rng.normal(size=(B, T, OUT)).astype(np.float32)
    y1 = rng.normal(size=(B, T, OUT)).astype(np.float32)
    with torch.no_grad():
        t_outs = tm(
            torch.from_numpy(x0), torch.from_numpy(x1),
            [torch.zeros(B, dtype=torch.long), torch.ones(B, dtype=torch.long)],
            [T], [torch.from_numpy(y0), torch.from_numpy(y1)],
        )
    f_outs = fm.apply(
        pv, jnp.asarray(x0), jnp.asarray(x1), spks, jnp.asarray([T]),
        (jnp.asarray(y0), jnp.asarray(y1)), train=False,
        rngs={"prenet": jax.random.PRNGKey(9), "zoneout": jax.random.PRNGKey(10)},
    )
    (f_main, f_res_main), (f_sub, f_res_sub) = f_outs
    (t_main, t_res_main), (t_sub, t_res_sub) = t_outs

    def tocat(o):
        if isinstance(o, (list, tuple)):
            return torch.cat(list(o), dim=-1).numpy()
        return o.numpy()

    np.testing.assert_allclose(np.asarray(f_main), tocat(t_main), atol=1e-5)
    np.testing.assert_allclose(np.asarray(f_sub), tocat(t_sub), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(f_res_main), t_res_main.numpy(), atol=1e-5
    )


def test_port_npss_cascade(ref_models):
    """NPSS MDN cascade: all four streams reproduce the reference
    (caught a vuv-conditioning concat-order bug: (x, mgc, lf0, bap))."""
    import jax
    import jax.numpy as jnp
    import torch

    from nnsvs.acoustic_models import (
        NPSSMDNMultistreamParametricModel as TTop,
        ResSkipF0FFConvLSTM as TLf0,
    )

    from ensemble_svs_with_interactions_tpu.utils.config import (
        _wrap,
        instantiate as finst,
    )
    from ensemble_svs_with_interactions_tpu.utils.torch_port import torch_to_flax

    torch.manual_seed(21)
    IN, OUT = 8, 17
    SS = [10, 1, 1, 5]
    pre = "ensemble_svs_with_interactions_tpu.models"
    lf0_kw = dict(
        in_dim=IN, ff_hidden_dim=8, conv_hidden_dim=6, lstm_hidden_dim=4,
        out_dim=1, in_lf0_idx=5, out_lf0_idx=0,
        in_lf0_min=5.0, in_lf0_max=6.5, out_lf0_mean=5.9, out_lf0_scale=0.23,
    )
    mgc_kw = dict(in_dim=IN + 1, hidden_dim=8, out_dim=SS[0], num_layers=1,
                  num_gaussians=2, dim_wise=True)
    bap_kw = dict(in_dim=IN + 1, hidden_dim=8, out_dim=SS[3], num_layers=1,
                  num_gaussians=2, dim_wise=True)
    vuv_kw = dict(in_dim=IN + 1 + SS[3], hidden_dim=8, out_dim=1, num_layers=1)
    tm = TTop(
        in_dim=IN, out_dim=OUT, stream_sizes=SS, reduction_factor=1,
        lf0_model=TLf0(**lf0_kw),
        mgc_model=ref_models.MDNv2(**mgc_kw),
        bap_model=ref_models.MDNv2(**bap_kw),
        vuv_model=ref_models.FFN(**vuv_kw),
        in_rest_idx=0, in_lf0_idx=5, in_lf0_min=5.0, in_lf0_max=6.5,
        out_lf0_idx=SS[0], out_lf0_mean=5.9, out_lf0_scale=0.23,
    ).eval()
    netG = {
        "_target_": f"{pre}.acoustic.NPSSMDNMultistreamParametricModel",
        "in_dim": IN, "out_dim": OUT, "stream_sizes": SS, "reduction_factor": 1,
        "in_rest_idx": 0, "in_lf0_idx": 5, "out_lf0_idx": SS[0],
        "in_lf0_min": 5.0, "in_lf0_max": 6.5,
        "out_lf0_mean": 5.9, "out_lf0_scale": 0.23,
        "lf0_model": {"_target_": f"{pre}.acoustic.ResSkipF0FFConvLSTM", **lf0_kw},
        "mgc_model": {"_target_": f"{pre}.MDNv2", **mgc_kw},
        "bap_model": {"_target_": f"{pre}.MDNv2", **bap_kw},
        "vuv_model": {"_target_": f"{pre}.FFN", **vuv_kw},
    }
    fm = finst(_wrap(netG))
    B, T = 1, 6
    fv = fm.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((B, T, IN)), jnp.asarray([T]), jnp.zeros((B, T, OUT)),
        train=True,
    )
    SCOPES = [
        ("lf0_model.", "/lf0_model"), ("mgc_model.", "/mgc_model"),
        ("bap_model.", "/bap_model"), ("vuv_model.", "/vuv_model"),
    ]
    pv, n = torch_to_flax(
        {k: v.numpy() for k, v in tm.state_dict().items()}, fv,
        scope_pairs=SCOPES,
    )
    assert n == 25
    rng = np.random.default_rng(9)
    x = rng.normal(size=(B, T, IN)).astype(np.float32)
    y = rng.normal(size=(B, T, OUT)).astype(np.float32)
    with torch.no_grad():
        t_streams, _ = tm(torch.from_numpy(x), [T], torch.from_numpy(y))
    f_streams = fm.apply(
        pv, jnp.asarray(x), jnp.asarray([T]), jnp.asarray(y), train=False
    )[0]
    for ts, fs in zip(t_streams, f_streams):
        if isinstance(ts, tuple):
            for te, fe in zip(ts, fs):
                np.testing.assert_allclose(np.asarray(fe), te.numpy(), atol=1e-5)
        else:
            np.testing.assert_allclose(np.asarray(fs), ts.numpy(), atol=1e-5)


def test_port_conv1d_resnet_weightnorm(ref_models):
    """Conv1dResnet: weight-normed convs port (flax WeightNorm scale is
    reconstructed from the materialized torch weight)."""
    import jax
    import jax.numpy as jnp
    import torch

    from ensemble_svs_with_interactions_tpu.models import Conv1dResnet
    from ensemble_svs_with_interactions_tpu.utils.torch_port import torch_to_flax

    torch.manual_seed(31)
    kw = dict(in_dim=10, hidden_dim=8, out_dim=3, num_layers=2)
    tm = ref_models.Conv1dResnet(**kw).eval()
    fm = Conv1dResnet(**kw)
    fv = fm.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 8, 10)), jnp.asarray([8]), train=True,
    )
    pv, n = torch_to_flax(
        {k: v.numpy() for k, v in tm.state_dict().items()}, fv
    )
    assert n == 8
    x = np.random.default_rng(5).normal(size=(1, 8, 10)).astype(np.float32)
    with torch.no_grad():
        t = tm(torch.from_numpy(x), [8])
    f = fm.apply(pv, jnp.asarray(x), jnp.asarray([8]), train=False)
    np.testing.assert_allclose(np.asarray(f), t.numpy(), atol=1e-5)


def test_port_multitrack_variance_predictor(ref_models):
    """MultiTrackVariancePredictor (the multitrack timing model): ported
    MDN outputs match (incl. LayerNorm eps=1e-12 parity)."""
    import jax
    import jax.numpy as jnp
    import torch

    from ensemble_svs_with_interactions_tpu.models import (
        MultiTrackVariancePredictor,
    )
    from ensemble_svs_with_interactions_tpu.utils.torch_port import torch_to_flax

    torch.manual_seed(31)
    kw = dict(
        in_dim=12, out_dim=1, num_layers=2, hidden_dim=8, kernel_size=5,
        dropout=0.0, use_mdn=True, num_gaussians=2, dim_wise=True,
        num_speaker=2, spk_embed_dim=4,
    )
    tm = ref_models.MultiTrackVariancePredictor(**kw).eval()
    fm = MultiTrackVariancePredictor(**kw)
    B, T = 1, 8
    spks = (jnp.zeros((B,), jnp.int32), jnp.ones((B,), jnp.int32))
    fv = fm.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((B, T, 24)), spks, jnp.asarray([T]), train=True,
    )
    pv, n = torch_to_flax(
        {k: v.numpy() for k, v in tm.state_dict().items()}, fv
    )
    assert n == 8
    x = np.random.default_rng(4).normal(size=(B, T, 24)).astype(np.float32)
    with torch.no_grad():
        t_pi, t_sig, t_mu = tm(
            torch.from_numpy(x),
            [torch.zeros(B, dtype=torch.long), torch.ones(B, dtype=torch.long)],
            T,
        )
    f_pi, f_sig, f_mu = fm.apply(pv, jnp.asarray(x), spks, jnp.asarray([T]),
                                 train=False)
    np.testing.assert_allclose(np.asarray(f_mu), t_mu.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(f_pi), t_pi.numpy(), atol=1e-4)


def test_port_multitrack_npss_cascade(ref_models):
    """MultiTrackNPSSMDNMultistreamParametricModel: ported inference output
    (the main-track cascade with speaker-conditioned decoders) matches the
    reference forward bit-near-exactly (VERDICT round-1 item 8)."""
    import jax
    import jax.numpy as jnp
    import torch

    from nnsvs.acoustic_models import (
        MultiTrackBiLSTMResF0NonAttentiveDecoder as TLf0,
        MultiTrackNPSSMDNMultistreamParametricModel as TTop,
    )

    from ensemble_svs_with_interactions_tpu.utils.config import _wrap
    from ensemble_svs_with_interactions_tpu.utils.config import (
        instantiate as finst,
    )
    from ensemble_svs_with_interactions_tpu.utils.torch_port import torch_to_flax

    torch.manual_seed(21)
    IN, OUT = 8, 17
    SS = [10, 1, 1, 5]
    EMB = 8  # speaker embedding adds onto the phoneme embedding: dims match
    ph = dict(in_ph_start_idx=1, in_ph_end_idx=4, embed_dim=EMB)
    lf0_kw = dict(
        in_dim=IN, ff_hidden_dim=8, conv_hidden_dim=6, lstm_hidden_dim=4,
        num_lstm_layers=1, out_dim=1, decoder_layers=1, decoder_hidden_dim=8,
        prenet_layers=0, prenet_dropout=0.0, zoneout=0.0, reduction_factor=1,
        downsample_by_conv=False, in_lf0_idx=5, out_lf0_idx=0,
        in_lf0_min=5.0, in_lf0_max=6.5, out_lf0_mean=5.9, out_lf0_scale=0.23,
        **ph,
    )
    # mgc/bap consume cat(x, lf0); vuv consumes cat(x, lf0, bap); the
    # decoders use phoneme embedding so the additive speaker embedding has
    # a matching width (the reference recipe's configuration)
    mgc_kw = dict(in_dim=IN + 1, ff_hidden_dim=8, conv_hidden_dim=8,
                  lstm_hidden_dim=4, **ph)
    vuv_kw = dict(in_dim=IN + 1 + SS[3], ff_hidden_dim=8, conv_hidden_dim=8,
                  lstm_hidden_dim=4, **ph)
    tm = TTop(
        in_dim=IN, out_dim=OUT, stream_sizes=SS, reduction_factor=1,
        lf0_model=TLf0(**lf0_kw),
        mgc_model=ref_models.FFConvLSTM(**mgc_kw, out_dim=SS[0]),
        bap_model=ref_models.FFConvLSTM(**mgc_kw, out_dim=SS[3]),
        vuv_model=ref_models.FFConvLSTM(**vuv_kw, out_dim=SS[2]),
        speaker_embedding=ref_models.SpeakerEmbedding(2, IN, None),
        in_rest_idx=0, in_lf0_idx=5, in_lf0_min=5.0, in_lf0_max=6.5,
        out_lf0_idx=SS[0], out_lf0_mean=5.9, out_lf0_scale=0.23,
        output_subtrack=True,
    ).eval()
    pre = "ensemble_svs_with_interactions_tpu.models"
    netG = {
        "_target_": f"{pre}.acoustic.MultiTrackNPSSMDNMultistreamParametricModel",
        "in_dim": IN, "out_dim": OUT, "stream_sizes": SS,
        "reduction_factor": 1,
        "in_rest_idx": 0, "in_lf0_idx": 5, "out_lf0_idx": SS[0],
        "in_lf0_min": 5.0, "in_lf0_max": 6.5,
        "out_lf0_mean": 5.9, "out_lf0_scale": 0.23,
        "output_subtrack": True,
        "lf0_model": {
            "_target_": f"{pre}.acoustic.MultiTrackBiLSTMResF0NonAttentiveDecoder",
            **lf0_kw,
        },
        "mgc_model": {"_target_": f"{pre}.FFConvLSTM", **mgc_kw,
                      "out_dim": SS[0]},
        "bap_model": {"_target_": f"{pre}.FFConvLSTM", **mgc_kw,
                      "out_dim": SS[3]},
        "vuv_model": {"_target_": f"{pre}.FFConvLSTM", **vuv_kw,
                      "out_dim": SS[2]},
        "speaker_embedding": {
            "_target_": f"{pre}.SpeakerEmbedding",
            "num_embeddings": 2, "embedding_dim": IN,
        },
    }
    fm = finst(_wrap(netG))
    B, T = 1, 6
    rngs = {
        "params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
        "prenet": jax.random.PRNGKey(2), "zoneout": jax.random.PRNGKey(3),
    }
    spks = (jnp.zeros((B,), jnp.int32), jnp.ones((B,), jnp.int32))
    ys0 = (jnp.zeros((B, T, OUT)), jnp.zeros((B, T, OUT)))
    fv = fm.init(
        rngs, jnp.zeros((B, T, IN)), jnp.zeros((B, T, IN)), spks,
        jnp.asarray([T]), ys0, train=True,
    )
    SCOPES = [
        ("lf0_model.", "/lf0_model"), ("mgc_model.", "/mgc_model"),
        ("bap_model.", "/bap_model"), ("vuv_model.", "/vuv_model"),
        ("speaker_embedding.", "/speaker_embedding"),
    ]
    pv, n = torch_to_flax(
        {k: v.numpy() for k, v in tm.state_dict().items()}, fv,
        scope_pairs=SCOPES,
    )
    assert n >= 40

    rng = np.random.default_rng(12)
    xm = (rng.normal(size=(B, T, IN)) * 0.3).astype(np.float32)
    xs = (rng.normal(size=(B, T, IN)) * 0.3).astype(np.float32)
    for x in (xm, xs):
        x[:, :, 1:4] = 0
        for t in range(T):
            x[0, t, 1 + rng.integers(0, 3)] = 1.0
        x[:, :, 5] = rng.uniform(0.2, 0.8, size=(1, T))
    with __import__("torch").no_grad():
        t_out, t_out_sub = tm(
            __import__("torch").from_numpy(xm),
            __import__("torch").from_numpy(xs),
            [__import__("torch").zeros(B, dtype=__import__("torch").long),
             __import__("torch").ones(B, dtype=__import__("torch").long)],
            [T],
        )
    f_out, f_out_sub = fm.apply(
        pv, jnp.asarray(xm), jnp.asarray(xs), spks, jnp.asarray([T]),
        train=False, rngs={"prenet": jax.random.PRNGKey(9)},
    )
    np.testing.assert_allclose(
        np.asarray(f_out), t_out.numpy(), atol=2e-5
    )
    # the reference's sub slot is a copy of the main output at inference
    np.testing.assert_allclose(np.asarray(f_out_sub), t_out_sub.numpy(),
                               atol=2e-5)


def test_port_diffnet_denoiser(ref_models):
    """GaussianDiffusion's DiffNet denoiser weights port with exact
    forward parity (VERDICT round-1 item 8; layout torch (B,1,M,T) vs
    flax (B,T,M))."""
    import jax
    import jax.numpy as jnp
    import torch

    from nnsvs.diffsinger.denoiser import DiffNet as TDiffNet

    from ensemble_svs_with_interactions_tpu.models.diffsinger import DiffNet
    from ensemble_svs_with_interactions_tpu.utils.torch_port import torch_to_flax

    torch.manual_seed(5)
    kw = dict(in_dim=6, encoder_hidden_dim=5, residual_layers=3,
              residual_channels=8, dilation_cycle_length=2)
    tm = TDiffNet(**kw).eval()
    fm = DiffNet(**kw)
    B, T = 2, 10
    fv = fm.init(
        jax.random.PRNGKey(0),
        jnp.zeros((B, T, 6)), jnp.zeros((B,), jnp.int32),
        jnp.zeros((B, T, 5)),
    )
    pv, n = torch_to_flax(
        {k: v.numpy() for k, v in tm.state_dict().items()}, fv
    )
    assert n >= 14
    rng = np.random.default_rng(3)
    spec = rng.normal(size=(B, T, 6)).astype(np.float32)
    cond = rng.normal(size=(B, T, 5)).astype(np.float32)
    step = np.array([3, 17], np.int64)
    with torch.no_grad():
        t_out = tm(
            torch.from_numpy(np.moveaxis(spec, 1, 2)[:, None]),  # (B,1,M,T)
            torch.from_numpy(step),
            torch.from_numpy(np.moveaxis(cond, 1, 2)),           # (B,E,T)
        )[:, 0]
    f_out = fm.apply(pv, jnp.asarray(spec), jnp.asarray(step),
                     jnp.asarray(cond))
    np.testing.assert_allclose(
        np.asarray(f_out), np.moveaxis(t_out.numpy(), 1, 2), atol=2e-5
    )


def test_port_ar_decoder_reduction_multidim(ref_models):
    """reduction_factor>1 AND out_dim>1: the feat_out flat unit layout is
    (dim, step) in the reference (view(B, out_dim, r)); ported weights
    must reproduce the forward exactly (would be silently garbled with a
    (step, dim) reshape)."""
    import jax
    import jax.numpy as jnp
    import torch

    from nnsvs.acoustic_models import (
        BiLSTMResF0NonAttentiveDecoder as TModel,
    )

    from ensemble_svs_with_interactions_tpu.models.acoustic import (
        BiLSTMResF0NonAttentiveDecoder as FModel,
    )
    from ensemble_svs_with_interactions_tpu.utils.torch_port import torch_to_flax

    torch.manual_seed(11)
    kw = dict(
        in_dim=12, ff_hidden_dim=8, conv_hidden_dim=6, lstm_hidden_dim=4,
        num_lstm_layers=1, out_dim=3, decoder_layers=1, decoder_hidden_dim=8,
        prenet_layers=1, prenet_hidden_dim=4, prenet_dropout=0.0,
        zoneout=0.0, reduction_factor=2, in_lf0_idx=3, out_lf0_idx=0,
        in_lf0_min=5.0, in_lf0_max=6.5, out_lf0_mean=5.9, out_lf0_scale=0.23,
        downsample_by_conv=False,
    )
    tm = TModel(**kw).eval()
    fm = FModel(**kw)
    fv = fm.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "prenet": jax.random.PRNGKey(2), "zoneout": jax.random.PRNGKey(3)},
        jnp.zeros((1, 8, 12)), jnp.asarray([8]), jnp.zeros((1, 8, 3)),
        train=True,
    )
    pv, _ = torch_to_flax(
        {k: v.numpy() for k, v in tm.state_dict().items()}, fv
    )
    x = np.random.default_rng(3).normal(size=(1, 8, 12)).astype(np.float32)
    y = np.random.default_rng(4).normal(size=(1, 8, 3)).astype(np.float32)
    with torch.no_grad():
        t_out, t_res = tm(torch.from_numpy(x), [8], torch.from_numpy(y))
    f_out, f_res = fm.apply(
        pv, jnp.asarray(x), jnp.asarray([8]), jnp.asarray(y),
        rngs={"prenet": jax.random.PRNGKey(9),
              "zoneout": jax.random.PRNGKey(10)},
    )
    np.testing.assert_allclose(np.asarray(f_out), t_out.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(f_res), t_res.numpy(), atol=1e-6)


def test_port_mdn_ar_decoder_dim_wise(ref_models):
    """MDN AR decoder: the reference head is MDNLayer(dim_wise=True) —
    per-dimension mixture weights; ported weights must reproduce the
    teacher-forced (log_pi, log_sigma, mu) and residuals."""
    import jax
    import jax.numpy as jnp
    import torch

    from nnsvs.acoustic_models import (
        MDNResF0NonAttentiveDecoder as TModel,
    )

    from ensemble_svs_with_interactions_tpu.models.acoustic import (
        MDNResF0NonAttentiveDecoder as FModel,
    )
    from ensemble_svs_with_interactions_tpu.utils.torch_port import torch_to_flax

    torch.manual_seed(13)
    kw = dict(
        in_dim=12, out_dim=2, layers=1, hidden_dim=8,
        prenet_layers=1, prenet_hidden_dim=4, prenet_dropout=0.0,
        zoneout=0.0, reduction_factor=2, num_gaussians=2,
        in_lf0_idx=3, out_lf0_idx=0,
        in_lf0_min=5.0, in_lf0_max=6.5, out_lf0_mean=5.9, out_lf0_scale=0.23,
        downsample_by_conv=False,
    )
    tm = TModel(**kw).eval()
    fm = FModel(**kw)
    fv = fm.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "prenet": jax.random.PRNGKey(2), "zoneout": jax.random.PRNGKey(3)},
        jnp.zeros((1, 8, 12)), jnp.asarray([8]), jnp.zeros((1, 8, 2)),
        train=True,
    )
    pv, _ = torch_to_flax(
        {k: v.numpy() for k, v in tm.state_dict().items()}, fv
    )
    x = np.random.default_rng(5).normal(size=(1, 8, 12)).astype(np.float32)
    y = np.random.default_rng(6).normal(size=(1, 8, 2)).astype(np.float32)
    with torch.no_grad():
        (t_pi, t_sig, t_mu), t_res = tm(
            torch.from_numpy(x), [8], torch.from_numpy(y)
        )
    (f_pi, f_sig, f_mu), f_res = fm.apply(
        pv, jnp.asarray(x), jnp.asarray([8]), jnp.asarray(y),
        rngs={"prenet": jax.random.PRNGKey(9),
              "zoneout": jax.random.PRNGKey(10)},
    )
    np.testing.assert_allclose(np.asarray(f_mu), t_mu.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(f_sig), t_sig.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(f_pi), t_pi.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(f_res), t_res.numpy(), atol=1e-6)


def test_port_transformer_encoder(ref_models):
    """Post-LN + windowed relative-position attention parity: a ported
    reference TransformerEncoder reproduces the torch forward."""
    import jax
    import jax.numpy as jnp
    import torch

    from ensemble_svs_with_interactions_tpu.models import TransformerEncoder
    from ensemble_svs_with_interactions_tpu.utils.torch_port import (
        torch_to_flax,
        transformer_scope_pairs,
    )

    torch.manual_seed(7)
    kw = dict(
        in_dim=10, out_dim=4, hidden_dim=8, attention_dim=12,
        num_heads=2, num_layers=2, kernel_size=3, dropout=0.0,
    )
    tm = ref_models.TransformerEncoder(**kw).eval()
    fm = TransformerEncoder(**kw)
    x = np.random.default_rng(7).normal(size=(2, 11, 10)).astype(np.float32)
    fv = fm.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros(x.shape, jnp.float32),
        jnp.asarray([11, 11]),
    )
    pv, n = torch_to_flax(
        {k: v.numpy() for k, v in tm.state_dict().items()},
        fv,
        scope_pairs=transformer_scope_pairs(2),
    )
    with torch.no_grad():
        t_out = tm(torch.from_numpy(x), torch.tensor([11, 11]))
    f_out = fm.apply(pv, jnp.asarray(x), jnp.asarray([11, 11]))
    np.testing.assert_allclose(np.asarray(f_out), t_out.numpy(), atol=1e-5)


@pytest.mark.isolate  # big attention compile; crashed the long process at ~275 tests
def test_port_fftblocks_encoder(ref_models):
    """fs2 FFT-block encoder parity: reversed positional encoding with
    alpha, pre-norm attention (combined qkv, no bias), gelu conv FFN.
    Both reduction factors (1 and 4) run in ONE isolated subprocess —
    splitting them parametrized paid the pytest+jax+torch import bill
    twice (~20 s) for the same assertion surface (suite diet 2026-08-21)."""
    import jax
    import jax.numpy as jnp
    import torch

    from ensemble_svs_with_interactions_tpu.models.diffsinger import (
        FFTBlocksEncoder,
    )
    from ensemble_svs_with_interactions_tpu.utils.torch_port import torch_to_flax
    from nnsvs.diffsinger.fs2 import FFTBlocksEncoder as TorchFFT

    for reduction_factor in (1, 4):
        torch.manual_seed(11)
        tm = TorchFFT(
            in_dim=10, out_dim=4, hidden_dim=8, num_layers=2,
            ffn_kernel_size=3, num_heads=2, dropout=0.0,
            reduction_factor=reduction_factor, downsample_by_conv=True,
        ).eval()
        fm = FFTBlocksEncoder(
            in_dim=10, out_dim=4, hidden_dim=8, num_layers=2,
            kernel_size=3, num_heads=2, dropout=0.0,
            reduction_factor=reduction_factor, downsample_by_conv=True,
        )
        T = 12
        x = np.random.default_rng(11).normal(size=(2, T, 10)).astype(np.float32)
        fv = fm.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            jnp.zeros(x.shape, jnp.float32),
            jnp.asarray([T, T]),
        )
        pv, n = torch_to_flax(
            {k: v.numpy() for k, v in tm.state_dict().items()}, fv
        )
        with torch.no_grad():
            t_out = tm(torch.from_numpy(x), torch.tensor([T, T]))
        f_out = fm.apply(pv, jnp.asarray(x), jnp.asarray([T, T]))
        np.testing.assert_allclose(
            np.asarray(f_out), t_out.numpy(), atol=1e-5, rtol=1e-4,
            err_msg=f"reduction_factor={reduction_factor}",
        )


def test_port_conv1d_resnet_sar(ref_models):
    """Shallow-AR port: FIR taps come across un-flipped and the inverse
    IIR inference matches the torch implementation."""
    import jax
    import jax.numpy as jnp
    import torch

    from ensemble_svs_with_interactions_tpu.models import Conv1dResnetSAR
    from ensemble_svs_with_interactions_tpu.utils.torch_port import torch_to_flax

    torch.manual_seed(13)
    kw = dict(
        in_dim=8, hidden_dim=6, out_dim=5, num_layers=2,
        stream_sizes=[3, 2], ar_orders=[2, 3],
    )
    tm = ref_models.Conv1dResnetSAR(**kw).eval()
    fm = Conv1dResnetSAR(**kw)
    T = 10
    x = np.random.default_rng(13).normal(size=(1, T, 8)).astype(np.float32)
    y = np.random.default_rng(14).normal(size=(1, T, 5)).astype(np.float32)
    fv = fm.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros(x.shape, jnp.float32),
        jnp.asarray([T]),
    )
    pv, n = torch_to_flax(
        {k: v.numpy() for k, v in tm.state_dict().items()}, fv
    )
    with torch.no_grad():
        t_pre = tm.preprocess_target(torch.from_numpy(y))
        t_inf = tm.inference(torch.from_numpy(x), [T])
    f_pre = fm.apply(pv, jnp.asarray(y), method="preprocess_target")
    f_inf = fm.apply(pv, jnp.asarray(x), jnp.asarray([T]), method="inference")
    np.testing.assert_allclose(np.asarray(f_pre), t_pre.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(f_inf), t_inf.numpy(), atol=1e-4)


def test_port_multistream_conv2d_postfilter(ref_models):
    """MultistreamConv2dPostFilter: the low/mid/high band split with
    one-sided reflection padding must match the reference bit-near-exactly
    (postfilters.py:371-559).  noise_scale=0 makes the forward
    deterministic so outputs are directly comparable."""
    import jax
    import jax.numpy as jnp
    import torch

    from nnsvs.postfilters import MultistreamConv2dPostFilter as TModel

    from ensemble_svs_with_interactions_tpu.models.postfilters import (
        MultistreamConv2dPostFilter as FModel,
    )
    from ensemble_svs_with_interactions_tpu.utils.torch_port import torch_to_flax

    torch.manual_seed(21)
    kw = dict(channels=3, kernel_size=5, noise_scale=0.0,
              stream_sizes=(4, 6, 8))
    tm = TModel(**kw).eval()
    fm = FModel(**kw)
    x = np.random.default_rng(22).normal(size=(1, 12, 18)).astype(np.float32)
    fv = fm.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        jnp.asarray(x),
    )
    pv, _ = torch_to_flax(
        {k: v.numpy() for k, v in tm.state_dict().items()}, fv
    )
    with torch.no_grad():
        t_out = tm(torch.from_numpy(x))
    f_out = fm.apply(pv, jnp.asarray(x),
                     rngs={"noise": jax.random.PRNGKey(2)})
    assert f_out.shape == t_out.shape
    np.testing.assert_allclose(np.asarray(f_out), t_out.numpy(), atol=1e-5)


def test_port_conv2d_postfilter(ref_models):
    """Conv2dPostFilter with an asymmetric kernel: ported 2-D conv kernels
    must keep their spatial orientation (regression: 4-dim weights were
    matched as 'linear' and silently kh<->kw-transposed for square
    kernels, mismatched otherwise)."""
    import jax
    import jax.numpy as jnp
    import torch

    from nnsvs.postfilters import Conv2dPostFilter as TModel

    from ensemble_svs_with_interactions_tpu.models.postfilters import (
        Conv2dPostFilter as FModel,
    )
    from ensemble_svs_with_interactions_tpu.utils.torch_port import torch_to_flax

    torch.manual_seed(23)
    tm = TModel(in_dim=7, channels=3, kernel_size=(5, 3),
                noise_type="bin_wise", noise_scale=0.0).eval()
    fm = FModel(channels=3, kernel_size=(5, 3), noise_type="bin_wise",
                noise_scale=0.0)
    x = np.random.default_rng(24).normal(size=(1, 11, 7)).astype(np.float32)
    fv = fm.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        jnp.asarray(x),
    )
    pv, _ = torch_to_flax(
        {k: v.numpy() for k, v in tm.state_dict().items()}, fv
    )
    with torch.no_grad():
        t_out = tm(torch.from_numpy(x), [11])
    f_out = fm.apply(pv, jnp.asarray(x),
                     rngs={"noise": jax.random.PRNGKey(2)})
    np.testing.assert_allclose(np.asarray(f_out), t_out.numpy(), atol=1e-5)


# ------------------------------------------------------------------
# pretrained-registry download path (VERDICT r2 #6): a local HTTP server
# serves a real torch pack tarball; _download_and_port must fetch it,
# extract, port to flax, atomically install, and the result must
# synthesize. Interrupted/corrupt downloads must leave no torn cache
# state (pretrained.py:80-133).
# ------------------------------------------------------------------
def _build_torch_pack_tarball(ref_models, tmp_path):
    """A tiny published-style NNSVS pack (config.yaml + {phase}_model.yaml
    /.pth + npy scalers + qst.hed), tar.gz'd with the usual one nested
    directory, mirroring the reference's pretrained tarballs
    (reference svs.py:122-241 layout)."""
    import shutil
    import tarfile

    import torch
    import yaml

    src = tmp_path / "tiny_pack"
    src.mkdir()
    from tests.util import HED as _HED

    shutil.copyfile(_HED, src / "qst.hed")
    (src / "config.yaml").write_text(
        yaml.safe_dump(
            {
                "sample_rate": 24000,
                "frame_period": 5,
                "feature_type": "world",
                "use_world_codec": True,
                "relative_f0": False,
            }
        )
    )
    ss = [8, 1, 1, 3]
    torch.manual_seed(0)
    for phase, mean0 in (("timelag", 0.0), ("duration", 10.0)):
        netg = {
            "_target_": "nnsvs.model.MDN",
            "in_dim": 82, "hidden_dim": 8, "out_dim": 1,
            "num_layers": 1, "num_gaussians": 2,
        }
        (src / f"{phase}_model.yaml").write_text(
            yaml.safe_dump(
                {"netG": netg, "stream_sizes": [1],
                 "has_dynamic_features": [False], "num_windows": 1}
            )
        )
        tm = ref_models.MDN(
            in_dim=82, hidden_dim=8, out_dim=1, num_layers=1, num_gaussians=2
        )
        torch.save(tm.state_dict(), src / f"{phase}_model.pth")
        np.save(src / f"in_{phase}_scaler_min.npy", np.zeros(82))
        np.save(src / f"in_{phase}_scaler_scale.npy", np.ones(82))
        np.save(src / f"out_{phase}_scaler_mean.npy", np.full(1, mean0))
        np.save(src / f"out_{phase}_scaler_var.npy", np.full(1, 4.0))
        np.save(src / f"out_{phase}_scaler_scale.npy", np.full(1, 2.0))
    netg = {
        "_target_": "nnsvs.model.FFConvLSTM",
        "in_dim": 86, "ff_hidden_dim": 8, "conv_hidden_dim": 8,
        "lstm_hidden_dim": 4, "out_dim": sum(ss), "num_lstm_layers": 1,
    }
    (src / "acoustic_model.yaml").write_text(
        yaml.safe_dump(
            {"netG": netg, "stream_sizes": ss,
             "has_dynamic_features": [False] * 4, "num_windows": 1}
        )
    )
    tm = ref_models.FFConvLSTM(
        in_dim=86, ff_hidden_dim=8, conv_hidden_dim=8,
        lstm_hidden_dim=4, out_dim=sum(ss), num_lstm_layers=1,
    )
    torch.save(tm.state_dict(), src / "acoustic_model.pth")
    np.save(src / "in_acoustic_scaler_min.npy", np.zeros(86))
    np.save(src / "in_acoustic_scaler_scale.npy", np.ones(86))
    mean = np.zeros(sum(ss))
    mean[ss[0]] = np.log(220.0)
    np.save(src / "out_acoustic_scaler_mean.npy", mean)
    np.save(src / "out_acoustic_scaler_var.npy", np.full(sum(ss), 0.01))
    np.save(src / "out_acoustic_scaler_scale.npy", np.full(sum(ss), 0.1))

    tar_path = tmp_path / "tiny_pack.tar.gz"
    with tarfile.open(tar_path, "w:gz") as tf:
        tf.add(src, arcname="tiny_pack")
    return tar_path


def test_download_and_port_end_to_end(ref_models, tmp_path, monkeypatch):
    import threading
    from functools import partial
    from http.server import SimpleHTTPRequestHandler, ThreadingHTTPServer

    import tarfile

    from ensemble_svs_with_interactions_tpu import pretrained

    tarball = _build_torch_pack_tarball(ref_models, tmp_path)
    (tmp_path / "bad.tar.gz").write_bytes(b"this is not a gzip stream")

    handler = partial(SimpleHTTPRequestHandler, directory=str(tmp_path))
    server = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{server.server_port}"
    cache = tmp_path / "cache"
    monkeypatch.setattr(pretrained, "DEFAULT_CACHE_DIR", cache)
    name = "testorg/tiny_dl"
    try:
        # corrupt tarball: the failure must clean every staging artifact
        monkeypatch.setitem(
            pretrained.model_registry, name,
            {"url": f"{base}/bad.tar.gz", "_target_": None, "format": "torch"},
        )
        with pytest.raises(tarfile.ReadError):
            pretrained.retrieve_pretrained_model(name)
        leftovers = sorted(p.name for p in cache.iterdir())
        assert leftovers == [], leftovers
        assert not pretrained.is_pretrained_model_ready(name)

        # missing file: urlretrieve's HTTPError must clean up too
        monkeypatch.setitem(
            pretrained.model_registry, name,
            {"url": f"{base}/nope.tar.gz", "_target_": None, "format": "torch"},
        )
        import urllib.error

        with pytest.raises(urllib.error.HTTPError):
            pretrained.retrieve_pretrained_model(name)
        assert sorted(p.name for p in cache.iterdir()) == []

        # the real pack: download -> extract -> torch->flax port -> install
        monkeypatch.setitem(
            pretrained.model_registry, name,
            {"url": f"{base}/tiny_pack.tar.gz", "_target_": None,
             "format": "torch"},
        )
        out = pretrained.retrieve_pretrained_model(name)
        assert out == cache / "testorg_tiny_dl"
        assert (out / "config.yaml").exists()
        assert (out / "acoustic_model.params").exists()
        assert not list(cache.glob("*.partial"))
        assert pretrained.is_pretrained_model_ready(name)
        # second retrieve resolves from cache (kill the server to prove it)
        server.shutdown()
        assert pretrained.retrieve_pretrained_model(name) == out

        # and the ported pack actually sings
        from ensemble_svs_with_interactions_tpu.io import hts
        from ensemble_svs_with_interactions_tpu.svs import SPSVS

        from tests.util import NIT_LAB

        labels = hts.load(NIT_LAB)
        n = next(i for i, e in enumerate(labels.end_times) if e > 4e7)
        engine = SPSVS(out)
        wav, sr = engine.svs(labels[: max(n, 10)], vocoder_type="world")
        assert sr == 24000
        assert np.abs(wav.astype(np.int64)).max() > 0
    finally:
        server.shutdown()
