"""Tests for L2 primitives: MDN, MLPG, multistream, scalers, masks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ensemble_svs_with_interactions_tpu.ops import mdn, mlpg, multistream
from ensemble_svs_with_interactions_tpu.utils import (
    MinMaxScaler,
    StandardScaler,
    get_world_num_aperiodicities,
    get_world_stream_info,
    make_non_pad_mask,
    make_pad_mask,
)


# ---------------------------------------------------------------- MDN
@pytest.mark.parametrize("dim_wise", [False, True])
def test_mdn_shapes(dim_wise):
    B, T, Din, Dout, G = 4, 10, 8, 3, 5
    layer = mdn.MDNLayer(out_dim=Dout, num_gaussians=G, dim_wise=dim_wise)
    x = jnp.ones((B, T, Din))
    params = layer.init(jax.random.PRNGKey(0), x)
    log_pi, log_sigma, mu = layer.apply(params, x)
    if dim_wise:
        assert log_pi.shape == (B, T, G, Dout)
    else:
        assert log_pi.shape == (B, T, G)
    assert log_sigma.shape == (B, T, G, Dout)
    assert mu.shape == (B, T, G, Dout)
    # mixture weights normalized
    assert np.allclose(np.exp(np.asarray(log_pi)).sum(axis=2), 1.0, atol=1e-4)

    target = jnp.zeros((B, T, Dout))
    loss = mdn.mdn_loss(log_pi, log_sigma, mu, target)
    assert loss.shape == (B,)
    assert np.isfinite(np.asarray(loss)).all()

    sigma, mean = mdn.mdn_get_most_probable_sigma_and_mu(log_pi, log_sigma, mu)
    assert sigma.shape == (B, T, Dout) and mean.shape == (B, T, Dout)
    assert (np.asarray(sigma) > 0).all()

    sample = mdn.mdn_get_sample(jax.random.PRNGKey(1), log_pi, log_sigma, mu)
    assert sample.shape == (B, T, Dout)


def test_mdn_learns_inverse_function():
    """Behavioral test mirroring reference tests/test_mdn.py: a tiny MDN can
    fit a one-to-many inverse mapping and the loss decreases."""
    import optax
    from flax import linen as nn

    rng = np.random.default_rng(42)
    # y = x + 0.3 sin(2 pi x) + noise; learn p(x | y): one-to-many
    x_data = rng.uniform(0, 1, (1, 800, 1)).astype(np.float32)
    y_data = (
        x_data + 0.3 * np.sin(2 * np.pi * x_data)
        + rng.uniform(-0.1, 0.1, x_data.shape)
    ).astype(np.float32)

    class TinyMDN(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.tanh(nn.Dense(32)(x))
            return mdn.MDNLayer(out_dim=1, num_gaussians=8)(h)

    model = TinyMDN()
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(y_data))
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            log_pi, log_sigma, mu = model.apply(p, jnp.asarray(y_data))
            return jnp.mean(
                mdn.mdn_loss(log_pi, log_sigma, mu, jnp.asarray(x_data))
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    first_loss = None
    for i in range(200):
        params, opt_state, loss = step(params, opt_state)
        if first_loss is None:
            first_loss = float(loss)
    assert float(loss) < first_loss - 0.3


# ---------------------------------------------------------------- MLPG
def _dense_mlpg(means, variances, windows):
    """Dense reference implementation of MLPG for testing."""
    T = means.shape[0]
    W = len(windows)
    D = means.shape[1] // W
    coeffs = mlpg.window_coeffs(windows)
    out = np.zeros((T, D))
    for d in range(D):
        rows = []
        for w, full in enumerate(coeffs):
            half = (len(full) - 1) // 2
            Wm = np.zeros((T, T))
            for t in range(T):
                for j in range(-half, half + 1):
                    if 0 <= t + j < T:
                        Wm[t, t + j] = full[j + half]
            rows.append(Wm)
        Wfull = np.concatenate(rows, axis=0)  # (W*T, T)
        u = np.concatenate([means[:, w * D + d] for w in range(W)])
        p = np.concatenate([1.0 / variances[:, w * D + d] for w in range(W)])
        A = Wfull.T @ np.diag(p) @ Wfull
        b = Wfull.T @ (p * u)
        out[:, d] = np.linalg.solve(A, b)
    return out


@pytest.mark.parametrize("num_windows", [2, 3])
def test_mlpg_matches_dense_solve(rng, num_windows):
    T, D = 50, 4
    windows = mlpg.default_windows(num_windows)
    means = rng.normal(size=(T, num_windows * D)).astype(np.float64)
    variances = rng.uniform(0.5, 2.0, size=(T, num_windows * D))
    expected = _dense_mlpg(means, variances, windows)
    got = np.asarray(mlpg.mlpg(means, variances, windows))
    assert np.allclose(got, expected, atol=1e-4), np.abs(got - expected).max()


@pytest.mark.parametrize("num_windows", [2, 3])
def test_mlpg_scan_kernel_matches_dense_solve(rng, num_windows):
    """Device (jnp) inputs route to the jitted banded-Cholesky scan kernel
    (host NumPy inputs use LAPACK); pin the scan path to the dense solve."""
    import jax.numpy as jnp

    T, D = 50, 4
    windows = mlpg.default_windows(num_windows)
    means = rng.normal(size=(T, num_windows * D)).astype(np.float32)
    variances = rng.uniform(0.5, 2.0, size=(T, num_windows * D)).astype(np.float32)
    expected = _dense_mlpg(means.astype(np.float64), variances.astype(np.float64), windows)
    got = np.asarray(mlpg.mlpg(jnp.asarray(means), jnp.asarray(variances), windows))
    assert np.allclose(got, expected, atol=2e-3), np.abs(got - expected).max()


def test_mlpg_single_window_is_identity(rng):
    means = rng.normal(size=(20, 3))
    out = np.asarray(mlpg.mlpg(means, np.ones_like(means), 1))
    assert np.allclose(out, means)


def test_mlpg_global_variance(rng):
    T, D, W = 30, 2, 3
    windows = mlpg.default_windows(W)
    means = rng.normal(size=(T, W * D))
    gvar = rng.uniform(0.5, 2.0, size=(W * D,))
    got = np.asarray(mlpg.mlpg(means, gvar, windows))
    expected = _dense_mlpg(means, np.tile(gvar, (T, 1)), windows)
    assert np.allclose(got, expected, atol=1e-4)


def test_mlpg_recovers_smooth_trajectory(rng):
    """MLPG on consistent static+delta observations recovers the trajectory."""
    T, D = 80, 2
    t = np.linspace(0, 4 * np.pi, T)
    y = np.stack([np.sin(t), np.cos(t / 2)], axis=1)
    windows = mlpg.default_windows(3)
    means = mlpg.apply_delta_windows(y, windows)
    var = np.ones_like(means) * 0.01
    got = np.asarray(mlpg.mlpg(means, var, windows))
    assert np.abs(got - y)[3:-3].max() < 0.05


def test_apply_delta_windows(rng):
    x = rng.normal(size=(10, 2))
    out = mlpg.apply_delta_windows(x, mlpg.default_windows(3))
    assert out.shape == (10, 6)
    assert np.allclose(out[:, :2], x)
    # delta of interior frames
    assert np.allclose(out[5, 2:4], 0.5 * (x[6] - x[4]))
    assert np.allclose(out[5, 4:6], x[6] - 2 * x[5] + x[4])


# ---------------------------------------------------------------- streams
def test_split_select_streams(rng):
    x = rng.normal(size=(2, 7, 63 + 1 + 1 + 5)).astype(np.float32)
    streams = multistream.split_streams(x, [63, 1, 1, 5])
    assert [s.shape[-1] for s in streams] == [63, 1, 1, 5]
    sel = multistream.select_streams(x, [63, 1, 1, 5], [True, False, False, True])
    assert sel.shape[-1] == 68
    assert np.allclose(sel[..., :63], x[..., :63])
    assert np.allclose(sel[..., 63:], x[..., 65:])


def test_static_stream_sizes():
    sizes = multistream.get_static_stream_sizes(
        [180, 3, 1, 15], [True, True, False, True], 3
    )
    assert list(sizes) == [60, 1, 1, 5]


def test_get_static_features(rng):
    x = rng.normal(size=(2, 7, 199)).astype(np.float32)
    feats = multistream.get_static_features(
        x, 3, [180, 3, 1, 15], [True, True, False, True]
    )
    assert [f.shape[-1] for f in feats] == [60, 1, 1, 5]
    assert np.allclose(feats[0], x[..., :60])


def test_multi_stream_mlpg(rng):
    T = 40
    stream_sizes = [9, 3, 1, 6]
    has_dyn = [True, True, False, True]
    x = rng.normal(size=(T, sum(stream_sizes)))
    var = rng.uniform(0.5, 1.5, size=(sum(stream_sizes),))
    windows = mlpg.default_windows(3)
    out = multistream.multi_stream_mlpg(x, var, windows, stream_sizes, has_dyn)
    assert out.shape == (T, 3 + 1 + 1 + 2)
    with pytest.raises(RuntimeError):
        multistream.multi_stream_mlpg(x, var, windows, [10, 3, 1, 6], has_dyn)


# ---------------------------------------------------------------- scalers
def test_standard_scaler_roundtrip(rng):
    x = rng.normal(loc=3.0, scale=2.0, size=(100, 5))
    sc = StandardScaler().fit(x)
    z = sc.transform(x)
    assert np.allclose(z.mean(axis=0), 0.0, atol=1e-8)
    assert np.allclose(z.std(axis=0), 1.0, atol=1e-6)
    assert np.allclose(sc.inverse_transform(z), x)


def test_standard_scaler_partial_fit_matches_full(rng):
    x = rng.normal(size=(90, 4))
    full = StandardScaler().fit(x)
    part = StandardScaler()
    for chunk in np.split(x, 3):
        part.partial_fit(chunk)
    assert np.allclose(part.mean_, full.mean_)
    assert np.allclose(part.var_, full.var_, atol=1e-10)


def test_minmax_scaler(rng):
    x = rng.uniform(-5, 5, size=(50, 3))
    sc = MinMaxScaler().fit(x)
    z = sc.transform(x)
    assert z.min() >= -1e-9 and z.max() <= 1 + 1e-9
    assert np.allclose(sc.inverse_transform(z), x)


# ---------------------------------------------------------------- misc
def test_masks():
    m = make_pad_mask([3, 5], maxlen=6)
    assert m.shape == (2, 6)
    assert np.asarray(m)[0].tolist() == [False] * 3 + [True] * 3
    nm = make_non_pad_mask([3, 5], maxlen=6)
    assert bool((np.asarray(nm) == ~np.asarray(m)).all())


def test_world_stream_info():
    assert get_world_num_aperiodicities(48000) == 5
    assert get_world_num_aperiodicities(24000) == 3
    assert get_world_stream_info(48000, 59, 3) == [180, 3, 1, 15]
    assert get_world_stream_info(48000, 59, 3, vibrato_mode="sine") == [
        180, 3, 1, 15, 9, 1,
    ]


def test_freqt_matrix_matches_scalar_recursion():
    """The cached matrix form of the Oppenheim frequency-warping recursion
    must match the direct scalar recursion (_freqt_single pins it)."""
    from ensemble_svs_with_interactions_tpu.ops.sptk import (
        _freqt_single,
        freqt_matrix,
    )

    rng = np.random.default_rng(0)
    for in_len, order, alpha in ((25, 12, 0.41), (41, 24, 0.554), (8, 8, -0.3)):
        A = freqt_matrix(in_len, order, alpha)
        c = rng.normal(size=in_len)
        np.testing.assert_allclose(c @ A.T, _freqt_single(c, order, alpha),
                                   rtol=1e-10, atol=1e-12)


# ------------------------------------------------------------------ praat
class TestPraatPitch:
    """Boersma-1993 windowed-ACF extractor (ops/praat.py) — the algorithm
    behind the reference's parselmouth f0_extractor."""

    FS = 24000

    def _harmonic(self, f0=220.0, dur=1.0, n_harm=8):
        t = np.arange(int(self.FS * dur)) / self.FS
        x = np.zeros_like(t)
        for k in range(1, n_harm + 1):
            x += np.sin(2 * np.pi * k * f0 * t) / k
        return 0.3 * x / np.abs(x).max()

    def test_pure_tone_accuracy(self):
        from ensemble_svs_with_interactions_tpu.ops.praat import sound_to_pitch_ac

        x = self._harmonic(220.0)
        f0, ta = sound_to_pitch_ac(x, self.FS, 0.005, 100.0, 500.0,
                                   voicing_threshold=0.6)
        v = f0 > 0
        assert v[5:-5].all()
        err = np.abs(f0[v] - 220.0) / 220.0
        assert np.median(err) < 1e-3  # sub-0.1% (parabolic interpolation)

    def test_silence_and_noise_unvoiced(self):
        from ensemble_svs_with_interactions_tpu.ops.praat import sound_to_pitch_ac

        f0s, _ = sound_to_pitch_ac(np.zeros(self.FS), self.FS, 0.005, 100, 500)
        assert (f0s == 0).all()
        rng = np.random.default_rng(0)
        f0n, _ = sound_to_pitch_ac(0.1 * rng.normal(size=self.FS), self.FS,
                                   0.005, 100, 500, voicing_threshold=0.6)
        assert (f0n > 0).mean() < 0.05

    def test_chirp_tracking(self):
        from ensemble_svs_with_interactions_tpu.ops.praat import sound_to_pitch_ac

        t = np.arange(self.FS) / self.FS
        f_inst = 150.0 * 2 ** t  # one octave per second
        phase = np.cumsum(2 * np.pi * f_inst / self.FS)
        x = np.sin(phase) + 0.3 * np.sin(2 * phase)
        f0, ta = sound_to_pitch_ac(x, self.FS, 0.005, 100.0, 500.0)
        v = f0 > 0
        expect = 150.0 * 2 ** ta
        assert v[5:-5].all()
        assert np.median(np.abs(f0[v] - expect[v]) / expect[v]) < 5e-3

    def test_frame_count_matches_world_convention(self):
        from ensemble_svs_with_interactions_tpu.ops import world
        from ensemble_svs_with_interactions_tpu.ops.praat import sound_to_pitch_ac

        x = self._harmonic(dur=0.73)
        f0p, _ = sound_to_pitch_ac(x, self.FS, 0.005, 100, 500)
        f0d, _ = world.dio(x, self.FS, frame_period=5.0, f0_floor=100, f0_ceil=500)
        assert len(f0p) == len(f0d)

    def test_noise_modulated_frames_disagree_with_dio(self):
        """Under heavy amplitude-modulated additive noise the window-ACF
        normalization keeps praat's track accurate; dio's NCCF front end
        must diverge from it on some frames (the estimators are really
        different algorithms, not aliases)."""
        from ensemble_svs_with_interactions_tpu.ops import world
        from ensemble_svs_with_interactions_tpu.ops.praat import sound_to_pitch_ac

        rng = np.random.default_rng(1)
        x = self._harmonic(180.0, dur=1.5)
        t = np.arange(len(x)) / self.FS
        # noise bursts modulated at 7 Hz, ~0 dB SNR at the peaks
        burst = 0.5 * (1 + np.sin(2 * np.pi * 7 * t))
        noisy = x + 0.3 * burst * rng.normal(size=len(x))
        f0p, _ = sound_to_pitch_ac(noisy, self.FS, 0.005, 100.0, 500.0,
                                   voicing_threshold=0.6)
        f0d, ta = world.dio(noisy, self.FS, frame_period=5.0,
                            f0_floor=100.0, f0_ceil=500.0,
                            voicing_threshold=0.6)
        f0d = world.stonemask(noisy, f0d, ta, self.FS)
        vp = f0p > 0
        # praat stays accurate through the bursts
        assert np.median(np.abs(f0p[vp] - 180.0) / 180.0) < 0.02
        # and the two trackers genuinely disagree somewhere (voicing or
        # value) — this fixture failed when parselmouth was a dio alias
        n = min(len(f0p), len(f0d))
        diff = np.abs(f0p[:n] - f0d[:n]) > 1.0
        assert diff.mean() > 0.02

    def test_octave_cost_prefers_upper_octave(self):
        """Alternating-amplitude pulse train: energy at both 110 Hz and
        220 Hz periodicity; praat's octave cost picks the upper octave
        when the subharmonic correlation advantage is marginal."""
        from ensemble_svs_with_interactions_tpu.ops.praat import sound_to_pitch_ac

        t = np.arange(self.FS) / self.FS
        x = np.zeros_like(t)
        for k in range(1, 10):
            amp = 1.0 / k
            x += amp * np.sin(2 * np.pi * k * 220.0 * t)
        # a faint 110 Hz subharmonic component
        x += 0.05 * np.sin(2 * np.pi * 110.0 * t)
        x *= 0.3 / np.abs(x).max()
        f0, _ = sound_to_pitch_ac(x, self.FS, 0.005, 80.0, 500.0)
        v = f0 > 0
        assert np.median(f0[v]) > 200.0  # not dragged to 110

    def test_voicing_threshold_monotone(self):
        from ensemble_svs_with_interactions_tpu.ops.praat import sound_to_pitch_ac

        rng = np.random.default_rng(2)
        x = self._harmonic(200.0) * 0.02 + 0.02 * rng.normal(size=self.FS)
        voiced = []
        for vt in (0.3, 0.6, 0.9):
            f0, _ = sound_to_pitch_ac(x, self.FS, 0.005, 100, 500,
                                      voicing_threshold=vt)
            voiced.append((f0 > 0).mean())
        assert voiced[0] >= voiced[1] >= voiced[2]
