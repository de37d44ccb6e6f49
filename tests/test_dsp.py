"""DSP core tests: ERB filterbank, STFT/ISTFT round trip, norms, DF op.

Mirrors the reference's Rust unit-test strategy (SURVEY.md §4: STFT round
trip correlation > 1-1e-6, ERB width exactness, norm-state linspace inits)
plus offline-vs-streaming equivalence, which replaces the reference's
tract pulse validation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepfilternet_tpu.ops import (
    erb_widths,
    erb_fb_matrices,
    stft,
    istft,
    Stft,
    vorbis_window,
    erb_norm,
    unit_norm,
    get_norm_alpha,
    mean_norm_init,
    unit_norm_init,
    erb_feat,
    spec_feat,
    deep_filter_offline,
    post_filter,
)
from deepfilternet_tpu.ops.df_op import deep_filter
from deepfilternet_tpu.ops.features import apply_interp_band_gain, erb_band_energies
from deepfilternet_tpu.ops.norms import erb_norm_step, unit_norm_step
from deepfilternet_tpu.ops.stft import (
    analysis_step,
    synthesis_step,
    frame_signal,
)


CFG = Stft(sr=48000, fft_size=960, hop_size=480)


class TestErb:
    def test_widths_cover_all_bins(self):
        for min_nb in (1, 2):
            w = erb_widths(48000, 960, 32, min_nb)
            assert len(w) == 32
            assert sum(w) == 481
            assert min(w) >= min_nb
            # widths are monotone-ish: later (wider) bands are larger
            assert w[-1] > w[0]

    def test_widths_min_freqs_enforced(self):
        # With min 2, early narrow bands must be exactly 2 wide
        w = erb_widths(48000, 960, 32, 2)
        assert w[0] == 2
        # Known layout for the default config: first bands hug the minimum
        assert all(x >= 2 for x in w)

    def test_fb_matrices(self):
        w = erb_widths(48000, 960, 32, 2)
        fwd = erb_fb_matrices(w, normalized=True, inverse=False)
        inv = erb_fb_matrices(w, normalized=True, inverse=True)
        assert fwd.shape == (481, 32)
        assert inv.shape == (32, 481)
        np.testing.assert_allclose(fwd.sum(axis=0), np.ones(32), atol=1e-6)
        # inverse is pure broadcast (all ones within band)
        assert inv.max() == 1.0 and set(np.unique(inv)) == {0.0, 1.0}

    def test_gain_roundtrip(self):
        # Mirrors lib.rs:626-652: banded gains in/out
        w = erb_widths(48000, 960, 32, 2)
        gains = jnp.asarray(np.random.default_rng(0).uniform(0.1, 1.0, (4, 32)).astype(np.float32))
        spec = jnp.ones((4, 481), jnp.complex64)
        out = apply_interp_band_gain(spec, gains, w)
        # band mean of output magnitude == gain
        e = erb_band_energies(out, w, db=False)
        np.testing.assert_allclose(np.sqrt(np.asarray(e)), np.asarray(gains), rtol=1e-5)


class TestStft:
    def test_window_princen_bradley(self):
        w = vorbis_window(960)
        np.testing.assert_allclose(w[:480] ** 2 + w[480:] ** 2, 1.0, atol=1e-6)

    def test_roundtrip_correlation(self, rng):
        # transforms.rs:619-638 analog: corr > 1 - 1e-6 after delay removal
        x = rng.standard_normal((2, 48000)).astype(np.float32)
        spec = stft(jnp.asarray(x), CFG)
        y = np.asarray(istft(spec, CFG))
        d = CFG.delay
        a = x[:, : x.shape[1] - d]
        b = y[:, d:]
        corr = (a * b).sum() / np.sqrt((a * a).sum() * (b * b).sum())
        assert corr > 1 - 1e-6
        np.testing.assert_allclose(a, b, atol=1e-3)

    def test_shapes(self):
        x = jnp.zeros((3, 48000))
        spec = stft(x, CFG)
        assert spec.shape == (3, 100, 481)
        assert spec.dtype == jnp.complex64
        out = istft(spec, CFG)
        assert out.shape == (3, 48000)

    def test_offline_matches_streaming(self, rng):
        x = rng.standard_normal((1, 4800)).astype(np.float32)
        spec_off = np.asarray(stft(jnp.asarray(x), CFG))

        mem = jnp.zeros((1, CFG.delay))
        frames = jnp.asarray(x).reshape(1, -1, CFG.hop_size)

        def step(mem, frame):
            return analysis_step(mem, frame, CFG)

        _, spec_str = jax.lax.scan(step, mem, jnp.moveaxis(frames, 1, 0))
        spec_str = np.moveaxis(np.asarray(spec_str), 0, 1)
        np.testing.assert_allclose(spec_off, spec_str, atol=1e-5)

    def test_synthesis_streaming_matches_offline(self, rng):
        x = rng.standard_normal((1, 4800)).astype(np.float32)
        spec = stft(jnp.asarray(x), CFG)
        out_off = np.asarray(istft(spec, CFG))

        mem = jnp.zeros((1, CFG.delay))

        def step(mem, frame_spec):
            return synthesis_step(mem, frame_spec, CFG)

        _, out_str = jax.lax.scan(step, mem, jnp.moveaxis(spec, 1, 0))
        out_str = np.moveaxis(np.asarray(out_str), 0, 1).reshape(1, -1)
        np.testing.assert_allclose(out_off, out_str, atol=1e-5)

    def test_frame_alignment(self):
        # Frame i covers samples [(i+1)*hop - fft, (i+1)*hop)
        x = np.zeros(4800, np.float32)
        x[950] = 1.0  # in hop 1; visible in frames 1 and 2 only (fft=2*hop)
        fr = np.asarray(frame_signal(jnp.asarray(x), 960, 480))
        nz = sorted(set(np.nonzero(fr)[0].tolist()))
        assert nz == [1, 2]


class TestNorms:
    def test_alpha(self):
        a = get_norm_alpha(48000, 480, 1.0)
        assert 0.98 < a < 1.0
        assert a == round(a, 6)

    def test_state_inits(self):
        m = mean_norm_init(32)
        u = unit_norm_init(96)
        assert m[0] == -60.0 and m[-1] == -90.0
        np.testing.assert_allclose(u[0], 1e-3)
        np.testing.assert_allclose(u[-1], 1e-4)

    def test_erb_norm_matches_sequential(self, rng):
        x = rng.standard_normal((2, 50, 32)).astype(np.float32) * 20 - 60
        alpha = 0.99
        out = np.asarray(erb_norm(jnp.asarray(x), alpha))
        # naive sequential reference
        s = np.broadcast_to(mean_norm_init(32), (2, 32)).copy()
        exp = np.zeros_like(x)
        for t in range(50):
            s = x[:, t] * (1 - alpha) + s * alpha
            exp[:, t] = (x[:, t] - s) / 40.0
        np.testing.assert_allclose(out, exp, atol=1e-4)

    def test_unit_norm_matches_sequential(self, rng):
        xr = rng.standard_normal((1, 30, 96)).astype(np.float32)
        xi = rng.standard_normal((1, 30, 96)).astype(np.float32)
        x = xr + 1j * xi
        alpha = 0.98
        out = np.asarray(unit_norm(jnp.asarray(x), alpha))
        s = np.broadcast_to(unit_norm_init(96), (1, 96)).copy()
        exp = np.zeros_like(x)
        for t in range(30):
            s = np.abs(x[:, t]) * (1 - alpha) + s * alpha
            exp[:, t] = x[:, t] / np.sqrt(s)
        np.testing.assert_allclose(out, exp, atol=1e-4)

    def test_streaming_steps_match_scan(self, rng):
        x = rng.standard_normal((40, 32)).astype(np.float32)
        alpha = 0.95
        out_off = np.asarray(erb_norm(jnp.asarray(x), alpha, axis=0))
        s = jnp.asarray(mean_norm_init(32))
        outs = []
        for t in range(40):
            s, o = erb_norm_step(s, jnp.asarray(x[t]), alpha)
            outs.append(np.asarray(o))
        np.testing.assert_allclose(out_off, np.stack(outs), atol=1e-5)

        xc = (rng.standard_normal((40, 96)) + 1j * rng.standard_normal((40, 96))).astype(
            np.complex64
        )
        out_off = np.asarray(unit_norm(jnp.asarray(xc), alpha, axis=0))
        s = jnp.asarray(unit_norm_init(96))
        outs = []
        for t in range(40):
            s, o = unit_norm_step(s, jnp.asarray(xc[t]), alpha)
            outs.append(np.asarray(o))
        np.testing.assert_allclose(out_off, np.stack(outs), atol=1e-5)


class TestFeatures:
    def test_erb_feat_shape_and_scale(self, rng):
        spec = stft(jnp.asarray(rng.standard_normal((1, 48000)).astype(np.float32)), CFG)
        w = erb_widths(48000, 960, 32, 2)
        feat = erb_feat(spec, w, alpha=0.99)
        assert feat.shape == (1, 100, 32)
        assert np.all(np.isfinite(np.asarray(feat)))
        assert np.abs(np.asarray(feat)).max() < 10  # normalized features are small

    def test_spec_feat(self, rng):
        spec = stft(jnp.asarray(rng.standard_normal((1, 48000)).astype(np.float32)), CFG)
        feat = spec_feat(spec, 96, alpha=0.99)
        assert feat.shape == (1, 100, 96)
        assert feat.dtype == jnp.complex64


class TestDfOp:
    def test_identity_filter(self, rng):
        # coef with 1 at the current-frame tap reproduces the input
        spec = (rng.standard_normal((1, 20, 481)) + 1j * rng.standard_normal((1, 20, 481))).astype(
            np.complex64
        )
        order, nb_df = 5, 96
        coefs = np.zeros((1, order, 20, nb_df), np.complex64)
        coefs[:, order - 1] = 1.0  # newest tap (lookahead 0)
        out = np.asarray(deep_filter_offline(jnp.asarray(spec), jnp.asarray(coefs), nb_df))
        np.testing.assert_allclose(out, spec, atol=1e-6)

    def test_delay_filter(self, rng):
        spec = (rng.standard_normal((1, 20, 96)) + 1j * rng.standard_normal((1, 20, 96))).astype(
            np.complex64
        )
        coefs = np.zeros((1, 5, 20, 96), np.complex64)
        coefs[:, 3] = 1.0  # one-frame delay tap
        out = np.asarray(deep_filter_offline(jnp.asarray(spec), jnp.asarray(coefs), 96))
        np.testing.assert_allclose(out[:, 1:], spec[:, :-1], atol=1e-6)
        np.testing.assert_allclose(out[:, 0], 0, atol=1e-6)

    def test_streaming_matches_offline(self, rng):
        t, order, nb_df = 15, 5, 96
        spec = (rng.standard_normal((2, t, nb_df)) + 1j * rng.standard_normal((2, t, nb_df))).astype(
            np.complex64
        )
        coefs = (
            rng.standard_normal((2, order, t, nb_df)) + 1j * rng.standard_normal((2, order, t, nb_df))
        ).astype(np.complex64) * 0.3
        out_off = np.asarray(
            deep_filter_offline(jnp.asarray(spec), jnp.asarray(coefs), nb_df)
        )
        ring = jnp.zeros((2, order - 1, nb_df), jnp.complex64)
        outs = []
        for i in range(t):
            ring, y = deep_filter(ring, jnp.asarray(spec[:, i]), jnp.asarray(coefs[:, :, i]))
            outs.append(np.asarray(y))
        np.testing.assert_allclose(out_off, np.stack(outs, axis=1), atol=1e-5)


class TestPostFilter:
    def test_unity_gain_passthrough(self):
        x = jnp.ones((4, 8), jnp.complex64)
        out = np.asarray(post_filter(x, x, beta=0.02))
        # g=1 -> g_sin=sin(pi/2)=1 -> pf=1
        np.testing.assert_allclose(out, np.ones((4, 8)), atol=1e-6)

    def test_attenuates_low_gains(self):
        noisy = jnp.ones((1, 8), jnp.complex64)
        enh = jnp.full((1, 8), 0.2 + 0j, jnp.complex64)
        out = np.asarray(post_filter(noisy, enh, beta=0.02))
        assert np.all(np.abs(out) < 0.2)  # over-attenuation
