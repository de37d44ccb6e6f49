"""Numerical loss-parity tests against the REAL reference df/loss.py.

VERDICT r04 top item: the inference identity is proven (converter proofs,
layer parity, streaming==offline) but the training signal was only
self-consistency-tested. These tests drive identical random inputs through
our jittable losses and the reference's torch loss modules
(df/loss.py:95-342, 651-804) instantiated from the actual reference
package, and assert allclose at f32 tolerance — including:

  * the gamma-compressed / under-estimation-weighted SpectralLoss branches,
  * MultiResSpecLoss incl. the complex term,
  * MaskLoss with the production power/factor schedule [2,4]/[1,10],
    all mask target fns, f_under weighting and max_bin masking,
  * MaskSpecLoss, DfAlphaLoss, SiSdr/SdrLoss/SegSdrLoss, LocalSnrLoss,
  * the LocalSnrTarget ground-truth path (df/modules.py:816-876),
  * the reference trainer's normalized torch.istft TD reconstruction
    (df/loss.py:66-92) vs our `loss_istft`,
  * the full `Loss` aggregate under a config exercising every term.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests._torch_ref import load_reference_df, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not present"
)

B, T, F = 2, 40, 481
NB_ERB, NB_DF = 32, 96


@pytest.fixture(scope="module")
def ref():
    """(torch, df.loss module, reference config, DF state) tuple."""
    load_reference_df()
    import torch

    import df.loss as ref_loss
    from df.config import config as ref_config
    from df.model import ModelParams

    import deepfilternet_tpu.libdf_compat as libdf

    p = ModelParams()
    state = libdf.DF(
        sr=p.sr, fft_size=p.fft_size, hop_size=p.hop_size,
        nb_bands=p.nb_erb, min_nb_erb_freqs=p.min_nb_freqs,
    )
    return torch, ref_loss, ref_config, state


def _spec_np(rng, shape=(B, T, F), scale=0.1):
    return (
        rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    ).astype(np.complex64) * scale


def _t(torch, x):
    if np.iscomplexobj(x):
        return torch.from_numpy(x)
    return torch.from_numpy(np.ascontiguousarray(x))


class TestMaskTargetFns:
    def test_wg_irm_iam(self, ref, rng):
        torch, ref_loss, _, _ = ref
        from deepfilternet_tpu.train.loss import iam, irm, wg

        s = _spec_np(rng)
        x = s + _spec_np(rng, scale=0.05)
        for ours, theirs in ((wg, ref_loss.wg), (irm, ref_loss.irm), (iam, ref_loss.iam)):
            got = np.asarray(ours(jnp.asarray(s), jnp.asarray(x)))
            exp = theirs(_t(torch, s), _t(torch, x)).numpy()
            np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-6,
                                       err_msg=ours.__name__)


class TestSpectralLoss:
    @pytest.mark.parametrize("gamma,f_m,f_c,f_u", [
        (1.0, 1.0, 0.0, 1.0),
        (1.0, 1e4, 1e4, 1.0),
        (0.6, 1e4, 1e4, 1.0),
        (0.6, 1e4, 0.0, 10.0),
        (0.3, 2e4, 5e3, 2.0),
    ])
    def test_matches_reference(self, ref, rng, gamma, f_m, f_c, f_u):
        torch, ref_loss, _, _ = ref
        from deepfilternet_tpu.train.loss import spectral_loss

        c = _spec_np(rng)
        e = c * 0.8 + _spec_np(rng, scale=0.03)
        mod = ref_loss.SpectralLoss(
            gamma=gamma, factor_magnitude=f_m, factor_complex=f_c, factor_under=f_u
        )
        exp = float(mod(_t(torch, e), _t(torch, c)))
        got = float(spectral_loss(
            jnp.asarray(e), jnp.asarray(c), gamma=gamma, factor_magnitude=f_m,
            factor_complex=f_c, factor_under=f_u,
        ))
        assert got == pytest.approx(exp, rel=2e-4), (got, exp)


class TestMultiResSpecLoss:
    @pytest.mark.parametrize("gamma,f,f_c", [
        (1.0, 500.0, 0.0),
        (0.6, 500.0, 500.0),
        (0.3, 1000.0, 250.0),
    ])
    def test_matches_reference(self, ref, rng, gamma, f, f_c):
        torch, ref_loss, _, _ = ref
        from deepfilternet_tpu.train.loss import multi_res_spec_loss

        e_td = rng.standard_normal((B, 19200)).astype(np.float32) * 0.1
        c_td = (e_td + rng.standard_normal((B, 19200)).astype(np.float32) * 0.02)
        mod = ref_loss.MultiResSpecLoss(
            n_ffts=[512, 1024, 2048], gamma=gamma, factor=f,
            f_complex=f_c if f_c > 0 else None,
        )
        exp = float(mod(_t(torch, e_td), _t(torch, c_td)))
        got = float(multi_res_spec_loss(
            jnp.asarray(e_td), jnp.asarray(c_td), (512, 1024, 2048),
            gamma=gamma, factor=f, factor_complex=f_c,
        ))
        assert got == pytest.approx(exp, rel=2e-4), (got, exp)


class TestMaskLoss:
    def _erb_fb(self):
        from deepfilternet_tpu.ops import erb_fb_matrices, erb_widths

        widths = erb_widths(48000, 960, NB_ERB, 2)
        return jnp.asarray(erb_fb_matrices(tuple(widths), True, False))

    @pytest.mark.parametrize("mask", ["iam", "wg", "irm"])
    def test_matches_reference(self, ref, rng, mask):
        torch, ref_loss, _, state = ref
        from deepfilternet_tpu.train.loss import mask_loss

        clean = _spec_np(rng)
        noisy = clean + _spec_np(rng, scale=0.05)
        pred = rng.random((B, T, NB_ERB)).astype(np.float32)
        mod = ref_loss.MaskLoss(
            state, mask=mask, gamma=0.6, gamma_pred=0.6,
            powers=[2, 4], factors=[1, 10], f_under=2.0, factor=1.0,
        )
        exp = float(mod(
            input=_t(torch, pred[:, None]),
            clean=_t(torch, clean[:, None]),
            noisy=_t(torch, noisy[:, None]),
        ))
        got = float(mask_loss(
            jnp.asarray(pred), jnp.asarray(clean), jnp.asarray(noisy),
            self._erb_fb(), mask=mask, gamma=0.6, gamma_pred=0.6,
            powers=(2, 4), factors=(1.0, 10.0), f_under=2.0, factor=1.0,
        ))
        assert got == pytest.approx(exp, rel=2e-4), (got, exp)

    def test_max_bin(self, ref, rng):
        torch, ref_loss, _, state = ref
        from deepfilternet_tpu.train.loss import mask_loss

        clean = _spec_np(rng)
        noisy = clean + _spec_np(rng, scale=0.05)
        pred = rng.random((B, T, NB_ERB)).astype(np.float32)
        max_bins = [20, 28]
        mod = ref_loss.MaskLoss(
            state, mask="iam", gamma=0.6, powers=[2, 4], factors=[1, 10],
            f_under=2.0,
        )
        exp = float(mod(
            input=_t(torch, pred[:, None]),
            clean=_t(torch, clean[:, None]),
            noisy=_t(torch, noisy[:, None]),
            max_bin=torch.tensor(max_bins),
        ))
        mbm = np.ones((B, 1, NB_ERB), np.float32)
        for i, mb in enumerate(max_bins):
            mbm[i, :, mb:] = 0.0
        got = float(mask_loss(
            jnp.asarray(pred), jnp.asarray(clean), jnp.asarray(noisy),
            self._erb_fb(), mask="iam", gamma=0.6, gamma_pred=0.6,
            powers=(2, 4), factors=(1.0, 10.0), f_under=2.0,
            max_bin_mask=jnp.asarray(mbm),
        ))
        assert got == pytest.approx(exp, rel=2e-4), (got, exp)


class TestDfAlphaLoss:
    def test_matches_reference(self, ref, rng):
        torch, ref_loss, _, _ = ref
        from deepfilternet_tpu.train.loss import df_alpha_loss

        alpha = rng.random((B, T, 1)).astype(np.float32)
        lsnr = (rng.random((B, T)).astype(np.float32) * 50 - 15)
        mod = ref_loss.DfAlphaLoss(factor=1.0, lsnr_thresh=-7.5, lsnr_min=-10.0)
        exp = float(mod(_t(torch, alpha), _t(torch, lsnr)))
        got = float(df_alpha_loss(jnp.asarray(alpha), jnp.asarray(lsnr), factor=1.0))
        assert got == pytest.approx(exp, rel=1e-5), (got, exp)


class TestSdrLosses:
    def test_si_sdr(self, ref, rng):
        torch, ref_loss, _, _ = ref
        from deepfilternet_tpu.train.loss import si_sdr

        c = rng.standard_normal((B, 9600)).astype(np.float32)
        e = c + rng.standard_normal((B, 9600)).astype(np.float32) * 0.1
        exp = ref_loss.SiSdr()(_t(torch, e), _t(torch, c)).numpy()
        got = np.asarray(si_sdr(jnp.asarray(e), jnp.asarray(c)))
        np.testing.assert_allclose(got, exp, rtol=1e-4)

    def test_sdr_loss(self, ref, rng):
        torch, ref_loss, _, _ = ref
        from deepfilternet_tpu.train.loss import sdr_loss

        c = rng.standard_normal((B, 9600)).astype(np.float32)
        e = c + rng.standard_normal((B, 9600)).astype(np.float32) * 0.2
        exp = float(ref_loss.SdrLoss(factor=0.2)(_t(torch, e), _t(torch, c)))
        got = float(sdr_loss(jnp.asarray(e), jnp.asarray(c), factor=0.2))
        assert got == pytest.approx(exp, rel=1e-4), (got, exp)

    def test_seg_sdr_loss(self, ref, rng):
        torch, ref_loss, _, _ = ref
        from deepfilternet_tpu.train.loss import seg_sdr_loss

        c = rng.standard_normal((B, 9600)).astype(np.float32)
        e = c + rng.standard_normal((B, 9600)).astype(np.float32) * 0.2
        exp = float(ref_loss.SegSdrLoss([2048, 4096], factor=0.2)(
            _t(torch, e), _t(torch, c)))
        got = float(seg_sdr_loss(jnp.asarray(e), jnp.asarray(c), (2048, 4096),
                                 factor=0.2))
        assert got == pytest.approx(exp, rel=1e-4), (got, exp)


class TestLocalSnr:
    def test_target_matches_reference(self, ref, rng):
        """LocalSnrTarget (df/modules.py:816-876) with the trainer's
        production parameters ws=20ms, range [lsnr_min-1, lsnr_max+1]."""
        torch, _, _, _ = ref
        from df.modules import LocalSnrTarget

        from deepfilternet_tpu.ops.lsnr import local_snr_target

        clean = _spec_np(rng)
        noise = _spec_np(rng, scale=0.03)
        mod = LocalSnrTarget(ws=20, target_snr_range=[-16, 36])
        exp = mod(
            _t(torch, clean[:, None]), _t(torch, noise[:, None])
        ).numpy()
        got = np.asarray(local_snr_target(
            jnp.asarray(clean), jnp.asarray(noise), 48000, 960, 480, (-16, 36)
        ))
        np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-4)

    def test_local_snr_loss(self, ref, rng):
        torch, ref_loss, _, _ = ref
        from deepfilternet_tpu.train.loss import local_snr_loss

        pred = rng.standard_normal((B, T, 1)).astype(np.float32)
        tgt = rng.standard_normal((B, T)).astype(np.float32)
        exp = float(ref_loss.LocalSnrLoss(factor=5e-4)(
            _t(torch, pred), _t(torch, tgt)))
        got = float(local_snr_loss(jnp.asarray(pred), jnp.asarray(tgt), factor=5e-4))
        assert got == pytest.approx(exp, rel=1e-5), (got, exp)


class TestLossIstft:
    def test_matches_reference_istft(self, ref, rng):
        """The trainer TD reconstruction: reference Istft module
        (pad one frame + torch.istft normalized=True) vs loss_istft, on
        arbitrary (inconsistent) spectra — the hardest case."""
        torch, ref_loss, _, _ = ref
        from deepfilternet_tpu.ops.stft import vorbis_window
        from deepfilternet_tpu.train.loss import loss_istft

        win = vorbis_window(960)
        spec = _spec_np(rng, (B, T, F), scale=0.5)
        mod = ref_loss.Istft(960, 480, torch.from_numpy(win.copy()))
        exp = mod(_t(torch, spec)).numpy()
        got = np.asarray(loss_istft(jnp.asarray(spec), 960, 480, win))
        np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-6)

    def test_scale_is_wnorm_sqrt_nfft(self, rng):
        """Documented scale: on consistent analysis spectra the TD-loss
        signals are c*x with c = sqrt(n_fft)*wnorm."""
        from deepfilternet_tpu.ops import Stft, stft
        from deepfilternet_tpu.ops.stft import vorbis_window
        from deepfilternet_tpu.train.loss import loss_istft

        cfg = Stft(sr=48000, fft_size=960, hop_size=480)
        x = rng.standard_normal((1, 19200)).astype(np.float32) * 0.1
        s = stft(jnp.asarray(x), cfg)
        y = np.asarray(loss_istft(s, 960, 480, vorbis_window(960)))
        c = np.sqrt(960) * cfg.wnorm
        np.testing.assert_allclose(y[:, 2000:18000], c * x[:, 2000:18000],
                                   atol=1e-6)


class _RefConfigPatch:
    """Set reference config values, restoring previous values on exit."""

    def __init__(self, ref_config, values):
        self.cfg = ref_config
        self.values = values
        self.prev = {}

    def __enter__(self):
        for sec, opt, val in self.values:
            self.prev[(sec, opt)] = self.cfg.parser.get(
                sec.lower(), opt, fallback=None
            )
            self.cfg.set(opt, str(val), str, sec)
        return self

    def __exit__(self, *exc):
        for (sec, opt), val in self.prev.items():
            if val is not None:
                self.cfg.set(opt, val, str, sec)
            elif self.cfg.parser.has_option(sec.lower(), opt):
                self.cfg.parser.remove_option(sec.lower(), opt)


class TestLossAggregate:
    def test_full_aggregate_matches_reference(self, ref, rng):
        """End-to-end: the reference `Loss` (df/loss.py:651-804) with the
        trainer's Istft vs our `Loss` under an identical config exercising
        MaskLoss + SpectralLoss + MultiResSpecLoss + SdrLoss + LocalSnrLoss
        on identical complex spectra."""
        torch, ref_loss, ref_config, state = ref
        from deepfilternet_tpu.config import config
        from deepfilternet_tpu.ops import Stft, erb_widths
        from deepfilternet_tpu.ops.stft import vorbis_window
        from deepfilternet_tpu.train.loss import Loss

        values = [
            ("MaskLoss", "factor", 1.0),
            ("MaskLoss", "mask", "iam"),
            ("MaskLoss", "gamma", 0.6),
            ("MaskLoss", "gamma_pred", 0.6),
            ("MaskLoss", "f_under", 2.0),
            ("SpectralLoss", "factor_magnitude", 1e4),
            ("SpectralLoss", "factor_complex", 1e4),
            ("SpectralLoss", "gamma", 0.6),
            ("MultiResSpecLoss", "factor", 500.0),
            ("MultiResSpecLoss", "factor_complex", 500.0),
            ("MultiResSpecLoss", "gamma", 0.6),
            ("SdrLoss", "factor", 0.05),
            ("LocalSnrLoss", "factor", 5e-4),
        ]
        clean = _spec_np(rng)
        noisy = clean + _spec_np(rng, scale=0.05)
        enh = noisy * 0.85
        mask = rng.random((B, T, NB_ERB)).astype(np.float32)
        lsnr = (rng.random((B, T, 1)).astype(np.float32) * 50 - 15)

        with _RefConfigPatch(ref_config, values):
            istft_mod = ref_loss.Istft(
                960, 480, torch.from_numpy(vorbis_window(960).copy()))
            ref_agg = ref_loss.Loss(state, istft_mod)
            with torch.no_grad():
                exp = float(ref_agg(
                    clean=_t(torch, clean[:, None]),
                    noisy=_t(torch, noisy[:, None]),
                    enhanced=_t(torch, enh[:, None]),
                    mask=_t(torch, mask[:, None]),
                    lsnr=_t(torch, lsnr),
                    snrs=torch.zeros(B),
                ))

        config.reset()
        for sec, opt, val in values:
            config.set(opt, str(val), section=sec)
        widths = erb_widths(48000, 960, NB_ERB, 2)
        ours = Loss(Stft(sr=48000, fft_size=960, hop_size=480), widths,
                    NB_DF, (-15, 35))
        got, parts = ours(
            jnp.asarray(clean), jnp.asarray(noisy), jnp.asarray(enh),
            jnp.asarray(mask), jnp.asarray(lsnr),
        )
        assert set(parts) == {"mask", "spectral", "mrsl", "sdr", "lsnr"}
        assert float(got) == pytest.approx(exp, rel=5e-4), (float(got), exp, parts)
        config.reset()

    def test_aggregate_gradient_direction(self, ref, rng):
        """Gradients of the aggregate wrt the enhanced spectrum agree with
        torch autograd (cosine similarity > 0.9999) — the training signal,
        not just the value."""
        torch, ref_loss, ref_config, state = ref
        from deepfilternet_tpu.config import config
        from deepfilternet_tpu.ops import Stft, erb_widths
        from deepfilternet_tpu.ops.stft import vorbis_window
        from deepfilternet_tpu.train.loss import Loss

        values = [
            ("SpectralLoss", "factor_magnitude", 1e4),
            ("SpectralLoss", "factor_complex", 1e4),
            ("SpectralLoss", "gamma", 0.6),
            ("MultiResSpecLoss", "factor", 500.0),
            ("MultiResSpecLoss", "factor_complex", 500.0),
            ("MultiResSpecLoss", "gamma", 0.6),
        ]
        clean = _spec_np(rng)
        noisy = clean + _spec_np(rng, scale=0.05)
        enh = noisy * 0.85
        mask = rng.random((B, T, NB_ERB)).astype(np.float32)
        lsnr = np.zeros((B, T, 1), np.float32)

        with _RefConfigPatch(ref_config, values):
            istft_mod = ref_loss.Istft(
                960, 480, torch.from_numpy(vorbis_window(960).copy()))
            ref_agg = ref_loss.Loss(state, istft_mod)
            e_t = _t(torch, np.stack([enh.real, enh.imag], -1))
            e_t.requires_grad_(True)
            total = ref_agg(
                clean=_t(torch, clean[:, None]),
                noisy=_t(torch, noisy[:, None]),
                enhanced=torch.view_as_complex(e_t)[:, None],
                mask=_t(torch, mask[:, None]),
                lsnr=_t(torch, lsnr),
                snrs=torch.zeros(B),
            )
            total.backward()
            g_ref = e_t.grad.numpy()

        config.reset()
        for sec, opt, val in values:
            config.set(opt, str(val), section=sec)
        widths = erb_widths(48000, 960, NB_ERB, 2)
        ours = Loss(Stft(sr=48000, fft_size=960, hop_size=480), widths,
                    NB_DF, (-15, 35))

        def f(e_ri):
            e = e_ri[..., 0] + 1j * e_ri[..., 1]
            return ours(jnp.asarray(clean), jnp.asarray(noisy), e,
                        jnp.asarray(mask), jnp.asarray(lsnr))[0]

        g_ours = np.asarray(jax.grad(f)(
            jnp.asarray(np.stack([enh.real, enh.imag], -1))))
        cos = float(
            (g_ref * g_ours).sum()
            / (np.linalg.norm(g_ref) * np.linalg.norm(g_ours))
        )
        assert cos > 0.9999, cos
        np.testing.assert_allclose(
            np.linalg.norm(g_ours), np.linalg.norm(g_ref), rtol=1e-3)
        config.reset()
