"""Training stack tests: losses, scheduler, train step, end-to-end smoke."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepfilternet_tpu.config import config
from deepfilternet_tpu.ops import Stft, erb_widths
from deepfilternet_tpu.train.loss import (
    Loss,
    hann_stft,
    iam,
    mask_loss,
    multi_res_spec_loss,
    si_sdr,
    spectral_loss,
)
from deepfilternet_tpu.train.lr import cosine_scheduler
from deepfilternet_tpu.train.trainer import (
    init_train_state,
    make_optimizer,
    make_train_step,
)

CFG = Stft(sr=48000, fft_size=960, hop_size=480)
WIDTHS = erb_widths(48000, 960, 32, 2)


def _cplx(rng, shape):
    return jnp.asarray(
        (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(np.complex64)
    )


class TestLosses:
    def test_spectral_zero_for_equal(self, rng):
        x = _cplx(rng, (2, 10, 481))
        assert float(spectral_loss(x, x, gamma=0.6)) < 1e-9

    def test_spectral_underestimation_weighting(self, rng):
        c = _cplx(rng, (1, 5, 100))
        under = c * 0.5
        over = c * 1.5
        l_u_w = float(spectral_loss(under, c, factor_under=10.0, factor_complex=0))
        l_u = float(spectral_loss(under, c, factor_under=1.0, factor_complex=0))
        assert l_u_w > l_u * 5

    def test_mask_loss_zero_for_target(self, rng):
        clean = _cplx(rng, (1, 8, 481))
        noisy = clean + _cplx(rng, (1, 8, 481)) * 0.3
        fb = jnp.asarray(
            np.asarray(
                __import__("deepfilternet_tpu.ops.erb", fromlist=["erb_fb_matrices"])
                .erb_fb_matrices(WIDTHS, True, False)
            )
        )
        g_t = (iam(clean, noisy) @ fb) ** 0.6
        # feeding the compressed target as prediction -> ~zero loss
        loss = float(mask_loss(g_t ** (1 / 0.6), clean, noisy, fb))
        assert loss < 1e-6

    def test_spectral_grad_finite_at_zero_magnitude(self, rng):
        """Regression: gamma<1 spectral loss takes angle(enhanced); plain
        jnp.angle has a NaN gradient at exact zeros (padded / silent bins),
        which poisoned every other demo-training update. safe_angle clamps
        the backward denominator like the reference's angle Function
        (df/utils.py:48-74)."""
        import jax

        from deepfilternet_tpu.train.loss import safe_angle

        c = _cplx(rng, (1, 6, 100))
        # enhanced with an exact-zero region (model silencing padded frames)
        e = c.at[:, 3:].set(0.0)
        z = jnp.zeros_like(c).at[:, :2].set(c[:, :2])

        def f(e_):
            return spectral_loss(e_, z, gamma=0.6, factor_complex=100.0)

        g = jax.grad(lambda ri: f(ri[..., 0] + 1j * ri[..., 1]))(
            jnp.stack([jnp.real(e), jnp.imag(e)], -1)
        )
        assert bool(jnp.all(jnp.isfinite(g)))
        # safe_angle forward equals jnp.angle everywhere
        np.testing.assert_allclose(
            np.asarray(safe_angle(c)), np.angle(np.asarray(c)), atol=1e-6
        )
        # and its gradient matches the analytic one away from zero
        g2 = jax.grad(lambda ri: jnp.sum(
            safe_angle(ri[..., 0] + 1j * ri[..., 1])))(
            jnp.stack([jnp.real(c), jnp.imag(c)], -1)
        )
        re, im = np.real(np.asarray(c)), np.imag(np.asarray(c))
        d = re**2 + im**2
        np.testing.assert_allclose(np.asarray(g2[..., 0]), -im / d, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(g2[..., 1]), re / d, rtol=1e-4)

    def test_si_sdr_scale_invariance(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 4800)).astype(np.float32))
        est = x + 0.1 * jnp.asarray(rng.standard_normal((2, 4800)).astype(np.float32))
        base = np.asarray(si_sdr(est, x))
        scaled = np.asarray(si_sdr(est * 3.0, x))
        assert np.all(base > 15)
        np.testing.assert_allclose(base, scaled, atol=0.1)

    def test_mrsl_torch_parity(self, rng):
        """hann_stft matches torch.stft normalized=True semantics."""
        import torch

        x = rng.standard_normal((2, 4096)).astype(np.float32)
        got = np.asarray(hann_stft(jnp.asarray(x), 512))
        exp = torch.stft(
            torch.from_numpy(x), 512, hop_length=128,
            window=torch.hann_window(512), normalized=True, return_complex=True,
        ).numpy()
        # torch returns [B, F, T']; ours [B, T', F]
        np.testing.assert_allclose(got, np.moveaxis(exp, 1, 2), atol=1e-4)

    def test_loss_aggregator(self, rng):
        config.reset()
        config.set("factor", "1", section="MaskLoss")
        config.set("factor_magnitude", "100", section="SpectralLoss")
        config.set("factor", "500", section="MultiResSpecLoss")
        loss_obj = Loss(CFG, WIDTHS, 96, (-15, 35))
        clean = _cplx(rng, (1, 20, 481)) * 0.01
        noisy = clean + _cplx(rng, (1, 20, 481)) * 0.005
        enh = noisy * 0.8
        mask = jnp.full((1, 20, 32), 0.7)
        lsnr = jnp.zeros((1, 20, 1))
        total, parts = loss_obj(clean, noisy, enh, mask, lsnr)
        assert np.isfinite(float(total))
        assert set(parts) == {"mask", "spectral", "mrsl", "lsnr"}

    def test_df_alpha_loss_wired(self, rng):
        """[DfAlphaLoss] factor toggles the alpha penalty in the aggregator
        (df/loss.py:297-342); DFN1/DFN2 alpha output feeds it."""
        config.reset()
        config.set("factor", "1", section="DfAlphaLoss")
        loss_obj = Loss(CFG, WIDTHS, 96, (-15, 35))
        clean = _cplx(rng, (1, 20, 481)) * 0.01
        noisy = clean + _cplx(rng, (1, 20, 481)) * 0.01
        mask = jnp.full((1, 20, 32), 0.7)
        lsnr = jnp.zeros((1, 20, 1))
        alpha = jnp.full((1, 20, 1), 0.9)
        total_a, parts_a = loss_obj(clean, noisy, noisy, mask, lsnr, df_alpha=alpha)
        assert "df_alpha" in parts_a and float(parts_a["df_alpha"]) > 0
        # without alpha output (DFN3) the term is absent
        total_n, parts_n = loss_obj(clean, noisy, noisy, mask, lsnr)
        assert "df_alpha" not in parts_n
        assert float(total_a) != float(total_n)
        # factor 0 disables it even when alpha is provided
        config.reset()
        loss_off = Loss(CFG, WIDTHS, 96, (-15, 35))
        _, parts_off = loss_off(clean, noisy, noisy, mask, lsnr, df_alpha=alpha)
        assert "df_alpha" not in parts_off

    def test_mask_spec_loss_wired(self, rng):
        """[MaskLoss] mask=spec selects MaskSpecLoss (df/loss.py:280-294):
        spectral loss on the mask-applied noisy spectrum."""
        clean = _cplx(rng, (1, 20, 481)) * 0.01
        noisy = clean + _cplx(rng, (1, 20, 481)) * 0.005
        lsnr = jnp.zeros((1, 20, 1))

        config.reset()
        config.set("factor", "1", section="MaskLoss")
        config.set("mask", "spec", section="MaskLoss")
        loss_spec = Loss(CFG, WIDTHS, 96, (-15, 35))
        # a perfect-reconstruction mask (all ones, noisy==clean) -> ~0 loss
        _, parts_one = loss_spec(clean, clean, clean,
                                 jnp.ones((1, 20, 32)), lsnr)
        assert float(parts_one["mask"]) < 1e-6
        _, parts_half = loss_spec(clean, clean, clean,
                                  jnp.full((1, 20, 32), 0.5), lsnr)
        assert float(parts_half["mask"]) > float(parts_one["mask"])
        # differs from the default iam MaskLoss value
        config.reset()
        config.set("factor", "1", section="MaskLoss")
        loss_iam = Loss(CFG, WIDTHS, 96, (-15, 35))
        _, parts_iam = loss_iam(clean, noisy, clean,
                                jnp.full((1, 20, 32), 0.5), lsnr)
        _, parts_spec = loss_spec(clean, noisy, clean,
                                  jnp.full((1, 20, 32), 0.5), lsnr)
        assert float(parts_iam["mask"]) != float(parts_spec["mask"])

    def test_mask_spec_loss_max_freq(self, rng):
        config.reset()
        config.set("factor", "1", section="MaskLoss")
        config.set("mask", "spec", section="MaskLoss")
        config.set("max_freq", "12000", section="MaskLoss")
        loss_obj = Loss(CFG, WIDTHS, 96, (-15, 35))
        assert loss_obj.ml_f_max_idx == int(12000 / (48000 / 960))
        clean = _cplx(rng, (1, 20, 481)) * 0.01
        lsnr = jnp.zeros((1, 20, 1))
        _, parts = loss_obj(clean, clean, clean, jnp.ones((1, 20, 32)), lsnr)
        assert np.isfinite(float(parts["mask"]))


class TestLrScheduler:
    def test_warmup_and_decay(self):
        s = cosine_scheduler(5e-4, 1e-6, epochs=10, niter_per_ep=100, warmup_epochs=3,
                             start_warmup_value=1e-4)
        assert len(s) == 1000
        assert abs(s[0] - 1e-4) < 1e-9
        assert abs(s[299] - 5e-4) < 5e-6
        assert s[-1] < 2e-6

    def test_cycles(self):
        s = cosine_scheduler(1.0, 0.0, epochs=8, niter_per_ep=10,
                             initial_ep_per_cycle=4, cycle_decay=0.5)
        assert len(s) == 80
        assert abs(s[40] - 0.5) < 0.05  # second cycle starts at half base


class TestTrainStep:
    def test_loss_decreases(self, rng):
        """A few AdamW steps on a fixed batch must reduce the loss."""
        config.reset()
        config.set("factor_magnitude", "100", section="SpectralLoss")
        config.set("gamma", "0.6", section="SpectralLoss")
        config.set("factor", "0.0005", section="LocalSnrLoss")
        from deepfilternet_tpu.models import dfnet3

        params, state, cfg = dfnet3.init_dfnet3(jax.random.PRNGKey(0))
        loss_obj = Loss(CFG, WIDTHS, cfg["nb_df"], (-15, 35))
        optimizer = make_optimizer()
        step = jax.jit(make_train_step(dfnet3, cfg, loss_obj, optimizer))
        ts = init_train_state(params, state, optimizer)
        b, t = 2, 30
        batch = {
            "noisy": jnp.asarray(rng.standard_normal((b, t, 481, 2)).astype(np.float32) * 0.1),
            "clean": jnp.asarray(rng.standard_normal((b, t, 481, 2)).astype(np.float32) * 0.05),
            "feat_erb": jnp.asarray(rng.standard_normal((b, t, 32)).astype(np.float32)),
            "feat_spec": jnp.asarray(rng.standard_normal((b, t, 96, 2)).astype(np.float32)),
        }
        lr = jnp.asarray(1e-3)
        wd = jnp.asarray(0.05)
        losses = []
        for _ in range(8):
            ts, metrics = step(ts, batch, lr, wd)
            assert bool(metrics["finite"])
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0], losses

    def test_train_step_threads_df_alpha(self, rng):
        """DFN1/DFN2 train steps feed the alpha head into DfAlphaLoss."""
        config.reset()
        config.set("factor_magnitude", "100", section="SpectralLoss")
        config.set("factor", "1", section="DfAlphaLoss")
        config.set("GRU_TYPE", "squeeze", section="deepfilternet")
        config.set("DF_OUTPUT_LAYER", "groupedlinear", section="deepfilternet")
        config.set("DFOP_METHOD", "df", section="deepfilternet")
        config.set("DF_N_ITER", "1", section="deepfilternet")
        from deepfilternet_tpu.models import dfnet2

        params, state, cfg = dfnet2.init_dfnet2(jax.random.PRNGKey(0))
        loss_obj = Loss(CFG, WIDTHS, cfg["nb_df"], (-15, 35))
        optimizer = make_optimizer()
        step = jax.jit(make_train_step(dfnet2, cfg, loss_obj, optimizer))
        ts = init_train_state(params, state, optimizer)
        b, t = 1, 20
        batch = {
            "noisy": jnp.asarray(rng.standard_normal((b, t, 481, 2)).astype(np.float32) * 0.1),
            "clean": jnp.asarray(rng.standard_normal((b, t, 481, 2)).astype(np.float32) * 0.05),
            "feat_erb": jnp.asarray(rng.standard_normal((b, t, 32)).astype(np.float32)),
            "feat_spec": jnp.asarray(rng.standard_normal((b, t, 96, 2)).astype(np.float32)),
        }
        ts, metrics = step(ts, batch, jnp.asarray(1e-3), jnp.asarray(0.05))
        assert "loss_df_alpha" in metrics or any(
            "df_alpha" in k for k in metrics
        ), sorted(metrics)
        config.reset()

    def test_nan_guard_skips_update(self, rng):
        config.reset()
        config.set("factor_magnitude", "100", section="SpectralLoss")
        from deepfilternet_tpu.models import dfnet3

        params, state, cfg = dfnet3.init_dfnet3(jax.random.PRNGKey(0))
        loss_obj = Loss(CFG, WIDTHS, cfg["nb_df"], (-15, 35))
        optimizer = make_optimizer()
        step = jax.jit(make_train_step(dfnet3, cfg, loss_obj, optimizer))
        ts = init_train_state(params, state, optimizer)
        bad = {
            "noisy": jnp.full((1, 8, 481, 2), jnp.nan),
            "clean": jnp.zeros((1, 8, 481, 2)),
            "feat_erb": jnp.zeros((1, 8, 32)),
            "feat_spec": jnp.zeros((1, 8, 96, 2)),
        }
        before = np.asarray(ts.params["lsnr_fc"]["w"])
        ts2, metrics = step(ts, bad, jnp.asarray(1e-3), jnp.asarray(0.05))
        assert not bool(metrics["finite"])
        assert int(ts2.nan_count) == 1
        np.testing.assert_array_equal(before, np.asarray(ts2.params["lsnr_fc"]["w"]))


class TestEndToEnd:
    def test_train_smoke(self, tmp_path):
        """One debug epoch over the bundled fixtures end-to-end."""
        import json

        config.reset()
        base = str(tmp_path / "run")
        # the bundled dataset.cfg references noise.hdf5, which upstream does
        # not ship; point at the flac fixture instead
        ds_cfg = str(tmp_path / "dataset.cfg")
        entry = [["clean.hdf5", 6], ["noise_flac.hdf5", 1]]
        json.dump({"train": entry, "valid": entry, "test": entry}, open(ds_cfg, "w"))
        from deepfilternet_tpu.train.run import train

        os.environ["MAX_EPOCHS"] = "1"
        os.environ["BATCH_SIZE"] = "2"
        os.environ["MAX_SAMPLE_LEN_S"] = "1.0"
        os.environ["FACTOR_MAGNITUDE"] = "100"
        try:
            ts, test_loss = train(
                ds_cfg, "/root/reference/assets",
                base, max_epochs=1, num_workers=2, debug=True,
            )
        finally:
            for k in ("MAX_EPOCHS", "BATCH_SIZE", "MAX_SAMPLE_LEN_S", "FACTOR_MAGNITUDE"):
                os.environ.pop(k, None)
        assert np.isfinite(test_loss)
        assert os.path.isdir(os.path.join(base, "checkpoints"))
        assert any(f.startswith("model_") for f in os.listdir(os.path.join(base, "checkpoints")))
        # epoch summaries: wavs + lsnr txt + spectrogram figures
        # (train.py:556-593 + visualization.py analog)
        summ = os.path.join(base, "summaries", "epoch_0")
        assert os.path.isdir(summ)
        names = os.listdir(summ)
        for kind in ("noisy", "clean", "enh"):
            assert any(n.startswith(f"0_{kind}_snr") and n.endswith(".wav")
                       for n in names), (kind, names)
            assert f"0_{kind}_spec.png" in names, names
        assert any(n.startswith("0_lsnr_snr") for n in names), names


class TestTrainDemoResume:
    def test_opt_state_mismatch_warm_starts_params_only(self, tmp_path,
                                                        monkeypatch, capsys):
        """A checkpoint written under a different optimizer build must not
        crash the demo trainer at the first update (regression: the r05
        torch-exact AdamW rework changed the opt_state pytree; resuming an
        older checkpoint raised TypeError inside inject_hyperparams).
        Params warm-start; the optimizer state restarts with a warning."""
        import pickle

        from deepfilternet_tpu.scripts import train_demo

        base = str(tmp_path / "demo")
        os.makedirs(base)
        monkeypatch.setenv("DEMO_POOLS", "1")
        monkeypatch.setenv("DEMO_BATCH", "2")
        monkeypatch.setenv("DEMO_MAX_LEN_S", "1.0")
        train_demo.main(base, budget_s=1.0)
        ckpt_dir = os.path.join(base, "checkpoints")
        names = [n for n in os.listdir(ckpt_dir) if n.startswith("model_")]
        assert names
        path = os.path.join(ckpt_dir, names[0])
        payload = pickle.load(open(path, "rb"))
        assert "opt_state" in payload
        # simulate an opt_state from a different optimizer build
        payload["opt_state"] = {"junk": np.zeros(1, np.float32)}
        pickle.dump(payload, open(path, "wb"))
        capsys.readouterr()
        train_demo.main(base, budget_s=1.0)  # must not raise
        out = capsys.readouterr().out
        assert "restarting optimizer state" in out
        assert "resumed from step" in out
