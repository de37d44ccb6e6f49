"""DeepFilterNet3 model tests: shapes, offline/streaming equivalence.

The offline↔streaming equivalence test is the TPU analog of the
reference's tract pulse validation (SURVEY.md §4.5): the streaming scan
cell must reproduce the offline forward frame-for-frame from the same
parameter set.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepfilternet_tpu.config import config
from deepfilternet_tpu.models import dfnet3
from deepfilternet_tpu.models.dfnet3 import (
    ModelParams3,
    forward,
    init_dfnet3,
    streaming_cell,
    streaming_init,
)


@pytest.fixture(scope="module")
def model():
    config.reset()
    params, state, cfg = init_dfnet3(jax.random.PRNGKey(0))
    return params, state, cfg


def _rand_inputs(rng, b, t, cfg):
    f = cfg["freq_bins"]
    e = cfg["nb_erb"]
    fp = cfg["nb_df"]
    spec = rng.standard_normal((b, t, f, 2)).astype(np.float32)
    feat_erb = rng.standard_normal((b, t, e)).astype(np.float32)
    feat_spec = rng.standard_normal((b, t, fp, 2)).astype(np.float32)
    return jnp.asarray(spec), jnp.asarray(feat_erb), jnp.asarray(feat_spec)


class TestOffline:
    def test_shapes(self, model, rng):
        params, state, cfg = model
        b, t = 2, 10
        spec, feat_erb, feat_spec = _rand_inputs(rng, b, t, cfg)
        (spec_e, m, lsnr, coefs), _ = forward(params, state, cfg, spec, feat_erb, feat_spec)
        assert spec_e.shape == (b, t, cfg["freq_bins"], 2)
        assert m.shape == (b, t, cfg["nb_erb"])
        assert lsnr.shape == (b, t, 1)
        assert coefs.shape == (b, cfg["df_order"], t, cfg["nb_df"], 2)
        assert np.all(np.isfinite(np.asarray(spec_e)))
        # mask is sigmoid-bounded
        assert np.asarray(m).min() >= 0 and np.asarray(m).max() <= 1
        # lsnr within configured range
        assert np.asarray(lsnr).min() >= cfg["lsnr_min"] - 1e-4
        assert np.asarray(lsnr).max() <= cfg["lsnr_max"] + 1e-4

    def test_causality(self, model, rng):
        """Changing the input at frame t must not affect outputs before t."""
        params, state, cfg = model
        b, t = 1, 12
        spec, feat_erb, feat_spec = _rand_inputs(rng, b, t, cfg)
        (out1, _, _, _), _ = forward(params, state, cfg, spec, feat_erb, feat_spec)
        # perturb last 3 frames
        spec2 = spec.at[:, -3:].add(1.0)
        fe2 = feat_erb.at[:, -3:].add(1.0)
        fs2 = feat_spec.at[:, -3:].add(1.0)
        (out2, _, _, _), _ = forward(params, state, cfg, spec2, fe2, fs2)
        np.testing.assert_allclose(
            np.asarray(out1[:, : t - 3]), np.asarray(out2[:, : t - 3]), atol=1e-5
        )
        assert not np.allclose(np.asarray(out1[:, -3:]), np.asarray(out2[:, -3:]))

    def test_train_mode_updates_bn(self, model, rng):
        params, state, cfg = model
        spec, feat_erb, feat_spec = _rand_inputs(rng, 2, 6, cfg)
        _, new_state = forward(params, state, cfg, spec, feat_erb, feat_spec, train=True)
        # running stats must have moved
        before = np.asarray(state["erb_conv0"]["bn"]["mean"])
        after = np.asarray(new_state["erb_conv0"]["bn"]["mean"])
        assert not np.allclose(before, after)


class TestStreaming:
    def test_matches_offline(self, model, rng):
        params, state, cfg = model
        b, t = 2, 8
        spec, feat_erb, feat_spec = _rand_inputs(rng, b, t, cfg)
        (spec_e_off, _, lsnr_off, _), _ = forward(
            params, state, cfg, spec, feat_erb, feat_spec, train=False
        )

        carry = streaming_init(b, cfg)
        outs, lsnrs = [], []
        for i in range(t):
            carry, (se, ls, _m) = streaming_cell(
                params, state, cfg, carry, spec[:, i], feat_erb[:, i], feat_spec[:, i]
            )
            outs.append(np.asarray(se))
            lsnrs.append(np.asarray(ls))
        spec_e_str = np.stack(outs, axis=1)
        lsnr_str = np.stack(lsnrs, axis=1)
        np.testing.assert_allclose(
            np.asarray(spec_e_off), spec_e_str, atol=2e-4,
            err_msg="streaming must reproduce offline forward",
        )
        np.testing.assert_allclose(np.asarray(lsnr_off), lsnr_str, atol=1e-4)

    def test_scan_driver(self, model, rng):
        """The cell must compile under lax.scan (single XLA while loop)."""
        params, state, cfg = model
        b, t = 1, 6
        spec, feat_erb, feat_spec = _rand_inputs(rng, b, t, cfg)

        @jax.jit
        def run(spec, fe, fs):
            carry = streaming_init(b, cfg)

            def step(c, xs):
                s, e, f = xs
                c2, (se, ls, _m) = streaming_cell(params, state, cfg, c, s, e, f)
                return c2, se

            _, out = jax.lax.scan(
                step, carry, (jnp.moveaxis(spec, 1, 0), jnp.moveaxis(fe, 1, 0), jnp.moveaxis(fs, 1, 0))
            )
            return jnp.moveaxis(out, 0, 1)

        out = run(spec, feat_erb, feat_spec)
        (out_off, _, _, _), _ = forward(params, state, cfg, spec, feat_erb, feat_spec)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out_off), atol=2e-4)


@pytest.mark.parametrize("ktp", [1, 5])
def test_forward_chunk_matches_cell(ktp, rng):
    from deepfilternet_tpu.models.dfnet3 import forward_chunk, init_dfnet3

    config.reset()
    config.set("DF_PATHWAY_KERNEL_SIZE_T", str(ktp), section="deepfilternet")
    try:
        params, state, cfg = init_dfnet3(jax.random.PRNGKey(0))
        b, t = 2, 9
        spec, fe, fs = _rand_inputs(rng, b, t, cfg)
        carry = streaming_init(b, cfg)
        ref = []
        for i in range(t):
            carry, (se, ls, m) = streaming_cell(
                params, state, cfg, carry, spec[:, i], fe[:, i], fs[:, i]
            )
            ref.append(np.asarray(se))
        ref = np.stack(ref, 1)

        c = streaming_init(b, cfg)
        outs = []
        for lo, hi in [(0, 4), (4, t)]:  # state continuity across the boundary
            c, (se, ls, m) = forward_chunk(
                params, state, cfg, c, spec[:, lo:hi], fe[:, lo:hi], fs[:, lo:hi]
            )
            outs.append(np.asarray(se))
        np.testing.assert_allclose(np.concatenate(outs, 1), ref, atol=2e-5)
    finally:
        config.reset()


class TestLsnrDropout:
    """LSNR frame dropout (deepfilternet3.py:413-424): with LSNR_DROPOUT
    and train=True, frames with predicted lsnr <= -10 dB contribute zero
    mask and zero DF coefficients (compute-and-select TPU equivalent)."""

    def _make(self, lsnr_bias):
        config.reset()
        config.set("LSNR_DROPOUT", "True", section="deepfilternet")
        params, state, cfg = init_dfnet3(jax.random.PRNGKey(0))
        # pin the lsnr head: sigmoid(bias) scaled to [-15, 35]
        params["lsnr_fc"]["w"] = jnp.zeros_like(params["lsnr_fc"]["w"])
        params["lsnr_fc"]["b"] = jnp.full_like(params["lsnr_fc"]["b"], lsnr_bias)
        return params, state, cfg

    def test_all_frames_dropped_when_lsnr_low(self, rng):
        try:
            params, state, cfg = self._make(-12.0)  # lsnr ~= -15 dB
            spec, fe, fs = _rand_inputs(rng, 1, 8, cfg)
            (spec_e, m, lsnr, _), _ = forward(
                params, state, cfg, spec, fe, fs, train=True
            )
            assert float(np.max(lsnr)) < -10.0
            np.testing.assert_allclose(np.asarray(m), 0.0)
            np.testing.assert_allclose(np.asarray(spec_e), 0.0, atol=1e-7)
        finally:
            config.reset()

    def test_no_dropout_when_lsnr_high_or_eval(self, rng):
        try:
            params, state, cfg = self._make(12.0)  # lsnr ~= 35 dB
            spec, fe, fs = _rand_inputs(rng, 1, 8, cfg)
            (se_train, m_train, _, _), _ = forward(
                params, state, cfg, spec, fe, fs, train=True
            )
            assert float(np.abs(np.asarray(m_train)).max()) > 0
            # eval ignores lsnr_dropout entirely even with low lsnr
            params2, state2, cfg2 = self._make(-12.0)
            (se_eval, m_eval, _, _), _ = forward(
                params2, state2, cfg2, spec, fe, fs, train=False
            )
            assert float(np.abs(np.asarray(m_eval)).max()) > 0
        finally:
            config.reset()
