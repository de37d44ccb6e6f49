"""DeepFilterNet (v1) tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepfilternet_tpu.config import config
from deepfilternet_tpu.models import dfnet1


@pytest.fixture(scope="module")
def model():
    config.reset()
    params, state, cfg = dfnet1.init_dfnet1(jax.random.PRNGKey(0))
    return params, state, cfg


def _rand_inputs(rng, b, t, cfg):
    spec = jnp.asarray(rng.standard_normal((b, t, cfg["freq_bins"], 2)).astype(np.float32))
    fe = jnp.asarray(rng.standard_normal((b, t, cfg["nb_erb"])).astype(np.float32))
    fs = jnp.asarray(rng.standard_normal((b, t, cfg["nb_df"], 2)).astype(np.float32))
    return spec, fe, fs


class TestDfNet1:
    def test_offline_shapes(self, model, rng):
        params, state, cfg = model
        spec, fe, fs = _rand_inputs(rng, 2, 8, cfg)
        (spec_e, m, lsnr, alpha), _ = dfnet1.forward(params, state, cfg, spec, fe, fs)
        assert spec_e.shape == spec.shape
        assert m.shape == (2, 8, cfg["nb_erb"])
        assert alpha.shape == (2, 8, 1)
        assert np.all(np.isfinite(np.asarray(spec_e)))

    def test_streaming_matches_offline(self, model, rng):
        params, state, cfg = model
        b, t = 1, 6
        spec, fe, fs = _rand_inputs(rng, b, t, cfg)
        (off, _, _, _), _ = dfnet1.forward(params, state, cfg, spec, fe, fs)
        carry = dfnet1.streaming_init(b, cfg)
        outs = []
        for i in range(t):
            carry, (se, _, _m) = dfnet1.streaming_cell(
                params, state, cfg, carry, spec[:, i], fe[:, i], fs[:, i]
            )
            outs.append(np.asarray(se))
        np.testing.assert_allclose(np.asarray(off), np.stack(outs, 1), atol=2e-4)

    def test_erb_only_ablation(self, model, rng):
        """DFN1 ERB-gain-only path (alpha=0 keeps the masked spectrum on the
        DF bins) — the fidelity ablation config from BASELINE.json."""
        params, state, cfg = model
        spec, fe, fs = _rand_inputs(rng, 1, 5, cfg)
        (spec_e, m, _, alpha), _ = dfnet1.forward(params, state, cfg, spec, fe, fs)
        spec_c = np.asarray(spec[..., 0] + 1j * spec[..., 1])
        mask_bins = np.asarray(m) @ np.asarray(cfg["erb_inv_fb"])
        spec_m = spec_c * mask_bins
        # upper bins are purely masked
        got = np.asarray(spec_e[..., cfg["nb_df"]:, 0] + 1j * spec_e[..., cfg["nb_df"]:, 1])
        np.testing.assert_allclose(got, spec_m[..., cfg["nb_df"]:], atol=1e-5)


def test_forward_chunk_matches_cell(model, rng):
    params, state, cfg = model
    b, t = 2, 9
    spec, fe, fs = _rand_inputs(rng, b, t, cfg)
    carry = dfnet1.streaming_init(b, cfg)
    ref = []
    for i in range(t):
        carry, (se, ls, m) = dfnet1.streaming_cell(
            params, state, cfg, carry, spec[:, i], fe[:, i], fs[:, i]
        )
        ref.append(np.asarray(se))
    ref = np.stack(ref, 1)

    # two chunks (4 | 5): state continuity across the boundary
    c = dfnet1.streaming_init(b, cfg)
    outs = []
    for lo, hi in [(0, 4), (4, t)]:
        c, (se, ls, m) = dfnet1.forward_chunk(
            params, state, cfg, c, spec[:, lo:hi], fe[:, lo:hi], fs[:, lo:hi]
        )
        outs.append(np.asarray(se))
    np.testing.assert_allclose(np.concatenate(outs, 1), ref, atol=2e-5)
