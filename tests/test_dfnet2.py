"""DeepFilterNet2 tests: both GRU variants, offline/streaming equivalence."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepfilternet_tpu.config import config
from deepfilternet_tpu.models import dfnet2


def _make(gru_type: str, df_output_layer: str, dfop: str):
    config.reset()
    config.set("GRU_TYPE", gru_type, section="deepfilternet")
    config.set("DF_OUTPUT_LAYER", df_output_layer, section="deepfilternet")
    config.set("DFOP_METHOD", dfop, section="deepfilternet")
    config.set("DF_N_ITER", "1", section="deepfilternet")
    params, state, cfg = dfnet2.init_dfnet2(jax.random.PRNGKey(0))
    return params, state, cfg


def _rand_inputs(rng, b, t, cfg):
    spec = jnp.asarray(rng.standard_normal((b, t, cfg["freq_bins"], 2)).astype(np.float32))
    fe = jnp.asarray(rng.standard_normal((b, t, cfg["nb_erb"])).astype(np.float32))
    fs = jnp.asarray(rng.standard_normal((b, t, cfg["nb_df"], 2)).astype(np.float32))
    return spec, fe, fs


@pytest.mark.parametrize(
    "gru_type,df_out,dfop",
    [
        ("squeeze", "groupedlinear", "complex_strided"),  # released DFN2 form
        ("grouped", "linear", "real_unfold"),             # legacy defaults
    ],
)
class TestDfNet2:
    def test_offline_shapes(self, gru_type, df_out, dfop, rng):
        params, state, cfg = _make(gru_type, df_out, dfop)
        spec, fe, fs = _rand_inputs(rng, 2, 8, cfg)
        (spec_e, m, lsnr, alpha), _ = dfnet2.forward(params, state, cfg, spec, fe, fs)
        assert spec_e.shape == spec.shape
        assert m.shape == (2, 8, cfg["nb_erb"])
        assert lsnr.shape == (2, 8, 1)
        assert alpha.shape == (2, 8, 1)
        assert np.all(np.isfinite(np.asarray(spec_e)))

    def test_streaming_matches_offline(self, gru_type, df_out, dfop, rng):
        params, state, cfg = _make(gru_type, df_out, dfop)
        b, t = 1, 6
        spec, fe, fs = _rand_inputs(rng, b, t, cfg)
        (off, _, lsnr_off, _), _ = dfnet2.forward(params, state, cfg, spec, fe, fs)
        carry = dfnet2.streaming_init(b, cfg)
        outs = []
        for i in range(t):
            carry, (se, ls, _m) = dfnet2.streaming_cell(
                params, state, cfg, carry, spec[:, i], fe[:, i], fs[:, i]
            )
            outs.append(np.asarray(se))
        np.testing.assert_allclose(np.asarray(off), np.stack(outs, 1), atol=2e-4)


def test_df_iter_2_offline(rng):
    params, state, cfg = _make("squeeze", "groupedlinear", "complex_strided")
    cfg = dict(cfg, df_n_iter=2)
    spec, fe, fs = _rand_inputs(rng, 1, 6, cfg)
    (spec_e, _, _, _), _ = dfnet2.forward(params, state, cfg, spec, fe, fs)
    assert np.all(np.isfinite(np.asarray(spec_e)))


@pytest.mark.parametrize(
    "gru_type,df_out,dfop,ktp",
    [
        ("squeeze", "groupedlinear", "complex_strided", 1),
        ("grouped", "linear", "real_unfold", 1),
        ("squeeze", "groupedlinear", "complex_strided", 5),  # df_convp context
    ],
)
def test_forward_chunk_matches_cell(gru_type, df_out, dfop, ktp, rng):
    config.reset()
    config.set("GRU_TYPE", gru_type, section="deepfilternet")
    config.set("DF_OUTPUT_LAYER", df_out, section="deepfilternet")
    config.set("DFOP_METHOD", dfop, section="deepfilternet")
    config.set("DF_N_ITER", "1", section="deepfilternet")
    config.set("DF_PATHWAY_KERNEL_SIZE_T", str(ktp), section="deepfilternet")
    params, state, cfg = dfnet2.init_dfnet2(jax.random.PRNGKey(0))

    b, t = 2, 9
    spec, fe, fs = _rand_inputs(rng, b, t, cfg)
    carry = dfnet2.streaming_init(b, cfg)
    ref = []
    for i in range(t):
        carry, (se, ls, m) = dfnet2.streaming_cell(
            params, state, cfg, carry, spec[:, i], fe[:, i], fs[:, i]
        )
        ref.append(np.asarray(se))
    ref = np.stack(ref, 1)

    # two chunks (4 | 5): state continuity across the boundary
    c = dfnet2.streaming_init(b, cfg)
    outs = []
    for lo, hi in [(0, 4), (4, t)]:
        c, (se, ls, m) = dfnet2.forward_chunk(
            params, state, cfg, c, spec[:, lo:hi], fe[:, lo:hi], fs[:, lo:hi]
        )
        outs.append(np.asarray(se))
    np.testing.assert_allclose(np.concatenate(outs, 1), ref, atol=2e-5)
