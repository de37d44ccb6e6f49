"""Checkpoint-converter proof against the REAL reference torch models.

Builds the actual `DfNet` from /root/reference/DeepFilterNet (random
init), converts its state_dict with our converters, runs both forwards
on identical random inputs, and asserts the outputs match. This fails if
any layout/naming assumption in checkpoint.py (Sequential index layout
df/modules.py:49-73, GroupedLinearEinsum layout modules.py:741-780,
separable-conv ordering, GRU gate order) is wrong — unlike
tests/test_convert.py, which only round-trips a self-built state dict.
"""

import numpy as np
import pytest

import jax

from tests._torch_ref import load_reference_df, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not present"
)


def _production_df_state():
    """The reference's production pipelines construct the DF state with
    min_nb_erb_freqs=p.min_nb_freqs (train.py:119, enhance.py:166) and pass
    it into init_model; bare init_model() would default to pyDF's
    min_nb_erb_freqs=1 and build DIFFERENT erb matrices. Checkpoints are
    trained with the production path, so the tests mirror it."""
    from df.model import ModelParams

    import deepfilternet_tpu.libdf_compat as libdf

    p = ModelParams()
    return libdf.DF(
        sr=p.sr, fft_size=p.fft_size, hop_size=p.hop_size,
        nb_bands=p.nb_erb, min_nb_erb_freqs=p.min_nb_freqs,
    )


def _rand_inputs(p, b=1, t=20, seed=0):
    rng = np.random.default_rng(seed)
    freq = p.fft_size // 2 + 1
    spec = rng.standard_normal((b, t, freq, 2)).astype(np.float32) * 0.3
    erb = rng.standard_normal((b, t, p.nb_erb)).astype(np.float32)
    fspec = rng.standard_normal((b, t, p.nb_df, 2)).astype(np.float32) * 0.3
    return spec, erb, fspec


def _torch_forward(model, spec, erb, fspec):
    import torch

    with torch.no_grad():
        out = model(
            torch.from_numpy(spec[:, None]),
            torch.from_numpy(erb[:, None]),
            torch.from_numpy(fspec[:, None]),
        )
    return [o.numpy() if hasattr(o, "numpy") else o for o in out]


class TestDfn3ConverterVsTorch:
    @pytest.fixture(scope="class")
    def pair(self):
        load_reference_df()
        import torch

        import df.deepfilternet3 as ref_dfn3

        torch.manual_seed(0)
        model = ref_dfn3.init_model(_production_df_state())
        model.eval()

        from deepfilternet_tpu.checkpoint import convert_dfn3_state_dict
        from deepfilternet_tpu.config import config
        from deepfilternet_tpu.models import dfnet3

        config.reset()
        _, _, cfg = dfnet3.init_dfnet3(jax.random.PRNGKey(0))
        params, state = convert_dfn3_state_dict(model.state_dict())
        return model, (params, state, cfg)

    def test_outputs_match(self, pair):
        model, (params, state, cfg) = pair
        from df.model import ModelParams

        from deepfilternet_tpu.models import dfnet3

        p = ModelParams()
        spec, erb, fspec = _rand_inputs(p)
        t_spec_e, t_m, t_lsnr, t_coefs = _torch_forward(model, spec, erb, fspec)
        (j_spec_e, j_m, j_lsnr, j_coefs), _ = jax.jit(
            lambda s, e, f: dfnet3.forward(params, state, cfg, s, e, f, train=False)
        )(spec, erb, fspec)

        np.testing.assert_allclose(
            np.asarray(j_lsnr), t_lsnr, rtol=1e-4, atol=1e-4, err_msg="lsnr"
        )
        np.testing.assert_allclose(
            np.asarray(j_m), t_m[:, 0], rtol=1e-4, atol=1e-4, err_msg="mask"
        )
        np.testing.assert_allclose(
            np.asarray(j_coefs), t_coefs, rtol=1e-4, atol=1e-4, err_msg="df_coefs"
        )
        np.testing.assert_allclose(
            np.asarray(j_spec_e), t_spec_e[:, 0], rtol=1e-4, atol=1e-4,
            err_msg="spec_e",
        )

    def test_param_count_matches(self, pair):
        model, (params, _, _) = pair
        n_torch = sum(
            p.numel() for name, p in model.named_parameters()
            # static buffers our side rebuilds (erb_fb etc.) are not params
        )
        n_ours = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
        assert n_ours == n_torch


class TestDfn2ConverterVsTorch:
    @pytest.fixture(scope="class", params=["grouped", "squeeze"])
    def pair(self, request):
        load_reference_df()
        import torch

        from deepfilternet_tpu.checkpoint import convert_dfn2_state_dict
        from deepfilternet_tpu.config import config
        from deepfilternet_tpu.models import dfnet2

        gru_type = request.param
        ref_config = load_reference_df()
        ref_config.set("GRU_TYPE", gru_type, str, "deepfilternet")
        ref_config.set("DF_OUTPUT_LAYER", "groupedlinear", str, "deepfilternet")
        ref_config.set("DFOP_METHOD", "df", str, "deepfilternet")
        ref_config.set("DF_N_ITER", "1", str, "deepfilternet")
        import df.deepfilternet2 as ref_dfn2

        torch.manual_seed(0)
        model = ref_dfn2.init_model(_production_df_state())
        model.eval()

        config.reset()
        config.set("GRU_TYPE", gru_type, section="deepfilternet")
        config.set("DF_OUTPUT_LAYER", "groupedlinear", section="deepfilternet")
        config.set("DFOP_METHOD", "df", section="deepfilternet")
        config.set("DF_N_ITER", "1", section="deepfilternet")
        _, _, cfg = dfnet2.init_dfnet2(jax.random.PRNGKey(0))
        params, state = convert_dfn2_state_dict(model.state_dict())
        return model, (params, state, cfg)

    def test_outputs_match(self, pair):
        model, (params, state, cfg) = pair
        from df.model import ModelParams

        from deepfilternet_tpu.models import dfnet2

        p = ModelParams()
        spec, erb, fspec = _rand_inputs(p)
        t_spec_e, t_m, t_lsnr, t_alpha = _torch_forward(model, spec, erb, fspec)
        (j_spec_e, j_m, j_lsnr, j_alpha), _ = jax.jit(
            lambda s, e, f: dfnet2.forward(params, state, cfg, s, e, f, train=False)
        )(spec, erb, fspec)

        np.testing.assert_allclose(
            np.asarray(j_lsnr), t_lsnr, rtol=1e-4, atol=1e-4, err_msg="lsnr"
        )
        np.testing.assert_allclose(
            np.asarray(j_m), t_m[:, 0], rtol=1e-4, atol=1e-4, err_msg="mask"
        )
        np.testing.assert_allclose(
            np.asarray(j_alpha), t_alpha, rtol=1e-4, atol=1e-4, err_msg="df_alpha"
        )
        np.testing.assert_allclose(
            np.asarray(j_spec_e), t_spec_e[:, 0], rtol=1e-4, atol=1e-4,
            err_msg="spec_e",
        )

    def test_param_count_matches(self, pair):
        model, (params, _, _) = pair
        n_torch = sum(p.numel() for p in model.parameters())
        n_ours = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
        assert n_ours == n_torch


class TestDfn1ConverterVsTorch:
    @pytest.fixture(scope="class")
    def pair(self):
        load_reference_df()
        import torch

        from deepfilternet_tpu.checkpoint import convert_dfn1_state_dict
        from deepfilternet_tpu.config import config
        from deepfilternet_tpu.models import dfnet1

        ref_config = load_reference_df()
        # DFN1's own defaults (df/deepfilternet.py ModelParams); the
        # reference config is a singleton, so undo the DFN2 fixtures' keys
        ref_config.set("GRU_TYPE", "grouped", str, "deepfilternet")
        ref_config.set("DFOP_METHOD", "real_unfold", str, "deepfilternet")
        import df.deepfilternet as ref_dfn1

        torch.manual_seed(0)
        model = ref_dfn1.init_model(_production_df_state())
        model.eval()

        config.reset()
        _, _, cfg = dfnet1.init_dfnet1(jax.random.PRNGKey(0))
        params, state = convert_dfn1_state_dict(model.state_dict())
        return model, (params, state, cfg)

    def test_outputs_match(self, pair):
        model, (params, state, cfg) = pair
        from df.model import ModelParams

        from deepfilternet_tpu.models import dfnet1

        p = ModelParams()
        spec, erb, fspec = _rand_inputs(p)
        t_spec_e, t_m, t_lsnr, t_alpha = _torch_forward(model, spec, erb, fspec)
        (j_spec_e, j_m, j_lsnr, j_alpha), _ = jax.jit(
            lambda s, e, f: dfnet1.forward(params, state, cfg, s, e, f, train=False)
        )(spec, erb, fspec)

        np.testing.assert_allclose(
            np.asarray(j_lsnr), t_lsnr, rtol=1e-4, atol=1e-4, err_msg="lsnr"
        )
        np.testing.assert_allclose(
            np.asarray(j_m), t_m[:, 0], rtol=1e-4, atol=1e-4, err_msg="mask"
        )
        np.testing.assert_allclose(
            np.asarray(j_alpha), t_alpha, rtol=1e-4, atol=1e-4, err_msg="df_alpha"
        )
        np.testing.assert_allclose(
            np.asarray(j_spec_e), t_spec_e[:, 0], rtol=1e-4, atol=1e-4,
            err_msg="spec_e",
        )

    def test_param_count_matches(self, pair):
        model, (params, _, _) = pair
        n_torch = sum(p.numel() for p in model.parameters())
        n_ours = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
        assert n_ours == n_torch
