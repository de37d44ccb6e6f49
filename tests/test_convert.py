"""Checkpoint converter tests: reference-style DFN3 state_dict -> params.

Builds a state dict with the reference DfNet's module naming (nn.Sequential
indices per Conv2dNormAct composition, GRU l{i} suffixes, SqueezedGRU_S
linear_in/out.0 wrappers) from a known parameter set, converts, and checks
the converted tree reproduces the source parameters and that the model
forward runs with them.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepfilternet_tpu.checkpoint import convert_dfn3_state_dict
from deepfilternet_tpu.config import config
from deepfilternet_tpu.models import dfnet3


def _reference_names_for_conv(our_name: str, p: dict, s: dict, theirs: str) -> dict:
    """Emit reference Sequential-indexed tensor names for a conv block."""
    sd = {}
    # index layout: optional pad (no params) -> conv -> optional pw -> bn
    idx = 1 if p["w"].shape[-2] > 1 else 0  # time kernel>1 => pad layer first
    sd[f"{theirs}.{idx}.weight"] = np.asarray(p["w"])
    if "b" in p:
        sd[f"{theirs}.{idx}.bias"] = np.asarray(p["b"])
    idx += 1
    if "pw" in p:
        sd[f"{theirs}.{idx}.weight"] = np.asarray(p["pw"])
        idx += 1
    if "bn" in p:
        sd[f"{theirs}.{idx}.weight"] = np.asarray(p["bn"]["scale"])
        sd[f"{theirs}.{idx}.bias"] = np.asarray(p["bn"]["bias"])
        sd[f"{theirs}.{idx}.running_mean"] = np.asarray(s["bn"]["mean"])
        sd[f"{theirs}.{idx}.running_var"] = np.asarray(s["bn"]["var"])
        sd[f"{theirs}.{idx}.num_batches_tracked"] = np.asarray(0)
    return sd


def _reference_names_for_sgru(p: dict, theirs: str) -> dict:
    sd = {f"{theirs}.linear_in.0.weight": np.asarray(p["linear_in"]["w"])}
    for li, lp in enumerate(p["gru"]["layers"]):
        for k_ours, k_theirs in (("w_ih", "weight_ih"), ("w_hh", "weight_hh"),
                                 ("b_ih", "bias_ih"), ("b_hh", "bias_hh")):
            sd[f"{theirs}.gru.{k_theirs}_l{li}"] = np.asarray(lp[k_ours])
    if "linear_out" in p:
        sd[f"{theirs}.linear_out.0.weight"] = np.asarray(p["linear_out"]["w"])
    return sd


@pytest.fixture(scope="module")
def reference_sd():
    config.reset()
    params, state, cfg = dfnet3.init_dfnet3(jax.random.PRNGKey(7))
    from deepfilternet_tpu.checkpoint import _DFN3_CONV_MAP, _DFN3_GRU_MAP

    sd = {}
    for ours, theirs in _DFN3_CONV_MAP.items():
        sd.update(_reference_names_for_conv(ours, params[ours],
                                            state.get(ours, {}), theirs))
    for ours, theirs in _DFN3_GRU_MAP.items():
        sd.update(_reference_names_for_sgru(params[ours], theirs))
    sd["enc.df_fc_emb.0.weight"] = np.asarray(params["df_fc_emb"]["w"])
    sd["enc.lsnr_fc.0.weight"] = np.asarray(params["lsnr_fc"]["w"])
    sd["enc.lsnr_fc.0.bias"] = np.asarray(params["lsnr_fc"]["b"])
    sd["df_dec.df_out.0.weight"] = np.asarray(params["df_out"]["w"])
    sd["df_dec.df_fc_a.0.weight"] = np.asarray(params["df_fc_a"]["w"])
    sd["df_dec.df_fc_a.0.bias"] = np.asarray(params["df_fc_a"]["b"])
    # buffers the converter must ignore
    sd["erb_fb"] = np.zeros((481, 32), np.float32)
    sd["mask.erb_inv_fb"] = np.zeros((32, 481), np.float32)
    return params, state, cfg, sd


class TestConverter:
    def test_roundtrip_equality(self, reference_sd):
        params, state, cfg, sd = reference_sd
        conv_params, conv_state = convert_dfn3_state_dict(sd)
        flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
        flat_b = dict(jax.tree_util.tree_flatten_with_path(conv_params)[0])
        for path, val in flat_a:
            assert path in flat_b, f"missing {path}"
            np.testing.assert_array_equal(np.asarray(val), np.asarray(flat_b[path]),
                                          err_msg=str(path))
        for name, st in state.items():
            np.testing.assert_array_equal(
                np.asarray(st["bn"]["mean"]),
                np.asarray(conv_state[name]["bn"]["mean"]),
            )

    def test_forward_with_converted(self, reference_sd, rng):
        params, state, cfg, sd = reference_sd
        conv_params, conv_state = convert_dfn3_state_dict(sd)
        spec = jnp.asarray(rng.standard_normal((1, 5, 481, 2)).astype(np.float32))
        fe = jnp.asarray(rng.standard_normal((1, 5, 32)).astype(np.float32))
        fs = jnp.asarray(rng.standard_normal((1, 5, 96, 2)).astype(np.float32))
        (out_a, _, _, _), _ = dfnet3.forward(params, state, cfg, spec, fe, fs)
        (out_b, _, _, _), _ = dfnet3.forward(conv_params, conv_state, cfg, spec, fe, fs)
        np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-6)
