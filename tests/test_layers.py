"""Numerical-equivalence tests: JAX layers vs torch with identical weights.

This is the analog of the reference's Rust↔torch consistency net
(SURVEY.md §4.2) and doubles as validation of the checkpoint converter's
weight-layout mapping: if a torch state dict loads into our params and the
outputs agree, released reference checkpoints will too.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from deepfilternet_tpu.nn import (
    conv2d_norm_act_apply,
    conv_transpose2d_norm_act_apply,
    grouped_linear_apply,
    gru_apply,
    gru_step,
    init_conv2d_norm_act,
    init_conv_transpose2d_norm_act,
    init_grouped_linear,
    init_gru,
    init_linear,
    linear_apply,
)

torch.manual_seed(0)


def t2j(t):
    return jnp.asarray(t.detach().numpy())


class TestConv:
    @pytest.mark.parametrize(
        "in_ch,out_ch,kernel,fstride,separable",
        [
            (1, 16, (3, 3), 1, True),   # erb_conv0 (groups collapse to 1)
            (16, 16, (1, 3), 2, True),  # erb_conv1/2 depthwise+pointwise
            (16, 16, (1, 3), 1, True),  # erb_conv3
            (2, 16, (3, 3), 1, True),   # df_conv0
            (16, 16, (1, 1), 1, True),  # pathway 1x1
            (16, 10, (2, 1), 1, True),  # df_convp (kt, 1), gcd=2 groups
            (8, 16, (3, 3), 2, False),  # dense
        ],
    )
    def test_matches_torch(self, in_ch, out_ch, kernel, fstride, separable):
        import math

        key = jax.random.PRNGKey(0)
        params, state, cfg = init_conv2d_norm_act(
            key, in_ch, out_ch, kernel, fstride=fstride, bias=False, separable=separable,
            norm=False, act=None,
        )
        groups = cfg["groups"]
        fpad = kernel[1] // 2

        # torch mirror: ConstantPad2d((0,0,kt-1,0)) + Conv2d
        conv = tnn.Conv2d(
            in_ch, out_ch, kernel, stride=(1, fstride), padding=(0, fpad),
            groups=groups, bias=False,
        )
        with torch.no_grad():
            conv.weight.copy_(torch.from_numpy(np.asarray(params["w"])))
        layers = [tnn.ConstantPad2d((0, 0, kernel[0] - 1, 0), 0.0), conv]
        if "pw" in params:
            pw = tnn.Conv2d(out_ch, out_ch, 1, bias=False)
            with torch.no_grad():
                pw.weight.copy_(torch.from_numpy(np.asarray(params["pw"])))
            layers.append(pw)
        tmodel = tnn.Sequential(*layers)

        x = torch.randn(2, in_ch, 10, 32)
        with torch.no_grad():
            expected = tmodel(x).numpy()
        got, _ = conv2d_norm_act_apply(params, state, cfg, t2j(x))
        np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5)

    def test_bn_relu_eval(self):
        key = jax.random.PRNGKey(1)
        params, state, cfg = init_conv2d_norm_act(
            key, 4, 8, (1, 3), fstride=2, bias=False, separable=True, norm=True, act="relu"
        )
        # randomize BN stats
        state["bn"]["mean"] = jnp.asarray(np.random.randn(8).astype(np.float32) * 0.1)
        state["bn"]["var"] = jnp.asarray(np.random.rand(8).astype(np.float32) + 0.5)
        params["bn"]["scale"] = jnp.asarray(np.random.rand(8).astype(np.float32) + 0.5)
        params["bn"]["bias"] = jnp.asarray(np.random.randn(8).astype(np.float32) * 0.1)

        groups = cfg["groups"]
        conv = tnn.Conv2d(4, 8, (1, 3), stride=(1, 2), padding=(0, 1), groups=groups, bias=False)
        bn = tnn.BatchNorm2d(8)
        with torch.no_grad():
            conv.weight.copy_(torch.from_numpy(np.asarray(params["w"])))
            bn.weight.copy_(torch.from_numpy(np.asarray(params["bn"]["scale"])))
            bn.bias.copy_(torch.from_numpy(np.asarray(params["bn"]["bias"])))
            bn.running_mean.copy_(torch.from_numpy(np.asarray(state["bn"]["mean"])))
            bn.running_var.copy_(torch.from_numpy(np.asarray(state["bn"]["var"])))
        pw = tnn.Conv2d(8, 8, 1, bias=False)
        with torch.no_grad():
            pw.weight.copy_(torch.from_numpy(np.asarray(params["pw"])))
        tmodel = tnn.Sequential(conv, pw, bn, tnn.ReLU()).eval()

        x = torch.randn(2, 4, 6, 32)
        with torch.no_grad():
            expected = tmodel(x).numpy()
        got, _ = conv2d_norm_act_apply(params, state, cfg, t2j(x), train=False)
        np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5)


class TestConvTranspose:
    @pytest.mark.parametrize(
        "in_ch,out_ch,kernel,fstride,separable",
        [
            (16, 16, (1, 3), 2, True),   # convt2/convt1
            (8, 16, (2, 3), 2, False),
        ],
    )
    def test_matches_torch(self, in_ch, out_ch, kernel, fstride, separable):
        key = jax.random.PRNGKey(2)
        params, state, cfg = init_conv_transpose2d_norm_act(
            key, in_ch, out_ch, kernel, fstride=fstride, bias=False, separable=separable,
            norm=False, act=None,
        )
        groups = cfg["groups"]
        fpad = kernel[1] // 2
        convt = tnn.ConvTranspose2d(
            in_ch, out_ch, kernel, stride=(1, fstride),
            padding=(kernel[0] - 1, fpad), output_padding=(0, fpad),
            groups=groups, bias=False,
        )
        with torch.no_grad():
            convt.weight.copy_(torch.from_numpy(np.asarray(params["w"])))
        layers = [tnn.ConstantPad2d((0, 0, kernel[0] - 1, 0), 0.0), convt]
        if "pw" in params:
            pw = tnn.Conv2d(out_ch, out_ch, 1, bias=False)
            with torch.no_grad():
                pw.weight.copy_(torch.from_numpy(np.asarray(params["pw"])))
            layers.append(pw)
        tmodel = tnn.Sequential(*layers)
        x = torch.randn(2, in_ch, 8, 16)
        with torch.no_grad():
            expected = tmodel(x).numpy()
        got, _ = conv_transpose2d_norm_act_apply(params, state, cfg, t2j(x))
        assert got.shape == expected.shape
        np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5)


class TestLinear:
    def test_linear(self):
        p = init_linear(jax.random.PRNGKey(3), 12, 7)
        lin = tnn.Linear(12, 7)
        with torch.no_grad():
            lin.weight.copy_(torch.from_numpy(np.asarray(p["w"])))
            lin.bias.copy_(torch.from_numpy(np.asarray(p["b"])))
        x = torch.randn(4, 12)
        np.testing.assert_allclose(
            np.asarray(linear_apply(p, t2j(x))), lin(x).detach().numpy(), atol=1e-5
        )

    def test_grouped_linear_matches_einsum(self):
        p = init_grouped_linear(jax.random.PRNGKey(4), 256, 96 * 10, groups=1)
        x = np.random.randn(2, 5, 256).astype(np.float32)
        got = np.asarray(grouped_linear_apply(p, jnp.asarray(x)))
        w = np.asarray(p["w"])
        exp = np.einsum("btgi,gih->btgh", x.reshape(2, 5, 1, 256), w).reshape(2, 5, -1)
        np.testing.assert_allclose(got, exp, atol=1e-5)

    def test_grouped_linear_groups(self):
        g = 16
        p = init_grouped_linear(jax.random.PRNGKey(5), 768, 128, groups=g)
        x = np.random.randn(1, 3, 768).astype(np.float32)
        got = np.asarray(grouped_linear_apply(p, jnp.asarray(x)))
        w = np.asarray(p["w"])
        exp = np.einsum("btgi,gih->btgh", x.reshape(1, 3, g, 768 // g), w).reshape(1, 3, -1)
        np.testing.assert_allclose(got, exp, atol=1e-5)


class TestGru:
    @pytest.mark.parametrize("num_layers", [1, 3])
    def test_matches_torch(self, num_layers):
        isz, hsz = 24, 32
        p = init_gru(jax.random.PRNGKey(6), isz, hsz, num_layers)
        gru = tnn.GRU(isz, hsz, num_layers=num_layers, batch_first=True)
        with torch.no_grad():
            for li, lp in enumerate(p["layers"]):
                getattr(gru, f"weight_ih_l{li}").copy_(torch.from_numpy(np.asarray(lp["w_ih"])))
                getattr(gru, f"weight_hh_l{li}").copy_(torch.from_numpy(np.asarray(lp["w_hh"])))
                getattr(gru, f"bias_ih_l{li}").copy_(torch.from_numpy(np.asarray(lp["b_ih"])))
                getattr(gru, f"bias_hh_l{li}").copy_(torch.from_numpy(np.asarray(lp["b_hh"])))
        x = torch.randn(2, 11, isz)
        with torch.no_grad():
            t_out, t_h = gru(x)
        out, h = gru_apply(p, t2j(x))
        np.testing.assert_allclose(np.asarray(out), t_out.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(h), t_h.numpy(), atol=1e-5)

    def test_step_matches_offline(self):
        p = init_gru(jax.random.PRNGKey(7), 16, 20, 2)
        x = np.random.randn(3, 9, 16).astype(np.float32)
        out_off, h_off = gru_apply(p, jnp.asarray(x))
        h = jnp.zeros((2, 3, 20))
        outs = []
        for t in range(9):
            h, o = gru_step(p, h, jnp.asarray(x[:, t]))
            outs.append(np.asarray(o))
        np.testing.assert_allclose(np.stack(outs, axis=1), np.asarray(out_off), atol=1e-5)
        np.testing.assert_allclose(np.asarray(h), np.asarray(h_off), atol=1e-5)
