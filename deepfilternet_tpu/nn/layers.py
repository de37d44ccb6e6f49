"""Functional NN layers with torch-compatible parameter layouts.

Every layer is a pair of pure functions: ``init_*(key, ...) -> params`` and
``*_apply(params, x, ...) -> out``. Parameter arrays use the same shapes and
layouts as the reference's torch modules (df/modules.py) so that released
checkpoints map 1:1 through the converter in `checkpoint.py`:

  * conv weight   [O, I/groups, kT, kF]   (+ optional pointwise [O, O, 1, 1])
  * convT weight  [I, O/groups, kT, kF]
  * linear weight [O, I], bias [O]
  * GRU per layer weight_ih [3H, I], bias_ih [3H], weight_hh [3H, H],
    bias_hh [3H], gate order (reset, update, new) — torch convention
  * grouped linear weight [G, I/G, H/G] (einsum btgi,gih->btgh)
  * batchnorm scale/bias/running_mean/running_var [C]

Recurrent layers ship both an offline form (input projections batched into
one big MXU matmul, then a `lax.scan` over the small recurrent update) and a
single-frame `*_step` form used by the streaming cell.

BatchNorm state (running stats) lives in a separate `state` pytree threaded
through training applies; inference uses the stored stats (torch eval
semantics).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

# ---------------------------------------------------------------------------
# initializers (torch defaults)
# ---------------------------------------------------------------------------


def _kaiming_uniform(key, shape, fan_in):
    # torch kaiming_uniform_(a=sqrt(5)) => bound = sqrt(6/((1+5)*fan_in)) = 1/sqrt(fan_in)
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def _uniform(key, shape, bound):
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


# ---------------------------------------------------------------------------
# activations
# ---------------------------------------------------------------------------

ACT = {
    "relu": jax.nn.relu,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "identity": lambda x: x,
    None: lambda x: x,
}


# ---------------------------------------------------------------------------
# batch norm 2d
# ---------------------------------------------------------------------------


def init_batchnorm(c: int) -> Tuple[Params, Params]:
    params = {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}
    state = {"mean": jnp.zeros((c,)), "var": jnp.ones((c,))}
    return params, state


def batchnorm_apply(
    params: Params,
    state: Params,
    x: jnp.ndarray,
    train: bool,
    momentum: float = 0.1,
    eps: float = 1e-5,
) -> Tuple[jnp.ndarray, Params]:
    """x: [B, C, T, F]; normalizes over (B, T, F) per channel."""
    if train:
        mean = jnp.mean(x, axis=(0, 2, 3))
        var = jnp.var(x, axis=(0, 2, 3))
        n = x.shape[0] * x.shape[2] * x.shape[3]
        unbiased = var * n / max(n - 1, 1)
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = jax.lax.rsqrt(var + eps)
    out = (x - mean[None, :, None, None]) * inv[None, :, None, None]
    out = out * params["scale"][None, :, None, None] + params["bias"][None, :, None, None]
    return out, new_state


# ---------------------------------------------------------------------------
# causal Conv2d block: pad -> conv -> [pointwise] -> [bn] -> [act]
# (reference Conv2dNormAct, df/modules.py:18-73)
# ---------------------------------------------------------------------------


def _conv_groups(in_ch: int, out_ch: int, kernel: Tuple[int, int], separable: bool) -> int:
    """Reference Conv2dNormAct group rule (df/modules.py:49-67): separable
    means groups = gcd(in, out) on the main conv; a kernel-1 conv KEEPS its
    groups (it becomes a grouped/depthwise 1x1) and only the extra
    pointwise conv is suppressed (handled by has_pw at the call site)."""
    return math.gcd(in_ch, out_ch) if separable else 1


def init_conv2d_norm_act(
    key,
    in_ch: int,
    out_ch: int,
    kernel: Tuple[int, int],
    fstride: int = 1,
    dilation: int = 1,
    fpad: bool = True,
    bias: bool = True,
    separable: bool = False,
    norm: bool = True,
    act: Optional[str] = "relu",
    groups: Optional[int] = None,
    lookahead: int = 0,
    fupsample: int = 1,
    force_pw: bool = False,
) -> Tuple[Params, Params, Dict]:
    """Returns (params, state, static_config).

    `groups`/`lookahead`/`fupsample` extend the reference Conv2dNormAct with
    the convkxf variants used by DeepFilterNet1 (df/modules.py:129-193):
    explicit group counts (depthwise = min(in,out)), conv lookahead (time
    pad (k-1-la, la)), and nearest-neighbor freq upsample before the conv
    ("upsample" decoder mode).
    """
    kernel = tuple(kernel)
    if groups is None:
        groups = _conv_groups(in_ch, out_ch, kernel, separable)
    has_pw = separable and groups > 1 and (max(kernel) > 1 or force_pw)
    k1, k2, k3 = jax.random.split(key, 3)
    fan_in = (in_ch // groups) * kernel[0] * kernel[1]
    params: Params = {
        "w": _kaiming_uniform(k1, (out_ch, in_ch // groups, kernel[0], kernel[1]), fan_in)
    }
    if bias:
        params["b"] = _uniform(k2, (out_ch,), 1.0 / math.sqrt(fan_in))
    if has_pw:
        params["pw"] = _kaiming_uniform(k3, (out_ch, out_ch, 1, 1), out_ch)
    state: Params = {}
    if norm:
        bn_p, bn_s = init_batchnorm(out_ch)
        params["bn"] = bn_p
        state["bn"] = bn_s
    cfg = dict(
        kernel=kernel,
        fstride=fstride,
        dilation=dilation,
        fpad=(kernel[1] // 2 + dilation - 1) if fpad else 0,
        groups=groups,
        act=act,
        norm=norm,
        transposed=False,
        lookahead=lookahead,
        fupsample=fupsample,
    )
    return params, state, cfg


def _conv2d_raw(x, w, groups, fstride, dilation, fpad_lr):
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, fstride),
        padding=((0, 0), fpad_lr),
        rhs_dilation=(1, dilation),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=groups,
    )


def conv2d_norm_act_apply(
    params: Params, state: Params, cfg: Dict, x: jnp.ndarray, train: bool = False
) -> Tuple[jnp.ndarray, Params]:
    """Offline apply. x: [B, C, T, F] -> [B, O, T, F'] (causal in time)."""
    kt = cfg["kernel"][0]
    la = cfg.get("lookahead", 0)
    if kt - 1 - la > 0 or la > 0:
        x = jnp.pad(x, ((0, 0), (0, 0), (max(kt - 1 - la, 0), la), (0, 0)))
    if cfg.get("fupsample", 1) > 1:
        x = jnp.repeat(x, cfg["fupsample"], axis=-1)
    out = _conv2d_raw(
        x, params["w"], cfg["groups"], cfg["fstride"], cfg["dilation"], (cfg["fpad"], cfg["fpad"])
    )
    if "b" in params:
        out = out + params["b"][None, :, None, None]
    if "pw" in params:
        out = _conv2d_raw(out, params["pw"], 1, 1, 1, (0, 0))
    new_state = dict(state)
    if cfg["norm"]:
        out, new_state["bn"] = batchnorm_apply(params["bn"], state["bn"], out, train)
    return ACT[cfg["act"]](out), new_state


def conv2d_norm_act_step(
    params: Params, state: Params, cfg: Dict, x_win: jnp.ndarray
) -> jnp.ndarray:
    """Streaming apply on one frame. x_win: [B, C, kT, F] (time window ending
    at the current frame) -> [B, O, F']. Inference only (BN eval stats)."""
    if cfg.get("fupsample", 1) > 1:
        x_win = jnp.repeat(x_win, cfg["fupsample"], axis=-1)
    out = _conv2d_raw(
        x_win, params["w"], cfg["groups"], cfg["fstride"], cfg["dilation"], (cfg["fpad"], cfg["fpad"])
    )
    if "b" in params:
        out = out + params["b"][None, :, None, None]
    if "pw" in params:
        out = _conv2d_raw(out, params["pw"], 1, 1, 1, (0, 0))
    if cfg["norm"]:
        out, _ = batchnorm_apply(params["bn"], state["bn"], out, train=False)
    return ACT[cfg["act"]](out)[:, :, 0, :]


# ---------------------------------------------------------------------------
# causal ConvTranspose2d block (reference ConvTranspose2dNormAct,
# df/modules.py:76-127): frequency upsampling decoder convs
# ---------------------------------------------------------------------------


def init_conv_transpose2d_norm_act(
    key,
    in_ch: int,
    out_ch: int,
    kernel: Tuple[int, int],
    fstride: int = 1,
    dilation: int = 1,
    fpad: bool = True,
    bias: bool = True,
    separable: bool = False,
    norm: bool = True,
    act: Optional[str] = "relu",
) -> Tuple[Params, Params, Dict]:
    kernel = tuple(kernel)
    groups = math.gcd(in_ch, out_ch) if separable else 1
    if groups == 1:
        separable = False
    has_pw = separable and groups > 1
    k1, k2, k3 = jax.random.split(key, 3)
    # torch ConvTranspose2d weight: [I, O/groups, kT, kF]; fan_in for init is
    # computed from size(1)*k = (O/groups)*kT*kF
    fan_in = (out_ch // groups) * kernel[0] * kernel[1]
    params: Params = {
        "w": _kaiming_uniform(k1, (in_ch, out_ch // groups, kernel[0], kernel[1]), fan_in)
    }
    if bias:
        params["b"] = _uniform(k2, (out_ch,), 1.0 / math.sqrt(fan_in))
    if has_pw:
        params["pw"] = _kaiming_uniform(k3, (out_ch, out_ch, 1, 1), out_ch)
    state: Params = {}
    if norm:
        bn_p, bn_s = init_batchnorm(out_ch)
        params["bn"] = bn_p
        state["bn"] = bn_s
    cfg = dict(
        kernel=kernel,
        fstride=fstride,
        dilation=dilation,
        fpad=(kernel[1] // 2) if fpad else 0,
        groups=groups,
        act=act,
        norm=norm,
        transposed=True,
    )
    return params, state, cfg


def _conv_transpose2d_raw(x, w, groups, fstride, kernel, fpad, dilation):
    """Equivalent dense conv for torch ConvTranspose2d with
    padding=(kT-1, fpad + dilation - 1), output_padding=(0, fpad),
    stride=(1, fstride).

    Implemented as an input-dilated convolution with the spatially flipped,
    channel-transposed kernel. Time axis: pad_l = pad_r = 0 given the
    preceding causal ConstantPad (kT-1 left) — output length T preserved.
    Freq axis: pad_l = d(k-1) - p, pad_r = d(k-1) - p + output_padding.
    """
    kt, kf = kernel
    p_f = fpad + dilation - 1
    out_pad_f = fpad
    pad_f_l = dilation * (kf - 1) - p_f
    pad_f_r = dilation * (kf - 1) - p_f + out_pad_f
    p_t = kt - 1
    pad_t_l = kt - 1 - p_t
    pad_t_r = kt - 1 - p_t
    # torch weight [I, O/g, kt, kf] -> flip spatial, to grouped-OIHW:
    # for each group g of input channels, output block uses w[gI:(g+1)I].
    i_ch = x.shape[1]
    w_flip = w[:, :, ::-1, ::-1]
    # Rearrange to [O, I/g, kt, kf]: out channels = g * (O/g); input block per
    # group has I/g channels. torch groups split the *input* channels.
    ig = i_ch // groups
    og = w.shape[1]
    w_r = w_flip.reshape(groups, ig, og, kt, kf).transpose(0, 2, 1, 3, 4).reshape(
        groups * og, ig, kt, kf
    )
    return jax.lax.conv_general_dilated(
        x,
        w_r,
        window_strides=(1, 1),
        padding=((pad_t_l, pad_t_r), (pad_f_l, pad_f_r)),
        lhs_dilation=(1, fstride),
        rhs_dilation=(1, dilation),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=groups,
    )


def conv_transpose2d_norm_act_apply(
    params: Params, state: Params, cfg: Dict, x: jnp.ndarray, train: bool = False
) -> Tuple[jnp.ndarray, Params]:
    kt = cfg["kernel"][0]
    if kt > 1:
        x = jnp.pad(x, ((0, 0), (0, 0), (kt - 1, 0), (0, 0)))
    out = _conv_transpose2d_raw(
        x, params["w"], cfg["groups"], cfg["fstride"], cfg["kernel"], cfg["fpad"], cfg["dilation"]
    )
    if "b" in params:
        out = out + params["b"][None, :, None, None]
    if "pw" in params:
        out = _conv2d_raw(out, params["pw"], 1, 1, 1, (0, 0))
    new_state = dict(state)
    if cfg["norm"]:
        out, new_state["bn"] = batchnorm_apply(params["bn"], state["bn"], out, train)
    return ACT[cfg["act"]](out), new_state


def conv_transpose2d_norm_act_step(
    params: Params, state: Params, cfg: Dict, x_win: jnp.ndarray
) -> jnp.ndarray:
    """Streaming single-frame apply; x_win: [B, C, kT, F]."""
    out = _conv_transpose2d_raw(
        x_win, params["w"], cfg["groups"], cfg["fstride"], cfg["kernel"], cfg["fpad"], cfg["dilation"]
    )
    if "b" in params:
        out = out + params["b"][None, :, None, None]
    if "pw" in params:
        out = _conv2d_raw(out, params["pw"], 1, 1, 1, (0, 0))
    if cfg["norm"]:
        out, _ = batchnorm_apply(params["bn"], state["bn"], out, train=False)
    return ACT[cfg["act"]](out)[:, :, 0, :]


# ---------------------------------------------------------------------------
# linear / grouped linear
# ---------------------------------------------------------------------------


def init_linear(key, in_dim: int, out_dim: int, bias: bool = True) -> Params:
    k1, k2 = jax.random.split(key)
    p = {"w": _kaiming_uniform(k1, (out_dim, in_dim), in_dim)}
    if bias:
        p["b"] = _uniform(k2, (out_dim,), 1.0 / math.sqrt(in_dim))
    return p


def linear_apply(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    out = x @ params["w"].T
    if "b" in params:
        out = out + params["b"]
    return out


def init_grouped_linear(key, in_dim: int, out_dim: int, groups: int = 1) -> Params:
    """GroupedLinearEinsum (df/modules.py:741-780): weight [G, I/G, H/G]."""
    assert in_dim % groups == 0 and out_dim % groups == 0
    ws = in_dim // groups
    return {"w": _kaiming_uniform(key, (groups, ws, out_dim // groups), ws)}


def grouped_linear_apply(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """x: [..., I] -> [..., H]."""
    g, ws, hs = params["w"].shape
    xg = x.reshape(x.shape[:-1] + (g, ws))
    out = jnp.einsum("...gi,gih->...gh", xg, params["w"])
    return out.reshape(x.shape[:-1] + (g * hs,))


# ---------------------------------------------------------------------------
# GRU (torch gate conventions)
# ---------------------------------------------------------------------------


def init_gru(key, input_size: int, hidden_size: int, num_layers: int = 1) -> Params:
    layers = []
    bound = 1.0 / math.sqrt(hidden_size)
    for li in range(num_layers):
        key, k1, k2, k3, k4 = jax.random.split(key, 5)
        isz = input_size if li == 0 else hidden_size
        layers.append(
            {
                "w_ih": _uniform(k1, (3 * hidden_size, isz), bound),
                "w_hh": _uniform(k2, (3 * hidden_size, hidden_size), bound),
                "b_ih": _uniform(k3, (3 * hidden_size,), bound),
                "b_hh": _uniform(k4, (3 * hidden_size,), bound),
            }
        )
    return {"layers": layers}


def _gru_cell(h, gi, ghw, b_hh, hidden_size):
    """One step given precomputed input gates gi = x W_ih^T + b_ih.

    ghw: W_hh^T (transposed for right-multiply). Torch gate order r, z, n.
    """
    gh = h @ ghw + b_hh
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


def gru_apply(
    params: Params, x: jnp.ndarray, h0: Optional[jnp.ndarray] = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Offline GRU. x: [B, T, I]; h0: [L, B, H]. Returns (out [B,T,H], hN).

    Input projections for all timesteps are batched into one matmul per
    layer (MXU-friendly); only the small recurrent update is scanned.
    """
    layers = params["layers"]
    num_layers = len(layers)
    b, t, _ = x.shape
    lp0 = layers[0]
    hidden = (
        lp0["w_cat"].shape[1] // 4 if "w_cat" in lp0 else lp0["w_hh"].shape[1]
    )
    if h0 is None:
        h0 = jnp.zeros((num_layers, b, hidden), x.dtype)
    h_finals = []
    out = x
    for li, lp in enumerate(layers):
        if "w_cat" in lp:
            # fused layout (fuse_gru_layer): recover the batched-input /
            # recurrent split. x rows give all three input gates; h rows
            # give rz (cols :2H) and h_n (cols 3H:) — the i_n h-rows are
            # the zero block, so dropping them is exact.
            isz = lp["w_cat"].shape[0] - hidden
            gi = out @ lp["w_cat"][:isz, : 3 * hidden] + lp["b_cat"][: 3 * hidden]
            ghw = jnp.concatenate(
                [lp["w_cat"][isz:, : 2 * hidden], lp["w_cat"][isz:, 3 * hidden :]],
                axis=1,
            )
            b_hh = jnp.concatenate(
                [jnp.zeros((2 * hidden,), lp["b_cat"].dtype), lp["b_cat"][3 * hidden :]]
            )
        else:
            gi = out @ lp["w_ih"].T + lp["b_ih"]  # [B, T, 3H]
            ghw = lp["w_hh"].T
            b_hh = lp["b_hh"]

        def step(h, gi_t):
            h_new = _gru_cell(h, gi_t, ghw, b_hh, hidden)
            return h_new, h_new

        hN, outs = jax.lax.scan(step, h0[li], jnp.moveaxis(gi, 1, 0))
        out = jnp.moveaxis(outs, 0, 1)
        h_finals.append(hN)
    return out, jnp.stack(h_finals, axis=0)


def gru_step(
    params: Params, h: jnp.ndarray, x: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single frame. x: [B, I]; h: [L, B, H]. Returns (h', out [B, H]).

    Accepts either the torch layout (w_ih/w_hh, two matmuls per layer) or
    the fused layout produced by :func:`fuse_gru_layer` (one matmul per
    layer) — the streaming scan is dispatch-latency-bound per op, so
    halving the sequential matmul count matters more than the extra
    zero-block FLOPs (see PERF.md "Where the floor is").
    """
    layers = params["layers"]
    out = x
    new_h = []
    for li, lp in enumerate(layers):
        if "w_cat" in lp:
            h_new = _gru_cell_cat(h[li], out, lp["w_cat"], lp["b_cat"])
        else:
            gi = out @ lp["w_ih"].T + lp["b_ih"]
            h_new = _gru_cell(h[li], gi, lp["w_hh"].T, lp["b_hh"],
                              lp["w_hh"].shape[1])
        new_h.append(h_new)
        out = h_new
    return jnp.stack(new_h, axis=0), out


def gru_cell_from_gates(h, g):
    """Fused-layout gate math on a precomputed pre-activation g [..., 4H]:
    columns [r | z | i_n | h_n] (torch semantics: n = tanh(i_n + r*h_n))."""
    hidden = h.shape[-1]
    r = jax.nn.sigmoid(g[..., :hidden])
    z = jax.nn.sigmoid(g[..., hidden : 2 * hidden])
    n = jnp.tanh(g[..., 2 * hidden : 3 * hidden] + r * g[..., 3 * hidden :])
    return (1.0 - z) * n + z * h


def _gru_cell_cat(h, x, w_cat, b_cat):
    """One GRU step as a single matmul over the concatenated [x, h] input.

    w_cat columns: [r+z gates summed over (x,h) | i_n (x only) | h_n (h
    only)] — the n gate needs its input/hidden halves separate because the
    reset gate scales only the hidden half. Matches :func:`_gru_cell` up
    to matmul reduction order.
    """
    g = jnp.concatenate([x, h], axis=-1) @ w_cat + b_cat
    return gru_cell_from_gates(h, g)


def fuse_gru_layer(lp: Params) -> Params:
    """Torch-layout GRU layer -> single-matmul layout {w_cat, b_cat}.

    w_cat: [(I+H), 4H] with columns [rz (summed) | i_n | h_n]; the two
    zero blocks (h rows under i_n, x rows under h_n) add ~H(I+H) MACs —
    cheap next to the dispatch latency of a second matmul in the
    per-frame scan (PERF.md: ~17 µs/op at S=4096 regardless of width).
    """
    w_ih, w_hh = lp["w_ih"], lp["w_hh"]  # [3H, I], [3H, H]
    hidden = w_hh.shape[1]
    isz = w_ih.shape[1]
    wi, wh = w_ih.T, w_hh.T  # [I, 3H], [H, 3H]
    h2 = 2 * hidden
    top = jnp.concatenate(
        [wi[:, :h2], wi[:, h2:], jnp.zeros((isz, hidden), wi.dtype)], axis=1
    )
    bot = jnp.concatenate(
        [wh[:, :h2], jnp.zeros((hidden, hidden), wh.dtype), wh[:, h2:]], axis=1
    )
    return {
        "w_cat": jnp.concatenate([top, bot], axis=0),
        "b_cat": jnp.concatenate(
            [lp["b_ih"][:h2] + lp["b_hh"][:h2], lp["b_ih"][h2:], lp["b_hh"][h2:]]
        ),
    }


def fold_conv_layer(prm: Params, st: Params, cfg: Dict,
                    eps: float = 1e-5) -> Tuple[Params, Dict]:
    """Fold a separable conv block's depthwise + pointwise pair and its
    eval-mode BatchNorm into ONE dense conv (+bias). Inference-only (uses
    the BN running stats; training keeps the separable layout).

    PERF.md op-chain lever: the per-frame scan is dispatch-latency-bound
    (~17 µs per op at S=4096 regardless of width), so replacing two convs
    + affine with one conv wins despite the dense fold's extra MACs
    (ch=16 kernels: ~2.5x the separable FLOPs, which are ~free at these
    sizes). Works for both normal and transposed conv blocks; layers
    without a pointwise stage still get groups densified and BN folded.
    """
    w = prm["w"]
    groups = cfg["groups"]
    transposed = bool(cfg.get("transposed"))
    if transposed:
        # torch layout [I, O/g, kt, kf]; groups split the INPUT channels,
        # group g's inputs feed output block [g*og:(g+1)*og]
        i_ch, og = w.shape[0], w.shape[1]
        o_ch = og * groups
        if groups > 1:
            ig = i_ch // groups
            dense = jnp.zeros((i_ch, o_ch) + w.shape[2:], w.dtype)
            for g in range(groups):
                dense = dense.at[g * ig : (g + 1) * ig,
                                 g * og : (g + 1) * og].set(
                    w[g * ig : (g + 1) * ig]
                )
        else:
            dense = w
        out_axis = 1
    else:
        # [O, I/g, kt, kf]; groups split both, block-diagonally
        o_ch, ig = w.shape[0], w.shape[1]
        i_ch = ig * groups
        if groups > 1:
            og = o_ch // groups
            dense = jnp.zeros((o_ch, i_ch) + w.shape[2:], w.dtype)
            for g in range(groups):
                dense = dense.at[g * og : (g + 1) * og,
                                 g * ig : (g + 1) * ig].set(
                    w[g * og : (g + 1) * og]
                )
        else:
            dense = w
        out_axis = 0
    b = prm.get("b", jnp.zeros((o_ch,), w.dtype))
    if "pw" in prm:
        pw = prm["pw"][:, :, 0, 0]  # [O2, O]
        o_ch = pw.shape[0]
        if transposed:
            dense = jnp.einsum("oc,ichw->iohw", pw, dense)
        else:
            dense = jnp.einsum("oc,cihw->oihw", pw, dense)
        b = pw @ b
    if cfg["norm"]:
        s = prm["bn"]["scale"] * jax.lax.rsqrt(st["bn"]["var"] + eps)
        shape = [1, 1, 1, 1]
        shape[out_axis] = o_ch
        dense = dense * s.reshape(shape)
        b = (b - st["bn"]["mean"]) * s + prm["bn"]["bias"]
    new_cfg = dict(cfg, groups=1, norm=False)
    return {"w": dense, "b": b}, new_cfg


def fold_conv_tree(params: Params, state: Params, layers: Dict
                   ) -> Tuple[Params, Dict]:
    """Fold every conv block named in `layers` (a cfg["layers"] dict of
    static conv configs). Returns (params', layers'); `state` BN entries
    become unused (eval stats are baked into the folded weights)."""
    new_params = dict(params)
    new_layers = dict(layers)
    for name, lcfg in layers.items():
        if not isinstance(lcfg, dict) or "kernel" not in lcfg:
            continue  # GRU/linear cfg entries
        new_params[name], new_layers[name] = fold_conv_layer(
            params[name], state.get(name, {}), lcfg
        )
    return new_params, new_layers


_GRU_LAYER_KEYS = frozenset(("w_ih", "w_hh", "b_ih", "b_hh"))


def fuse_gru_tree(params):
    """Recursively rewrite every torch-layout GRU layer in a params tree to
    the fused single-matmul layout. Covers plain/Squeezed(_S)/Grouped GRUs
    in every model family (their step paths all bottom out in
    :func:`gru_step`). Apply only to copies used by per-frame streaming;
    the offline `gru_apply` path keeps the torch layout (its input matmul
    is already batched over time).
    """
    if isinstance(params, dict):
        if _GRU_LAYER_KEYS <= params.keys():
            return fuse_gru_layer(params)
        return {k: fuse_gru_tree(v) for k, v in params.items()}
    if isinstance(params, (list, tuple)):
        return type(params)(fuse_gru_tree(v) for v in params)
    return params


# ---------------------------------------------------------------------------
# SqueezedGRU_S (df/modules.py:705-738): grouped linear in -> GRU ->
# grouped linear out; skip connection applied after linear_out, fed by the
# raw input (the _S variant).
# ---------------------------------------------------------------------------


def init_squeezed_gru_s(
    key,
    input_size: int,
    hidden_size: int,
    output_size: Optional[int] = None,
    num_layers: int = 1,
    linear_groups: int = 8,
    skip: Optional[str] = None,  # None | "identity" | "groupedlinear"
    linear_act: Optional[str] = "relu",
) -> Tuple[Params, Dict]:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    params: Params = {
        "linear_in": init_grouped_linear(k1, input_size, hidden_size, linear_groups),
        "gru": init_gru(k2, hidden_size, hidden_size, num_layers),
    }
    if output_size is not None:
        params["linear_out"] = init_grouped_linear(k3, hidden_size, output_size, linear_groups)
    if skip == "groupedlinear":
        out_sz = output_size if output_size is not None else hidden_size
        params["skip"] = init_grouped_linear(k4, input_size, out_sz, linear_groups)
    cfg = dict(
        skip=skip,
        linear_act=linear_act,
        num_layers=num_layers,
        hidden_size=hidden_size,
    )
    return params, cfg


def squeezed_gru_s_apply(
    params: Params, cfg: Dict, x: jnp.ndarray, h0: Optional[jnp.ndarray] = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    act = ACT[cfg["linear_act"]]
    xin = act(grouped_linear_apply(params["linear_in"], x))
    out, h = gru_apply(params["gru"], xin, h0)
    if "linear_out" in params:
        out = act(grouped_linear_apply(params["linear_out"], out))
    if cfg["skip"] == "identity":
        out = out + x
    elif cfg["skip"] == "groupedlinear":
        out = out + grouped_linear_apply(params["skip"], x)
    return out, h


def squeezed_gru_s_step(
    params: Params, cfg: Dict, h: jnp.ndarray, x: jnp.ndarray,
    xin: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    act = ACT[cfg["linear_act"]]
    if xin is None:
        xin = act(grouped_linear_apply(params["linear_in"], x))
    # else: caller precomputed linear_in (e.g. merged with sibling heads
    # into one einsum) INCLUDING the activation; x still feeds the skip.
    h_new, out = gru_step(params["gru"], h, xin)
    if "linear_out" in params:
        out = act(grouped_linear_apply(params["linear_out"], out))
    if cfg["skip"] == "identity":
        out = out + x
    elif cfg["skip"] == "groupedlinear":
        out = out + grouped_linear_apply(params["skip"], x)
    return h_new, out


# ---------------------------------------------------------------------------
# GroupedLinear (df/modules.py:783-813): per-group nn.Linear (with bias) +
# optional channel shuffle of the output
# ---------------------------------------------------------------------------


def init_grouped_linear_shuffle(
    key, in_dim: int, out_dim: int, groups: int = 1, shuffle: bool = True
) -> Tuple[Params, Dict]:
    assert in_dim % groups == 0 and out_dim % groups == 0
    if groups == 1:
        shuffle = False
    keys = jax.random.split(key, groups)
    layers = [init_linear(k, in_dim // groups, out_dim // groups) for k in keys]
    return {"layers": layers}, dict(groups=groups, shuffle=shuffle)


def grouped_linear_shuffle_apply(params: Params, cfg: Dict, x: jnp.ndarray) -> jnp.ndarray:
    g = cfg["groups"]
    isz = x.shape[-1] // g
    outs = [
        linear_apply(lp, x[..., i * isz : (i + 1) * isz])
        for i, lp in enumerate(params["layers"])
    ]
    out = jnp.concatenate(outs, axis=-1)
    if cfg["shuffle"]:
        hs = out.shape[-1] // g
        sh = out.shape
        out = jnp.swapaxes(out.reshape(-1, hs, g), -1, -2).reshape(sh)
    return out


# ---------------------------------------------------------------------------
# GroupedGRU (df/modules.py:503-660): per-group GRUs per layer, channel
# shuffle between layers, optional output accumulation
# ---------------------------------------------------------------------------


def init_grouped_gru(
    key,
    input_size: int,
    hidden_size: int,
    num_layers: int = 1,
    groups: int = 4,
    shuffle: bool = True,
    add_outputs: bool = False,
) -> Tuple[Params, Dict]:
    assert input_size % groups == 0 and hidden_size % groups == 0
    if groups == 1:
        shuffle = False
    layers = []
    for li in range(num_layers):
        isz = (input_size if li == 0 else hidden_size) // groups
        gs = []
        for _ in range(groups):
            key, sub = jax.random.split(key)
            gs.append(init_gru(sub, isz, hidden_size // groups, 1))
        layers.append(gs)
    cfg = dict(
        groups=groups,
        shuffle=shuffle,
        add_outputs=add_outputs,
        num_layers=num_layers,
        hidden_size=hidden_size // groups,
    )
    return {"layers": layers}, cfg


def grouped_gru_apply(
    params: Params, cfg: Dict, x: jnp.ndarray, h0: Optional[jnp.ndarray] = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x: [B, T, I]; h0: [L*G, B, H/G]. Returns (out [B,T,H], hN)."""
    g = cfg["groups"]
    L = cfg["num_layers"]
    hs = cfg["hidden_size"]
    b = x.shape[0]
    if h0 is None:
        h0 = jnp.zeros((L * g, b, hs), x.dtype)
    out_accum = None
    cur = x
    h_finals = []
    for li, layer_groups in enumerate(params["layers"]):
        isz = layer_groups[0]["layers"][0]["w_ih"].shape[1]
        outs = []
        for gi, gp in enumerate(layer_groups):
            o, hN = gru_apply(gp, cur[..., gi * isz : (gi + 1) * isz],
                              h0[li * g + gi][None])
            outs.append(o)
            h_finals.append(hN[0])
        cur = jnp.concatenate(outs, axis=-1)
        if cfg["shuffle"] and li < L - 1:
            d0, d1 = cur.shape[0], cur.shape[1]
            cur = jnp.swapaxes(cur.reshape(d0, d1, -1, g), -1, -2).reshape(d0, d1, -1)
        out_accum = cur if (out_accum is None or not cfg["add_outputs"]) else out_accum + cur
    return out_accum, jnp.stack(h_finals, axis=0)


def grouped_gru_step(
    params: Params, cfg: Dict, h: jnp.ndarray, x: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single frame. x: [B, I]; h: [L*G, B, H/G]."""
    g = cfg["groups"]
    L = cfg["num_layers"]
    cur = x
    new_h = []
    out_accum = None
    for li, layer_groups in enumerate(params["layers"]):
        lp0 = layer_groups[0]["layers"][0]
        if "w_cat" in lp0:  # fused layout: w_cat is [(I+H), 4H]
            isz = lp0["w_cat"].shape[0] - lp0["w_cat"].shape[1] // 4
        else:
            isz = lp0["w_ih"].shape[1]
        outs = []
        for gi, gp in enumerate(layer_groups):
            hN, o = gru_step(gp, h[li * g + gi][None], cur[..., gi * isz : (gi + 1) * isz])
            outs.append(o)
            new_h.append(hN[0])
        cur = jnp.concatenate(outs, axis=-1)
        if cfg["shuffle"] and li < L - 1:
            b = cur.shape[0]
            cur = jnp.swapaxes(cur.reshape(b, -1, g), -1, -2).reshape(b, -1)
        out_accum = cur if (out_accum is None or not cfg["add_outputs"]) else out_accum + cur
    return jnp.stack(new_h, axis=0), out_accum


# ---------------------------------------------------------------------------
# SqueezedGRU (non-_S variant, df/modules.py:663-702): skip applied to the
# GRU *input* (post linear_in), before linear_out
# ---------------------------------------------------------------------------


def init_squeezed_gru(
    key,
    input_size: int,
    hidden_size: int,
    output_size: Optional[int] = None,
    num_layers: int = 1,
    linear_groups: int = 8,
    skip: Optional[str] = None,
    linear_act: Optional[str] = "identity",
) -> Tuple[Params, Dict]:
    k1, k2, k3 = jax.random.split(key, 3)
    params: Params = {
        "linear_in": init_grouped_linear(k1, input_size, hidden_size, linear_groups),
        "gru": init_gru(k2, hidden_size, hidden_size, num_layers),
    }
    if output_size is not None:
        params["linear_out"] = init_grouped_linear(k3, hidden_size, output_size, linear_groups)
    cfg = dict(skip=skip, linear_act=linear_act, num_layers=num_layers,
               hidden_size=hidden_size)
    return params, cfg


def squeezed_gru_apply(
    params: Params, cfg: Dict, x: jnp.ndarray, h0: Optional[jnp.ndarray] = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    act = ACT[cfg["linear_act"]]
    xin = act(grouped_linear_apply(params["linear_in"], x))
    out, h = gru_apply(params["gru"], xin, h0)
    if cfg["skip"] == "identity":
        out = out + xin
    if "linear_out" in params:
        out = act(grouped_linear_apply(params["linear_out"], out))
    return out, h


def squeezed_gru_step(
    params: Params, cfg: Dict, h: jnp.ndarray, x: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    act = ACT[cfg["linear_act"]]
    xin = act(grouped_linear_apply(params["linear_in"], x))
    h_new, out = gru_step(params["gru"], h, xin)
    if cfg["skip"] == "identity":
        out = out + xin
    if "linear_out" in params:
        out = act(grouped_linear_apply(params["linear_out"], out))
    return h_new, out
