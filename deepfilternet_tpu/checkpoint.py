"""Checkpoint management + torch state-dict conversion.

File-layout parity with the reference (df/checkpoint.py:21-188):
`model_<epoch>.ckpt[.best]` files under a checkpoint dir, a `.best` file
recording (epoch, metric) history, keep-N cleanup, best/latest/int epoch
selection, and a `.patience` file for early stopping.

Checkpoints store numpy-ified parameter/state pytrees (pickle). A converter
maps released reference torch state_dicts (DeepFilterNet3's `DfNet`) onto
our parameter layout so pretrained weights can be reused without training
(the layer tests in tests/test_layers.py validate the layout mapping).
"""

from __future__ import annotations

import os
import pickle
import re
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

CKPT_RE = re.compile(r"^model_(\d+)\.ckpt(\.best)?$")


def _to_numpy(tree):
    import jax

    return jax.tree.map(lambda x: np.asarray(x), tree)


def _to_jax(tree):
    import jax.numpy as jnp

    import jax

    return jax.tree.map(lambda x: jnp.asarray(x), tree)


def write_cp(
    ckpt_dir: str,
    params: Any,
    state: Any,
    epoch: int,
    opt_state: Any = None,
    is_best: bool = False,
    keep_n: int = 3,
    extra: Optional[Dict] = None,
):
    os.makedirs(ckpt_dir, exist_ok=True)
    payload = {
        "params": _to_numpy(params),
        "state": _to_numpy(state),
        "epoch": epoch,
        "extra": extra or {},
    }
    if opt_state is not None:
        payload["opt_state"] = _to_numpy(opt_state)
    suffix = ".best" if is_best else ""
    path = os.path.join(ckpt_dir, f"model_{epoch}.ckpt{suffix}")
    with open(path, "wb") as f:
        pickle.dump(payload, f)
    _cleanup(ckpt_dir, keep_n)
    return path


def _list_cps(ckpt_dir: str) -> List[Tuple[int, bool, str]]:
    out = []
    if not os.path.isdir(ckpt_dir):
        return out
    for name in os.listdir(ckpt_dir):
        m = CKPT_RE.match(name)
        if m:
            out.append((int(m.group(1)), m.group(2) is not None, os.path.join(ckpt_dir, name)))
    return sorted(out)


def _cleanup(ckpt_dir: str, keep_n: int):
    cps = [c for c in _list_cps(ckpt_dir) if not c[1]]
    for epoch, _, path in cps[:-keep_n] if keep_n > 0 else []:
        os.remove(path)
    best = [c for c in _list_cps(ckpt_dir) if c[1]]
    for epoch, _, path in best[:-1]:
        os.remove(path)


def read_cp(ckpt_dir: str, which: str | int = "latest") -> Optional[Dict]:
    """which: 'best' | 'latest' | epoch int."""
    cps = _list_cps(ckpt_dir)
    if not cps:
        return None
    if which == "best":
        best = [c for c in cps if c[1]]
        target = best[-1] if best else cps[-1]
    elif which == "latest":
        non_best = [c for c in cps if not c[1]] or cps
        target = non_best[-1]
    else:
        matching = [c for c in cps if c[0] == int(which)]
        if not matching:
            raise FileNotFoundError(f"No checkpoint for epoch {which} in {ckpt_dir}")
        target = matching[-1]
    with open(target[2], "rb") as f:
        payload = pickle.load(f)
    payload["params"] = _to_jax(payload["params"])
    payload["state"] = _to_jax(payload["state"])
    return payload


# -- best-metric / patience bookkeeping (df/checkpoint.py:119-188) ----------


def log_best(ckpt_dir: str, epoch: int, metric: float):
    with open(os.path.join(ckpt_dir, ".best"), "a") as f:
        f.write(f"{epoch} {metric}\n")


def read_best(ckpt_dir: str) -> Optional[Tuple[int, float]]:
    path = os.path.join(ckpt_dir, ".best")
    if not os.path.isfile(path):
        return None
    lines = [ln.split() for ln in open(path).read().splitlines() if ln.strip()]
    if not lines:
        return None
    ep, met = lines[-1]
    return int(ep), float(met)


def check_patience(ckpt_dir: str, max_patience: int, new_metric: float,
                   maximize: bool = True) -> bool:
    """Returns True while training should continue. Tracks consecutive
    non-improving epochs in a `.patience` file."""
    path = os.path.join(ckpt_dir, ".patience")
    best = read_best(ckpt_dir)
    improved = best is None or (
        new_metric > best[1] if maximize else new_metric < best[1]
    )
    if improved:
        count = 0
    else:
        count = (int(open(path).read().strip()) if os.path.isfile(path) else 0) + 1
    with open(path, "w") as f:
        f.write(str(count))
    return count < max_patience


# ---------------------------------------------------------------------------
# torch state-dict conversion (DeepFilterNet3)
# ---------------------------------------------------------------------------

# our-name -> reference module path inside DfNet (deepfilternet3.py:334-385)
_DFN3_CONV_MAP = {
    "erb_conv0": "enc.erb_conv0",
    "erb_conv1": "enc.erb_conv1",
    "erb_conv2": "enc.erb_conv2",
    "erb_conv3": "enc.erb_conv3",
    "df_conv0": "enc.df_conv0",
    "df_conv1": "enc.df_conv1",
    "conv3p": "erb_dec.conv3p",
    "convt3": "erb_dec.convt3",
    "conv2p": "erb_dec.conv2p",
    "convt2": "erb_dec.convt2",
    "conv1p": "erb_dec.conv1p",
    "convt1": "erb_dec.convt1",
    "conv0p": "erb_dec.conv0p",
    "conv0_out": "erb_dec.conv0_out",
    "df_convp": "df_dec.df_convp",
}

_DFN3_GRU_MAP = {
    "enc_emb_gru": "enc.emb_gru",
    "dec_emb_gru": "erb_dec.emb_gru",
    "df_gru": "df_dec.df_gru",
}


def _convert_conv_block(sd: Dict[str, np.ndarray], prefix: str) -> Tuple[Dict, Dict]:
    """Classify a reference conv block's tensors by SHAPE (covers both the
    numerically-indexed Conv2dNormAct Sequentials of DFN2/3 and the
    name-keyed convkxf Sequentials of DFN1, df/modules.py:49-126/129-193):
    the extra pointwise conv is the square 1x1 [O,O,1,1]; the main
    (possibly grouped/depthwise or transposed) conv is the other 4D
    weight; batchnorm is identified by its running stats."""
    keys = sorted(
        (k for k in sd if k.startswith(prefix + ".")),
        key=lambda k: [int(p) if p.isdigit() else p for p in k.split(".")],
    )
    params: Dict[str, Any] = {}
    state: Dict[str, Any] = {}
    convs = [k for k in keys if k.endswith(".weight") and sd[k].ndim == 4]
    if not convs:
        raise KeyError(f"No conv weights under {prefix}")
    if len(convs) == 1:
        main, pw = convs[0], None
    else:
        assert len(convs) == 2, f"{prefix}: expected at most 2 conv weights"
        sq = [k for k in convs
              if sd[k].shape[0] == sd[k].shape[1] and sd[k].shape[2:] == (1, 1)]
        a, b = convs
        pw = sq[-1] if sq else None
        assert pw is not None, f"{prefix}: cannot identify pointwise conv"
        main = a if pw == b else b
    params["w"] = np.asarray(sd[main], np.float32)
    if pw is not None:
        params["pw"] = np.asarray(sd[pw], np.float32)
    for k in keys:
        if k.endswith(".bias") and sd[k].ndim == 1 and k.replace(".bias", ".running_mean") not in sd:
            # conv bias (BN bias handled below)
            if k.replace(".bias", ".weight") in convs:
                params["b"] = np.asarray(sd[k], np.float32)
    bn_means = [k for k in keys if k.endswith(".running_mean")]
    if bn_means:
        base = bn_means[0].rsplit(".", 1)[0]
        params["bn"] = {
            "scale": np.asarray(sd[base + ".weight"], np.float32),
            "bias": np.asarray(sd[base + ".bias"], np.float32),
        }
        state["bn"] = {
            "mean": np.asarray(sd[base + ".running_mean"], np.float32),
            "var": np.asarray(sd[base + ".running_var"], np.float32),
        }
    return params, state


def _convert_gru(sd: Dict[str, np.ndarray], prefix: str) -> Dict:
    layers = []
    li = 0
    while f"{prefix}.weight_ih_l{li}" in sd:
        layers.append(
            {
                "w_ih": np.asarray(sd[f"{prefix}.weight_ih_l{li}"], np.float32),
                "w_hh": np.asarray(sd[f"{prefix}.weight_hh_l{li}"], np.float32),
                "b_ih": np.asarray(sd[f"{prefix}.bias_ih_l{li}"], np.float32),
                "b_hh": np.asarray(sd[f"{prefix}.bias_hh_l{li}"], np.float32),
            }
        )
        li += 1
    if not layers:
        raise KeyError(f"No GRU weights under {prefix}")
    return {"layers": layers}


def _convert_squeezed_gru(sd: Dict[str, np.ndarray], prefix: str) -> Dict:
    out: Dict[str, Any] = {
        "linear_in": {"w": np.asarray(sd[f"{prefix}.linear_in.0.weight"], np.float32)},
        "gru": _convert_gru(sd, f"{prefix}.gru"),
    }
    if f"{prefix}.linear_out.0.weight" in sd:
        out["linear_out"] = {"w": np.asarray(sd[f"{prefix}.linear_out.0.weight"], np.float32)}
    if f"{prefix}.gru_skip.weight" in sd:
        out["skip"] = {"w": np.asarray(sd[f"{prefix}.gru_skip.weight"], np.float32)}
    return out


def convert_dfn3_state_dict(sd: Dict[str, np.ndarray]) -> Tuple[Dict, Dict]:
    """Convert a reference DeepFilterNet3 `DfNet.state_dict()` (torch tensors
    or numpy arrays) into (params, state) for models.dfnet3.

    Buffers that are reconstructed statically on our side (erb_fb,
    erb_inv_fb, DF op pads) are ignored.
    """
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
          for k, v in sd.items()}
    params: Dict[str, Any] = {}
    state: Dict[str, Any] = {}
    for ours, theirs in _DFN3_CONV_MAP.items():
        p, s = _convert_conv_block(sd, theirs)
        params[ours] = p
        if s:
            state[ours] = s
    for ours, theirs in _DFN3_GRU_MAP.items():
        params[ours] = _convert_squeezed_gru(sd, theirs)
    params["df_fc_emb"] = {"w": np.asarray(sd["enc.df_fc_emb.0.weight"], np.float32)}
    params["lsnr_fc"] = {
        "w": np.asarray(sd["enc.lsnr_fc.0.weight"], np.float32),
        "b": np.asarray(sd["enc.lsnr_fc.0.bias"], np.float32),
    }
    params["df_out"] = {"w": np.asarray(sd["df_dec.df_out.0.weight"], np.float32)}
    params["df_fc_a"] = {
        "w": np.asarray(sd["df_dec.df_fc_a.0.weight"], np.float32),
        "b": np.asarray(sd["df_dec.df_fc_a.0.bias"], np.float32),
    }
    if "df_dec.df_skip.weight" in sd:
        params["df_skip"] = {"w": np.asarray(sd["df_dec.df_skip.weight"], np.float32)}
    return _to_jax(params), _to_jax(state)


def _convert_grouped_linear_shuffle(sd: Dict[str, np.ndarray], prefix: str) -> Dict:
    """Reference GroupedLinear (df/modules.py:826-856): per-group nn.Linear
    children at `{prefix}.layers.{i}`."""
    layers = []
    i = 0
    while f"{prefix}.layers.{i}.weight" in sd:
        layer = {"w": np.asarray(sd[f"{prefix}.layers.{i}.weight"], np.float32)}
        if f"{prefix}.layers.{i}.bias" in sd:
            layer["b"] = np.asarray(sd[f"{prefix}.layers.{i}.bias"], np.float32)
        layers.append(layer)
        i += 1
    if not layers:
        raise KeyError(f"No GroupedLinear weights under {prefix}")
    return {"layers": layers}


def _convert_grouped_gru(sd: Dict[str, np.ndarray], prefix: str) -> Dict:
    """Reference GroupedGRU (df/modules.py:577-660): per-layer
    GroupedGRULayer at `{prefix}.grus.{li}` holding per-group 1-layer torch
    GRUs at `.layers.{gi}`."""
    layers = []
    li = 0
    while f"{prefix}.grus.{li}.layers.0.weight_ih_l0" in sd:
        gs = []
        gi = 0
        while f"{prefix}.grus.{li}.layers.{gi}.weight_ih_l0" in sd:
            gs.append(_convert_gru(sd, f"{prefix}.grus.{li}.layers.{gi}"))
            gi += 1
        layers.append(gs)
        li += 1
    if not layers:
        raise KeyError(f"No GroupedGRU weights under {prefix}")
    return {"layers": layers}


def _convert_linear(sd: Dict[str, np.ndarray], prefix: str) -> Dict:
    out = {"w": np.asarray(sd[f"{prefix}.weight"], np.float32)}
    if f"{prefix}.bias" in sd:
        out["b"] = np.asarray(sd[f"{prefix}.bias"], np.float32)
    return out


_DFN2_CONV_MAP = _DFN3_CONV_MAP  # identical module paths (deepfilternet2.py)


def convert_dfn2_state_dict(sd: Dict[str, np.ndarray]) -> Tuple[Dict, Dict]:
    """Convert a reference DeepFilterNet2 `DfNet.state_dict()`
    (deepfilternet2.py:419-505) into (params, state) for models.dfnet2.
    Handles both gru_type variants: "grouped" (GroupedGRU/GroupedLinear)
    and "squeeze" (SqueezedGRU/GroupedLinearEinsum); the variant is
    auto-detected from the key names."""
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
          for k, v in sd.items()}
    params: Dict[str, Any] = {}
    state: Dict[str, Any] = {}
    for ours, theirs in _DFN2_CONV_MAP.items():
        p, s = _convert_conv_block(sd, theirs)
        params[ours] = p
        if s:
            state[ours] = s
    grouped = "enc.emb_gru.grus.0.layers.0.weight_ih_l0" in sd
    if grouped:
        params["df_fc_emb"] = _convert_grouped_linear_shuffle(sd, "enc.df_fc_emb")
        params["enc_emb_gru"] = _convert_grouped_gru(sd, "enc.emb_gru")
        params["dec_emb_gru"] = _convert_grouped_gru(sd, "erb_dec.emb_gru")
        params["dec_fc_emb"] = _convert_grouped_linear_shuffle(sd, "erb_dec.fc_emb.0")
        params["df_gru"] = _convert_grouped_gru(sd, "df_dec.df_gru")
    else:
        params["df_fc_emb"] = {
            "w": np.asarray(sd["enc.df_fc_emb.0.weight"], np.float32)
        }
        params["enc_emb_gru"] = _convert_squeezed_gru(sd, "enc.emb_gru")
        params["dec_emb_gru"] = _convert_squeezed_gru(sd, "erb_dec.emb_gru")
        params["df_gru"] = _convert_squeezed_gru(sd, "df_dec.df_gru")
    params["lsnr_fc"] = _convert_linear(sd, "enc.lsnr_fc.0")
    params["df_out"] = _convert_linear(sd, "df_dec.df_out.0")
    params["df_fc_a"] = _convert_linear(sd, "df_dec.df_fc_a.0")
    if "df_dec.df_skip.weight" in sd:
        params["df_skip"] = {"w": np.asarray(sd["df_dec.df_skip.weight"], np.float32)}
    return _to_jax(params), _to_jax(state)


_DFN1_CONV_MAP = {
    "erb_conv0": "enc.erb_conv0",
    "erb_conv1": "enc.erb_conv1",
    "erb_conv2": "enc.erb_conv2",
    "erb_conv3": "enc.erb_conv3",
    "df_conv0": "enc.df_conv0",
    "df_conv1": "enc.df_conv1",
    "conv3p": "erb_dec.conv3p",
    "convt3": "erb_dec.convt3",
    "conv2p": "erb_dec.conv2p",
    "convt2": "erb_dec.convt2",
    "conv1p": "erb_dec.conv1p",
    "convt1": "erb_dec.convt1",
    "conv0p": "erb_dec.conv0p",
    "conv0_out": "erb_dec.conv0_out",
    "df_convp": "df_dec.df_convp",
}


def convert_dfn1_state_dict(sd: Dict[str, np.ndarray]) -> Tuple[Dict, Dict]:
    """Convert a reference DeepFilterNet (v1) `DfNet.state_dict()`
    (deepfilternet.py:232-279; convkxf blocks, GroupedGRU/GroupedLinear
    heads) into (params, state) for models.dfnet1."""
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
          for k, v in sd.items()}
    params: Dict[str, Any] = {}
    state: Dict[str, Any] = {}
    for ours, theirs in _DFN1_CONV_MAP.items():
        p, s = _convert_conv_block(sd, theirs)
        params[ours] = p
        if s:
            state[ours] = s
    params["df_fc_emb"] = _convert_grouped_linear_shuffle(sd, "enc.df_fc_emb")
    params["enc_emb_gru"] = _convert_grouped_gru(sd, "enc.emb_gru")
    params["lsnr_fc"] = _convert_linear(sd, "enc.lsnr_fc.0")
    params["dec_fc_emb"] = _convert_grouped_linear_shuffle(sd, "erb_dec.fc_emb.0")
    params["df_gru"] = _convert_grouped_gru(sd, "df_dec.df_gru")
    params["df_out"] = _convert_linear(sd, "df_dec.df_fc_out.0")
    params["df_fc_a"] = _convert_linear(sd, "df_dec.df_fc_a.0")
    return _to_jax(params), _to_jax(state)


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .ckpt file into a numpy state dict (CPU torch only)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: v.detach().cpu().numpy() for k, v in obj.items() if hasattr(v, "detach")}
