"""Trainer-stack parity vs the reference torch training semantics.

Covers the pieces between the loss value and the weight update:
  * optimizer: our make_optimizer() chain (global-norm clip 1.0 +
    AdamW/amsgrad + decoupled wd) step-for-step vs
    torch.nn.utils.clip_grad_norm_ + torch.optim.AdamW(amsgrad=True)
    (df/train.py:392-421, 474-512),
  * per-iteration lr/wd injection (train.py:357-362 analog).

The end-to-end torch-vs-jax trainer head-to-head on identical fixture
batches lives in scripts/head_to_head.py (committed results in
pretrained/HEAD_TO_HEAD.md); this file keeps the fast, deterministic
kernel of that proof in the suite.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepfilternet_tpu.train.trainer import (
    _set_lr,
    make_optimizer,
    scale_by_amsgrad_torch,
)


def _tree_from(rng, shapes):
    return {k: rng.standard_normal(s).astype(np.float32) for k, s in shapes.items()}


SHAPES = {"w1": (7, 5), "b1": (5,), "w2": (5, 3)}


class TestOptimizerTorchParity:
    @pytest.mark.parametrize("optimizer", ["adamw", "adam"])
    def test_step_for_step(self, rng, optimizer):
        import torch

        params_np = _tree_from(rng, SHAPES)
        grads_seq = [_tree_from(rng, SHAPES) for _ in range(25)]
        # include one huge-gradient step to exercise the global-norm clip
        grads_seq[5] = {k: v * 100 for k, v in grads_seq[5].items()}
        lrs = (np.abs(rng.standard_normal(len(grads_seq))) * 1e-3 + 1e-5).astype(
            np.float32)
        wd = 0.05

        # --- torch ---
        t_params = {
            k: torch.nn.Parameter(torch.from_numpy(v.copy()))
            for k, v in params_np.items()
        }
        cls = torch.optim.AdamW if optimizer == "adamw" else torch.optim.Adam
        opt = cls(t_params.values(), lr=1.0, weight_decay=wd, amsgrad=True)
        for gi, g in enumerate(grads_seq):
            for k, p in t_params.items():
                p.grad = torch.from_numpy(g[k].copy())
            torch.nn.utils.clip_grad_norm_(t_params.values(), 1.0)
            for group in opt.param_groups:
                group["lr"] = float(lrs[gi])
            opt.step()

        # --- ours ---
        opt_cfg = dict(lr=1.0, weight_decay=wd, optimizer=optimizer,
                       betas=(0.9, 0.999), amsgrad=True)
        optx = make_optimizer(opt_cfg)
        j_params = {k: jnp.asarray(v) for k, v in params_np.items()}
        state = optx.init(j_params)
        for gi, g in enumerate(grads_seq):
            state = _set_lr(state, jnp.asarray(lrs[gi]), jnp.asarray(wd))
            updates, state = optx.update(
                {k: jnp.asarray(v) for k, v in g.items()}, state, j_params)
            j_params = jax.tree.map(lambda p, u: p + u, j_params, updates)

        for k in SHAPES:
            np.testing.assert_allclose(
                np.asarray(j_params[k]), t_params[k].detach().numpy(),
                rtol=2e-5, atol=2e-6, err_msg=f"{optimizer}/{k}",
            )

    def test_amsgrad_raw_vs_corrected_max_differs(self, rng):
        """Documents WHY scale_by_amsgrad_torch exists: optax's amsgrad
        maxes the bias-corrected nu_hat and diverges from torch in early
        steps."""
        import optax

        g = {"w": jnp.asarray(rng.standard_normal((4,)).astype(np.float32))}
        ours = scale_by_amsgrad_torch()
        theirs = optax.scale_by_amsgrad()
        s_o, s_t = ours.init(g), theirs.init(g)
        diffs = []
        # decreasing gradients: the raw-v max freezes at the early peak
        # while the bias-corrected max keeps the (much larger) corrected
        # first-step value
        for i in range(3):
            gi = jax.tree.map(lambda x: x * (1.0 if i == 0 else 1e-3), g)
            u_o, s_o = ours.update(gi, s_o)
            u_t, s_t = theirs.update(gi, s_t)
            diffs.append(float(jnp.max(jnp.abs(u_o["w"] - u_t["w"]))))
        assert max(diffs) > 1e-3, diffs
