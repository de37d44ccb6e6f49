"""Streaming runtime tests: end-to-end parity with offline enhance()."""

import numpy as np
import pytest

import jax.numpy as jnp

from deepfilternet_tpu.enhance import enhance, init_df
from deepfilternet_tpu.streaming import StreamingRuntime
from deepfilternet_tpu.utils.audio_io import load_audio

ASSET = "/root/reference/assets/noisy_snr0.wav"


@pytest.fixture(scope="module")
def setup():
    model, df_state, _ = init_df()
    rt = StreamingRuntime(model, df_state)
    return model, df_state, rt


class TestStreamingRuntime:
    def test_streaming_equals_offline_enhance(self, setup):
        """The full streaming pipeline must reproduce offline enhance()
        (same delay semantics, pad=False path)."""
        model, df_state, rt = setup
        audio, _ = load_audio(ASSET)
        audio = audio[:, : 480 * 50]  # 0.5 s
        off = enhance(model, df_state, audio, pad=False)

        carry = rt.init(1)
        carry, out = rt.process(carry, jnp.asarray(audio))
        out = np.asarray(out)
        assert out.shape == off.shape
        np.testing.assert_allclose(out, off, atol=1e-4)

    def test_chunked_equals_single_shot(self, setup):
        """Processing in chunks must equal one big call (state continuity)."""
        _, _, rt = setup
        rng = np.random.default_rng(1)
        audio = rng.standard_normal((2, 480 * 20)).astype(np.float32) * 0.1
        c1 = rt.init(2)
        _, full = rt.process(c1, jnp.asarray(audio))
        c2 = rt.init(2)
        outs = []
        for i in range(4):
            chunk = jnp.asarray(audio[:, i * 2400 : (i + 1) * 2400])
            c2, o = rt.process(c2, chunk)
            outs.append(np.asarray(o))
        np.testing.assert_allclose(
            np.concatenate(outs, axis=1), np.asarray(full), atol=1e-5
        )

    def test_process_frame(self, setup):
        _, _, rt = setup
        rng = np.random.default_rng(2)
        audio = rng.standard_normal((1, 480 * 3)).astype(np.float32) * 0.1
        c = rt.init(1)
        _, full = rt.process(c, jnp.asarray(audio))
        c = rt.init(1)
        outs = []
        for i in range(3):
            c, o = rt.process_frame(c, jnp.asarray(audio[:, i * 480 : (i + 1) * 480]))
            outs.append(np.asarray(o))
        np.testing.assert_allclose(np.concatenate(outs, 1), np.asarray(full), atol=1e-5)


class TestPackedCarry:
    def test_packed_carry_matches_reference(self, setup, rng):
        """packed_carry=True (one flat scan buffer per dtype) must be
        bit-compatible with the default multi-buffer carry: the packer only
        changes the while-loop's carry layout, never the cell math."""
        model, df_state, rt = setup
        rt_p = StreamingRuntime(model, df_state, packed_carry=True)
        audio = jnp.asarray(
            rng.standard_normal((2, 480 * 6)).astype(np.float32) * 0.1
        )
        c_ref, out_ref = rt.process(rt.init(2), audio)
        c_p, out_p = rt_p.process(rt_p.init(2), audio)
        np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_ref),
                                   atol=1e-6)
        # carry state (incl. int32 silence counter) survives the round trip
        import jax

        for a, b in zip(jax.tree.leaves(c_p), jax.tree.leaves(c_ref)):
            assert a.dtype == b.dtype
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_packed_carry_bf16(self, setup, rng):
        """Mixed-dtype carries (bf16 model state + f32 frontend/ring
        buffers + int32 counter) pack into separate per-dtype buffers."""
        model, df_state, _ = setup
        rt_b = StreamingRuntime(model, df_state, dtype=jnp.bfloat16)
        rt_pb = StreamingRuntime(model, df_state, dtype=jnp.bfloat16,
                                 packed_carry=True)
        audio = jnp.asarray(
            rng.standard_normal((2, 480 * 4)).astype(np.float32) * 0.1
        )
        _, out_ref = rt_b.process(rt_b.init(2), audio)
        _, out_p = rt_pb.process(rt_pb.init(2), audio)
        np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_ref),
                                   atol=1e-6)


class TestFusedGru:
    def test_gru_step_fused_matches(self, rng):
        """fuse_gru_layer: one [(I+H),4H] matmul per layer must match the
        two-matmul torch layout (up to matmul reduction order)."""
        import jax

        from deepfilternet_tpu.nn import fuse_gru_tree, gru_step, init_gru

        p = init_gru(jax.random.PRNGKey(0), 24, 16, num_layers=3)
        pf = fuse_gru_tree(p)
        assert "w_cat" in pf["layers"][0] and "w_ih" not in pf["layers"][0]
        h = jnp.asarray(rng.standard_normal((3, 5, 16)).astype(np.float32))
        x = jnp.asarray(rng.standard_normal((5, 24)).astype(np.float32))
        h1, o1 = gru_step(p, h, x)
        h2, o2 = gru_step(pf, h, x)
        np.testing.assert_allclose(np.asarray(o2), np.asarray(o1), atol=1e-6)
        np.testing.assert_allclose(np.asarray(h2), np.asarray(h1), atol=1e-6)

    def test_grouped_gru_step_fused_matches(self, rng):
        """fuse_gru_tree must reach the per-group leaf GRUs of GroupedGRU."""
        import jax

        from deepfilternet_tpu.nn import (
            fuse_gru_tree,
            grouped_gru_step,
            init_grouped_gru,
        )

        p, cfg = init_grouped_gru(
            jax.random.PRNGKey(1), 32, 32, num_layers=2, groups=4
        )
        pf = fuse_gru_tree(p)
        h = jnp.asarray(rng.standard_normal((8, 3, 8)).astype(np.float32))
        x = jnp.asarray(rng.standard_normal((3, 32)).astype(np.float32))
        h1, o1 = grouped_gru_step(p, cfg, h, x)
        h2, o2 = grouped_gru_step(pf, cfg, h, x)
        np.testing.assert_allclose(np.asarray(o2), np.asarray(o1), atol=1e-6)
        np.testing.assert_allclose(np.asarray(h2), np.asarray(h1), atol=1e-6)

    def test_gru_apply_fused_matches(self, rng):
        """Offline gru_apply must also accept the fused layout (the chunked
        runtime shares the transformed params)."""
        import jax

        from deepfilternet_tpu.nn import fuse_gru_tree, gru_apply, init_gru

        p = init_gru(jax.random.PRNGKey(2), 12, 20, num_layers=2)
        x = jnp.asarray(rng.standard_normal((3, 7, 12)).astype(np.float32))
        o1, h1 = gru_apply(p, x)
        o2, h2 = gru_apply(fuse_gru_tree(p), x)
        np.testing.assert_allclose(np.asarray(o2), np.asarray(o1), atol=1e-6)
        np.testing.assert_allclose(np.asarray(h2), np.asarray(h1), atol=1e-6)

    def test_runtime_fuse_ops_bf16(self, setup, rng):
        """fuse_ops composes with the bf16 weight cast (the cast must copy
        from the transformed model, not the original)."""
        model, df_state, _ = setup
        rt_b = StreamingRuntime(model, df_state, dtype=jnp.bfloat16)
        rt_fb = StreamingRuntime(
            model, df_state, dtype=jnp.bfloat16, fuse_ops=True
        )
        assert "w_cat" in rt_fb.model.params["df_gru"]["gru"]["layers"][0]
        assert rt_fb.model.params["_emb_heads"]["w"].dtype == jnp.bfloat16
        audio = rng.standard_normal((2, 480 * 4)).astype(np.float32) * 0.1
        _, ref = rt_b.process(rt_b.init(2), jnp.asarray(audio))
        _, got = rt_fb.process(rt_fb.init(2), jnp.asarray(audio))
        # same precision, different matmul reduction order: bound the
        # divergence against the signal scale
        ref = np.asarray(ref)
        assert np.abs(np.asarray(got) - ref).max() / np.abs(ref).max() < 0.05

    def test_runtime_fuse_ops_matches_reference(self, setup, rng):
        """StreamingRuntime(fuse_ops=True) end-to-end parity: GRU gate
        fusion + merged emb heads only change matmul layout/batching, so
        outputs match to fp-reassociation level."""
        model, df_state, rt = setup
        rt_f = StreamingRuntime(model, df_state, fuse_ops=True)
        # both transforms must actually be active for DFN3
        assert "w_cat" in rt_f.model.params["df_gru"]["gru"]["layers"][0]
        assert rt_f.cfg.get("emb_heads"), "emb heads should merge for DFN3"
        audio = jnp.asarray(
            rng.standard_normal((2, 480 * 5)).astype(np.float32) * 0.1
        )
        _, out_ref = rt.process(rt.init(2), audio)
        _, out_f = rt_f.process(rt_f.init(2), audio)
        np.testing.assert_allclose(
            np.asarray(out_f), np.asarray(out_ref), atol=1e-4
        )


class TestFoldConv:
    def test_fold_conv_layer_matches(self, rng):
        """Dense dw+pw+eval-BN fold must match the separable block for
        normal and transposed conv variants (up to fp reassociation)."""
        import jax

        from deepfilternet_tpu.nn import (
            conv2d_norm_act_step,
            conv_transpose2d_norm_act_step,
            fold_conv_layer,
            init_conv2d_norm_act,
            init_conv_transpose2d_norm_act,
        )

        cases = [
            (init_conv2d_norm_act, dict(kernel=(3, 3)), 2, 16),   # grouped+pw
            (init_conv2d_norm_act, dict(kernel=(1, 3), fstride=2), 16, 16),
            (init_conv2d_norm_act, dict(kernel=(1, 1)), 16, 16),  # dw-only
            (init_conv2d_norm_act, dict(kernel=(3, 3)), 1, 16),   # plain
            (init_conv_transpose2d_norm_act, dict(kernel=(1, 3), fstride=2),
             16, 16),
        ]
        for i, (init, kw, ci, co) in enumerate(cases):
            prm, st, cfg = init(jax.random.PRNGKey(i), ci, co,
                                bias=False, separable=True, **kw)
            # non-trivial BN stats so the fold is actually tested
            if st:
                st["bn"]["mean"] = jnp.asarray(
                    rng.standard_normal(co).astype(np.float32) * 0.1)
                st["bn"]["var"] = jnp.asarray(
                    1.0 + 0.5 * rng.random(co).astype(np.float32))
            fp, fcfg = fold_conv_layer(prm, st, cfg)
            assert fcfg["groups"] == 1 and not fcfg["norm"]
            x = jnp.asarray(
                rng.standard_normal((3, ci, cfg["kernel"][0], 24)
                                    ).astype(np.float32))
            step = (conv_transpose2d_norm_act_step if cfg.get("transposed")
                    else conv2d_norm_act_step)
            ref = step(prm, st, cfg, x)
            got = step(fp, {}, fcfg, x)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=1e-5, err_msg=f"case {i}")

    def test_runtime_folds_convs(self, setup, rng):
        """fuse_convs=True (opt-in; measured-and-refuted on chip, PERF.md
        r04) must fold the DFN3 conv stack and keep e2e parity."""
        model, df_state, rt = setup
        rt_f = StreamingRuntime(model, df_state, fuse_ops=True,
                                fuse_convs=True)
        L = rt_f.cfg["layers"]
        assert L["erb_conv1"]["groups"] == 1 and not L["erb_conv1"]["norm"]
        assert "pw" not in rt_f.model.params["erb_conv1"]
        assert L["convt2"]["groups"] == 1 and not L["convt2"]["norm"]
        audio = jnp.asarray(
            rng.standard_normal((2, 480 * 4)).astype(np.float32) * 0.1
        )
        _, ref = rt.process(rt.init(2), audio)
        _, got = rt_f.process(rt_f.init(2), audio)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)

    def test_gru_pair_merge_parity(self, setup, rng):
        """fuse_gru_pairs=True (opt-in; measured-and-refuted on chip,
        PERF.md r04) pair-merges the dec/df first GRU layers and must
        keep e2e parity."""
        model, df_state, rt = setup
        rt_p = StreamingRuntime(model, df_state, fuse_ops=True,
                                fuse_gru_pairs=True)
        assert rt_p.cfg.get("decdf_gru0"), "dec/df GRU0 should pair-merge"
        audio = jnp.asarray(
            rng.standard_normal((2, 480 * 4)).astype(np.float32) * 0.1
        )
        _, ref = rt.process(rt.init(2), audio)
        _, got = rt_p.process(rt_p.init(2), audio)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)

    def test_out_dtype_bf16(self, setup, rng):
        """out_dtype=bf16 (S=8192 capacity knob) only quantizes the output."""
        model, df_state, rt = setup
        rt_b = StreamingRuntime(model, df_state, out_dtype=jnp.bfloat16)
        audio = jnp.asarray(
            rng.standard_normal((2, 480 * 4)).astype(np.float32) * 0.1
        )
        _, ref = rt.process(rt.init(2), audio)
        _, got = rt_b.process(rt_b.init(2), audio)
        assert got.dtype == jnp.bfloat16
        ref = np.asarray(ref)
        scale = np.abs(ref).max()
        assert np.abs(np.asarray(got, np.float32) - ref).max() < 0.01 * scale


class TestPallasFrontend:
    def test_fused_kernel_matches_jnp(self, setup, rng):
        """Pallas fused frontend (interpret mode on CPU) must match the jnp
        path through the whole pipeline."""
        model, df_state, rt = setup
        from deepfilternet_tpu.streaming import StreamingRuntime

        rt_p = StreamingRuntime(model, df_state, use_pallas=True)
        audio = jnp.asarray(
            rng.standard_normal((2, 480 * 4)).astype(np.float32) * 0.1
        )
        _, out_ref = rt.process(rt.init(2), audio)
        _, out_pal = rt_p.process(rt_p.init(2), audio)
        np.testing.assert_allclose(
            np.asarray(out_pal), np.asarray(out_ref), atol=1e-4
        )


class TestFusedCell:
    def test_fused_runtime_matches_reference(self, setup, rng):
        model, df_state, rt = setup
        from deepfilternet_tpu.streaming import StreamingRuntime

        rt_f = StreamingRuntime(model, df_state, fused=True)
        audio = jnp.asarray(rng.standard_normal((2, 480 * 5)).astype(np.float32) * 0.1)
        _, out_ref = rt.process(rt.init(2), audio)
        _, out_fused = rt_f.process(rt_f.init(2), audio)
        np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                                   atol=1e-4)


class TestChunkedRuntime:
    def test_matches_per_frame_runtime(self, setup, rng):
        model, df_state, rt = setup
        from deepfilternet_tpu.streaming import ChunkedStreamingRuntime

        crt = ChunkedStreamingRuntime(model, df_state)
        audio = rng.standard_normal((2, 480 * 12)).astype(np.float32) * 0.1
        _, ref = rt.process(rt.init(2), jnp.asarray(audio))
        c = crt.init(2)
        outs = []
        for i in range(3):  # 3 chunks of 4 frames: state continuity
            c, o = crt.process(c, jnp.asarray(audio[:, i * 1920 : (i + 1) * 1920]))
            outs.append(np.asarray(o))
        got = np.concatenate(outs, axis=1)
        np.testing.assert_allclose(got, np.asarray(ref), atol=1e-4)


class TestChunkedRuntimeAllGenerations:
    @pytest.mark.parametrize("model_dir", [
        "pretrained/dfn1_fixture_demo",
        "pretrained/dfn2_fixture_demo",
    ])
    def test_matches_per_frame_runtime(self, model_dir, rng):
        from deepfilternet_tpu.streaming import ChunkedStreamingRuntime

        model, df_state, _ = init_df(model_dir)
        rt = StreamingRuntime(model, df_state)
        crt = ChunkedStreamingRuntime(model, df_state, chunk_frames=4)
        audio = rng.standard_normal((2, 480 * 10)).astype(np.float32) * 0.1
        _, ref = rt.process(rt.init(2), jnp.asarray(audio))
        c = crt.init(2)
        outs = []
        for lo, hi in [(0, 4800 * 0 + 2880), (2880, 4800)]:  # 6 | 4 frames
            c, o = crt.process(c, jnp.asarray(audio[:, lo:hi]))
            outs.append(np.asarray(o))
        np.testing.assert_allclose(np.concatenate(outs, 1), np.asarray(ref),
                                   atol=1e-4)


class TestChunkedRuntimeParams:
    """Regression: the chunked runtime must apply the same post-model
    RuntimeParams stages (LSNR gating, atten-lim, silence skip) as the
    per-frame cell — they were once silently skipped."""

    def test_gating_and_atten_lim_parity(self, setup, rng):
        from deepfilternet_tpu.streaming import (
            ChunkedStreamingRuntime,
            RuntimeParams,
        )

        model, df_state, _ = setup
        rp = RuntimeParams(atten_lim_db=12.0, lsnr_gating=True)
        rt = StreamingRuntime(model, df_state, rp)
        crt = ChunkedStreamingRuntime(model, df_state, rp, chunk_frames=4)
        audio = rng.standard_normal((2, 480 * 10)).astype(np.float32) * 0.1
        _, ref = rt.process(rt.init(2), jnp.asarray(audio))
        _, got = crt.process(crt.init(2), jnp.asarray(audio))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    def test_silence_counter_continuity(self, setup):
        from deepfilternet_tpu.streaming import (
            ChunkedStreamingRuntime,
            RuntimeParams,
        )

        model, df_state, _ = setup
        rp = RuntimeParams()
        rt = StreamingRuntime(model, df_state, rp)
        crt = ChunkedStreamingRuntime(model, df_state, rp, chunk_frames=4)
        z = np.zeros((1, 480 * 3), np.float32)
        cA, cB = rt.init(1), crt.init(1)
        cA, _ = rt.process(cA, jnp.asarray(z))
        cB, _ = crt.process(cB, jnp.asarray(z))
        assert int(cA.silence_ctr[0]) == int(cB.silence_ctr[0]) == 3
        # a loud frame inside the next chunk resets both counters identically
        loud = np.concatenate([z[:, :480], np.full((1, 480), 0.5, np.float32),
                               z[:, :960]], axis=1)
        cA, _ = rt.process(cA, jnp.asarray(loud))
        cB, _ = crt.process(cB, jnp.asarray(loud))
        assert int(cA.silence_ctr[0]) == int(cB.silence_ctr[0]) == 2

    def test_unsupported_options_rejected(self, setup):
        from deepfilternet_tpu.streaming import ChunkedStreamingRuntime

        model, df_state, _ = setup
        with pytest.raises(NotImplementedError):
            ChunkedStreamingRuntime(model, df_state, use_pallas=True)


class TestMultiChannelReduceMask:
    """Multi-channel mask reduction (tract.rs:117-193): streams are
    (stream, channel) groups; the ERB mask is reduced over channels and the
    shared mask re-applied to every channel's spectrum."""

    def _run(self, setup, audio, reduce, n_ch):
        from deepfilternet_tpu.streaming import RuntimeParams

        model, df_state, _ = setup
        rp = RuntimeParams(reduce_mask=reduce, n_channels=n_ch)
        rt = StreamingRuntime(model, df_state, rp)
        _, out = rt.process(rt.init(audio.shape[0]), jnp.asarray(audio))
        return np.asarray(out)

    def test_identical_channels_match_none(self, setup, rng):
        a = rng.standard_normal((1, 480 * 6)).astype(np.float32) * 0.1
        stereo = np.concatenate([a, a], axis=0)  # 2 identical channels
        got = self._run(setup, stereo, "max", 2)
        ref = self._run(setup, stereo, "none", 1)
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_channel_order_equivariance(self, setup, rng):
        a = rng.standard_normal((2, 480 * 6)).astype(np.float32) * 0.1
        fwd = self._run(setup, a, "max", 2)
        rev = self._run(setup, a[::-1].copy(), "max", 2)
        np.testing.assert_allclose(fwd, rev[::-1], atol=1e-5)

    def test_reduction_changes_output(self, setup, rng):
        a = rng.standard_normal((2, 480 * 6)).astype(np.float32) * 0.1
        for reduce in ("max", "mean"):
            got = self._run(setup, a, reduce, 2)
            ref = self._run(setup, a, "none", 1)
            assert not np.allclose(got, ref, atol=1e-5), reduce


class TestChunkedRuntimeBf16:
    def test_bf16_matches_per_frame_bf16(self, setup, rng):
        """bf16 chunked runtime tracks the bf16 per-frame cell (same
        reduced-precision policy: features/model bf16, spectrum f32) to
        within bf16 rounding across chunk boundaries."""
        from deepfilternet_tpu.streaming import ChunkedStreamingRuntime

        model, df_state, _ = setup
        rt = StreamingRuntime(model, df_state, dtype=jnp.bfloat16)
        crt = ChunkedStreamingRuntime(
            model, df_state, chunk_frames=4, dtype=jnp.bfloat16
        )
        audio = rng.standard_normal((2, 480 * 8)).astype(np.float32) * 0.1
        _, ref = rt.process(rt.init(2), jnp.asarray(audio))
        c = crt.init(2)
        outs = []
        for lo, hi in [(0, 480 * 5), (480 * 5, 480 * 8)]:  # 5 | 3 frames
            c, o = crt.process(c, jnp.asarray(audio[:, lo:hi]))
            outs.append(np.asarray(o))
        got = np.concatenate(outs, 1)
        # both runtimes round differently inside the model (per-frame vs
        # frame-parallel matmul shapes); bound the divergence against the
        # signal scale rather than expecting bitwise equality
        denom = np.abs(np.asarray(ref)).max()
        assert np.abs(got - np.asarray(ref)).max() / denom < 0.1
        # and both stay close to the f32 reference
        f32 = StreamingRuntime(model, df_state)
        _, exact = f32.process(f32.init(2), jnp.asarray(audio))
        assert np.abs(got - np.asarray(exact)).max() / denom < 0.1
