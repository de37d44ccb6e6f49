"""Mesh parallelism tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepfilternet_tpu.enhance import init_df
from deepfilternet_tpu.parallel.mesh import (
    batch_sharding,
    data_parallel_mesh,
    shard_batch,
)
from deepfilternet_tpu.parallel.streams import ShardedStreamingRuntime
from deepfilternet_tpu.streaming import StreamingRuntime


class TestMesh:
    def test_eight_devices(self):
        assert len(jax.devices()) == 8

    def test_shard_batch_layout(self):
        mesh = data_parallel_mesh()
        batch = {"x": np.zeros((16, 4), np.float32)}
        sharded = shard_batch(batch, mesh)
        shards = sharded["x"].addressable_shards
        assert len(shards) == 8
        assert shards[0].data.shape == (2, 4)


class TestShardedStreaming:
    def test_matches_single_device(self, rng):
        model, df_state, _ = init_df()
        mesh = data_parallel_mesh()
        srt = ShardedStreamingRuntime(model, df_state, mesh)
        rt = StreamingRuntime(model, df_state)
        audio = rng.standard_normal((8, 480 * 6)).astype(np.float32) * 0.1
        c1 = srt.init(8)
        _, out_sharded = srt.process(c1, audio)
        c2 = rt.init(8)
        _, out_single = rt.process(c2, jnp.asarray(audio))
        np.testing.assert_allclose(
            np.asarray(out_sharded), np.asarray(out_single), atol=1e-4
        )

    def test_requires_divisible_streams(self):
        model, df_state, _ = init_df()
        srt = ShardedStreamingRuntime(model, df_state, data_parallel_mesh())
        with pytest.raises(AssertionError):
            srt.init(3)


class TestShardedServer:
    def test_server_over_mesh_matches_single_device(self, rng):
        """StreamServer(mesh=...) shards its slot pool over the 8-device
        mesh; a client's stream must match the unsharded runtime exactly
        (multi-chip serving story, zero cross-chip hot-path traffic)."""
        from deepfilternet_tpu.serve import StreamClient, StreamServer

        model, df_state, _ = init_df()
        mesh = data_parallel_mesh()
        srv = StreamServer(model, df_state, port=0, max_streams=16,
                           mesh=mesh, batch_window_ms=0.0)
        srv.start()
        port = srv._sock.getsockname()[1]
        try:
            audio = rng.standard_normal((1, 480 * 4)).astype(np.float32) * 0.1
            c = StreamClient(port=port)
            got = np.concatenate(
                [c.process_frame(audio[0, k * 480 : (k + 1) * 480])
                 for k in range(4)]
            )
            c.close()
            rt = StreamingRuntime(model, df_state)
            _, expected = rt.process(rt.init(1), jnp.asarray(audio))
            np.testing.assert_allclose(got, np.asarray(expected)[0], atol=1e-5)
        finally:
            srv.stop()


class TestDataParallelTrainStep:
    def test_gradients_match_single_device(self, rng):
        """DP-sharded train step must produce the same update as one device
        (the psum mean over shards == global batch mean)."""
        from deepfilternet_tpu.config import config
        from deepfilternet_tpu.models import dfnet3
        from deepfilternet_tpu.ops import Stft, erb_widths
        from deepfilternet_tpu.train.loss import Loss
        from deepfilternet_tpu.train.trainer import (
            init_train_state,
            make_optimizer,
            make_train_step,
        )

        config.reset()
        config.set("factor_magnitude", "100", section="SpectralLoss")
        params, state, cfg = dfnet3.init_dfnet3(jax.random.PRNGKey(0))
        loss_obj = Loss(Stft(48000, 960, 480), erb_widths(48000, 960, 32, 2),
                        cfg["nb_df"], (-15, 35))
        optimizer = make_optimizer()
        step = jax.jit(make_train_step(dfnet3, cfg, loss_obj, optimizer))
        b, t = 8, 6
        batch_np = {
            "noisy": rng.standard_normal((b, t, 481, 2)).astype(np.float32) * 0.1,
            "clean": rng.standard_normal((b, t, 481, 2)).astype(np.float32) * 0.05,
            "feat_erb": rng.standard_normal((b, t, 32)).astype(np.float32),
            "feat_spec": rng.standard_normal((b, t, 96, 2)).astype(np.float32),
        }
        lr = jnp.asarray(1e-3)
        wd = jnp.asarray(0.05)

        ts0 = init_train_state(params, state, optimizer)
        _, m_single = step(ts0, {k: jnp.asarray(v) for k, v in batch_np.items()}, lr, wd)

        mesh = data_parallel_mesh()
        batch_sh = shard_batch(batch_np, mesh)
        ts1 = init_train_state(params, state, optimizer)
        new_ts, m_sharded = step(ts1, batch_sh, lr, wd)
        np.testing.assert_allclose(
            float(m_single["loss"]), float(m_sharded["loss"]), rtol=1e-5
        )
