"""Terminal demo client end-to-end: wav -> live server -> enhanced wav."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from deepfilternet_tpu.enhance import init_df
from deepfilternet_tpu.scripts.demo_client import main as demo_main
from deepfilternet_tpu.serve import StreamServer
from deepfilternet_tpu.streaming import StreamingRuntime
from deepfilternet_tpu.utils.audio_io import load_audio, save_audio

HOP = 480


@pytest.fixture(scope="module")
def server():
    model, df_state, _ = init_df()
    srv = StreamServer(model, df_state, port=0)
    srv.start()
    yield model, df_state, srv._sock.getsockname()[1]
    srv.stop()


def test_demo_client_end_to_end(server, rng, tmp_path, capsys):
    model, df_state, port = server
    audio = (rng.standard_normal((1, HOP * 6)) * 0.1).astype(np.float32)
    in_wav = os.path.join(tmp_path, "in.wav")
    out_wav = os.path.join(tmp_path, "out.wav")
    save_audio(in_wav, audio, 48000, dtype="float32")

    demo_main([in_wav, "--port", str(port), "--no-realtime", "--out", out_wav])
    got, sr = load_audio(out_wav)
    assert sr == 48000

    rt = StreamingRuntime(model, df_state)
    carry = rt.init(1)
    loaded, _ = load_audio(in_wav)
    _, expected = rt.process(carry, jnp.asarray(np.asarray(loaded)))
    np.testing.assert_allclose(
        np.asarray(got)[0], np.asarray(expected)[0], atol=1e-4
    )
    assert "rtf=" in capsys.readouterr().out
