"""LADSPA plugin test: build native/ladspa_df.so, host it via a ctypes
LADSPA host, stream audio through the real stream server, and assert the
output matches the direct StreamingRuntime path (shifted by the plugin's
one-hop buffering latency). Reference surface: ladspa/src/lib.rs.
"""

import ctypes
import os
import subprocess

import numpy as np
import pytest

import jax.numpy as jnp

from deepfilternet_tpu.enhance import init_df
from deepfilternet_tpu.serve import StreamServer
from deepfilternet_tpu.streaming import StreamingRuntime

HOP = 480
NATIVE = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")


class _PortRangeHint(ctypes.Structure):
    _fields_ = [("HintDescriptor", ctypes.c_int),
                ("LowerBound", ctypes.c_float),
                ("UpperBound", ctypes.c_float)]


class _Descriptor(ctypes.Structure):
    pass


_Handle = ctypes.c_void_p
_Descriptor._fields_ = [
    ("UniqueID", ctypes.c_ulong),
    ("Label", ctypes.c_char_p),
    ("Properties", ctypes.c_int),
    ("Name", ctypes.c_char_p),
    ("Maker", ctypes.c_char_p),
    ("Copyright", ctypes.c_char_p),
    ("PortCount", ctypes.c_ulong),
    ("PortDescriptors", ctypes.POINTER(ctypes.c_int)),
    ("PortNames", ctypes.POINTER(ctypes.c_char_p)),
    ("PortRangeHints", ctypes.POINTER(_PortRangeHint)),
    ("ImplementationData", ctypes.c_void_p),
    ("instantiate", ctypes.CFUNCTYPE(_Handle, ctypes.POINTER(_Descriptor),
                                     ctypes.c_ulong)),
    ("connect_port", ctypes.CFUNCTYPE(None, _Handle, ctypes.c_ulong,
                                      ctypes.POINTER(ctypes.c_float))),
    ("activate", ctypes.CFUNCTYPE(None, _Handle)),
    ("run", ctypes.CFUNCTYPE(None, _Handle, ctypes.c_ulong)),
    ("run_adding", ctypes.c_void_p),
    ("set_run_adding_gain", ctypes.c_void_p),
    ("deactivate", ctypes.c_void_p),
    ("cleanup", ctypes.CFUNCTYPE(None, _Handle)),
]


@pytest.fixture(scope="module")
def plugin_lib():
    subprocess.run(["make", "-C", NATIVE, "ladspa_df.so"], check=True,
                   capture_output=True)
    lib = ctypes.CDLL(os.path.join(NATIVE, "ladspa_df.so"))
    lib.ladspa_descriptor.restype = ctypes.POINTER(_Descriptor)
    lib.ladspa_descriptor.argtypes = [ctypes.c_ulong]
    return lib


@pytest.fixture(scope="module")
def server():
    model, df_state, _ = init_df()
    srv = StreamServer(model, df_state, port=0)
    srv.start()
    port = srv._sock.getsockname()[1]
    yield model, df_state, port
    srv.stop()


def _run_plugin(lib, desc_idx, port, channels, block=256):
    """Drive [C, T] audio through the plugin in `block`-sample chunks."""
    desc = lib.ladspa_descriptor(desc_idx).contents
    os.environ["DF_SERVER_HOST"] = "127.0.0.1"
    os.environ["DF_SERVER_PORT"] = str(port)
    handle = desc.instantiate(ctypes.byref(desc), 48000)
    assert handle
    nch = channels.shape[0]
    bufs_in = [(ctypes.c_float * block)() for _ in range(nch)]
    bufs_out = [(ctypes.c_float * block)() for _ in range(nch)]
    latency = ctypes.c_float(0.0)
    for c in range(nch):
        desc.connect_port(handle, c, bufs_in[c])
        desc.connect_port(handle, nch + c, bufs_out[c])
    desc.connect_port(handle, 2 * nch,
                      ctypes.cast(ctypes.byref(latency),
                                  ctypes.POINTER(ctypes.c_float)))
    desc.activate(handle)
    t = channels.shape[1]
    out = np.zeros_like(channels)
    for start in range(0, t - block + 1, block):
        for c in range(nch):
            bufs_in[c][:] = channels[c, start : start + block].tolist()
        desc.run(handle, block)
        for c in range(nch):
            out[c, start : start + block] = np.frombuffer(
                bytearray(bufs_out[c]), dtype=np.float32
            )
    desc.cleanup(handle)
    return out, float(latency.value)


class TestLadspa:
    def test_descriptors(self, plugin_lib):
        mono = plugin_lib.ladspa_descriptor(0).contents
        stereo = plugin_lib.ladspa_descriptor(1).contents
        assert mono.Label == b"deep_filter_mono" and mono.PortCount == 3
        assert stereo.Label == b"deep_filter_stereo" and stereo.PortCount == 5
        assert not plugin_lib.ladspa_descriptor(2)

    def test_mono_matches_runtime(self, plugin_lib, server, rng):
        model, df_state, port = server
        audio = (rng.standard_normal((1, HOP * 8)) * 0.1).astype(np.float32)
        got, latency = _run_plugin(plugin_lib, 0, port, audio, block=256)
        assert latency == 2 * HOP  # 20 ms total, reference-parity

        rt = StreamingRuntime(model, df_state)
        carry = rt.init(1)
        _, expected = rt.process(carry, jnp.asarray(audio))
        expected = np.asarray(expected)
        # plugin output is the runtime output delayed by one buffering hop
        n = (audio.shape[1] // 256) * 256 - HOP
        np.testing.assert_allclose(
            got[0, HOP : HOP + n], expected[0, :n], atol=1e-5
        )
        assert np.allclose(got[0, :HOP], 0.0)  # primed silence

    def test_stereo_channels_independent(self, plugin_lib, server, rng):
        model, df_state, port = server
        audio = (rng.standard_normal((2, HOP * 4)) * 0.1).astype(np.float32)
        got, _ = _run_plugin(plugin_lib, 1, port, audio, block=480)
        rt = StreamingRuntime(model, df_state)
        carry = rt.init(2)
        _, expected = rt.process(carry, jnp.asarray(audio))
        expected = np.asarray(expected)
        n = audio.shape[1] - HOP
        for c in range(2):
            np.testing.assert_allclose(
                got[c, HOP : HOP + n], expected[c, :n], atol=1e-5
            )

    def test_bypass_without_server(self, plugin_lib, rng):
        os.environ["DF_SERVER_PORT"] = "1"  # nothing listens here
        desc = plugin_lib.ladspa_descriptor(0).contents
        handle = desc.instantiate(ctypes.byref(desc), 48000)
        buf_in = (ctypes.c_float * 64)(*([0.5] * 64))
        buf_out = (ctypes.c_float * 64)()
        desc.connect_port(handle, 0, buf_in)
        desc.connect_port(handle, 1, buf_out)
        desc.activate(handle)
        desc.run(handle, 64)
        desc.cleanup(handle)
        assert np.allclose(np.frombuffer(bytearray(buf_out), np.float32), 0.5)
