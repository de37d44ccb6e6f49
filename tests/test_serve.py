"""Stream server tests: protocol round trip + parity with direct runtime."""

import numpy as np
import pytest

import jax.numpy as jnp

from deepfilternet_tpu.enhance import init_df
from deepfilternet_tpu.serve import StreamClient, StreamServer
from deepfilternet_tpu.streaming import StreamingRuntime


@pytest.fixture(scope="module")
def server():
    model, df_state, _ = init_df()
    srv = StreamServer(model, df_state, port=0)  # ephemeral port
    srv.start()
    port = srv._sock.getsockname()[1]
    yield model, df_state, port
    srv.stop()


class TestStreamServer:
    def test_round_trip_matches_runtime(self, server, rng):
        model, df_state, port = server
        client = StreamClient(port=port)
        audio = rng.standard_normal((1, 480 * 6)).astype(np.float32) * 0.1
        outs = []
        for i in range(3):
            chunk = audio[:, i * 960 : (i + 1) * 960]
            outs.append(client.process_frame(chunk))
        client.close()
        got = np.concatenate(outs)

        rt = StreamingRuntime(model, df_state)
        carry = rt.init(1)
        _, expected = rt.process(carry, jnp.asarray(audio))
        np.testing.assert_allclose(got, np.asarray(expected)[0], atol=1e-5)

    def test_rejects_partial_hop(self, server):
        _, _, port = server
        client = StreamClient(port=port)
        out = client.process_frame(np.zeros(100, np.float32))
        assert out.size == 0
        client.sock.close()

    def test_concurrent_clients_are_isolated(self, server, rng):
        _, _, port = server
        c1 = StreamClient(port=port)
        c2 = StreamClient(port=port)
        a1 = rng.standard_normal(960).astype(np.float32) * 0.1
        a2 = rng.standard_normal(960).astype(np.float32) * 0.1
        o1a = c1.process_frame(a1)
        o2 = c2.process_frame(a2)
        o1b = c1.process_frame(a1)
        c1.close()
        c2.close()
        # second frame differs from first (state advanced) and c2 was not
        # affected by c1's state
        assert not np.allclose(o1a, o1b)
        assert o2.shape == o1a.shape


class TestDynamicBatching:
    def test_concurrent_clients_batch_into_one_dispatch(self, rng):
        """N=4 concurrent clients -> their hops coalesce into shared TPU
        dispatches (dispatches < total frames), and each stream's output
        equals a fresh per-connection run (VERDICT round-1 item 5)."""
        import threading

        model, df_state, _ = init_df()
        srv = StreamServer(model, df_state, port=0, max_streams=8,
                           batch_window_ms=120.0)
        srv.start()
        port = srv._sock.getsockname()[1]
        try:
            n_clients, n_frames = 4, 3
            audios = [
                rng.standard_normal((480 * n_frames,)).astype(np.float32) * 0.1
                for _ in range(n_clients)
            ]
            outs = [None] * n_clients

            def run(i):
                c = StreamClient(port=port)
                got = [c.process_frame(audios[i][k * 480 : (k + 1) * 480])
                       for k in range(n_frames)]
                c.close()
                outs[i] = np.concatenate(got)

            threads = [threading.Thread(target=run, args=(i,))
                       for i in range(n_clients)]
            for t in threads:
                t.start()
            for t in threads:
                t.join(120)
            total_frames = n_clients * n_frames
            assert srv.frames_processed == total_frames
            # with a 120 ms coalescing window all 4 clients share each tick
            assert srv.dispatches <= n_frames + 1, (
                srv.dispatches, srv.frames_processed
            )

            rt = StreamingRuntime(model, df_state)
            for i in range(n_clients):
                carry = rt.init(1)
                _, expected = rt.process(carry, jnp.asarray(audios[i][None]))
                np.testing.assert_allclose(
                    outs[i], np.asarray(expected)[0], atol=1e-5,
                    err_msg=f"client {i}",
                )
        finally:
            srv.stop()

    def test_idle_slots_state_frozen(self, rng):
        """A client that pauses while another streams must see NO state
        advance: its next frame matches an uninterrupted run."""
        model, df_state, _ = init_df()
        srv = StreamServer(model, df_state, port=0, max_streams=4,
                           batch_window_ms=0.0)
        srv.start()
        port = srv._sock.getsockname()[1]
        try:
            a = rng.standard_normal((480 * 4,)).astype(np.float32) * 0.1
            b = rng.standard_normal((480 * 6,)).astype(np.float32) * 0.1
            c1 = StreamClient(port=port)
            c2 = StreamClient(port=port)
            o1a = c1.process_frame(a[: 480 * 2])
            # c2 streams alone for a while; c1 is idle
            for k in range(6):
                c2.process_frame(b[k * 480 : (k + 1) * 480])
            o1b = c1.process_frame(a[480 * 2 :])
            c1.close()
            c2.close()
            rt = StreamingRuntime(model, df_state)
            carry = rt.init(1)
            _, expected = rt.process(carry, jnp.asarray(a[None]))
            got = np.concatenate([o1a, o1b])
            np.testing.assert_allclose(got, np.asarray(expected)[0], atol=1e-5)
        finally:
            srv.stop()

    def test_pool_exhaustion_rejected(self):
        model, df_state, _ = init_df()
        srv = StreamServer(model, df_state, port=0, max_streams=1,
                           batch_window_ms=0.0)
        srv.start()
        port = srv._sock.getsockname()[1]
        try:
            c1 = StreamClient(port=port)
            c1.process_frame(np.zeros(480, np.float32))
            c2 = StreamClient(port=port)
            out = c2.process_frame(np.zeros(480, np.float32))
            assert out.size == 0  # rejected: no free slot
            c1.close()
            c2.sock.close()
        finally:
            srv.stop()


class TestMultichannelServer:
    def test_stereo_clients_share_reduced_mask(self, rng):
        """E2e stereo through the server with reduce_mask=max (VERDICT r3
        #7): two connections carry a stereo pair as a channel group; the
        server output must equal StreamingRuntime with the same
        RuntimeParams on the [2, T] pair (shared ERB gains, per-channel
        DF), which itself must differ from independent enhancement."""
        import threading

        from deepfilternet_tpu.streaming import RuntimeParams

        model, df_state, _ = init_df()
        rp = RuntimeParams(reduce_mask="max", n_channels=2)
        srv = StreamServer(model, df_state, port=0, max_streams=2,
                           runtime_params=rp, batch_window_ms=120.0)
        srv.start()
        port = srv._sock.getsockname()[1]
        try:
            n_frames = 4
            # a stereo pair with distinct channels
            audio = rng.standard_normal((2, 480 * n_frames)).astype(np.float32) * 0.1
            outs = [None, None]
            barrier = threading.Barrier(2)

            def run(ch):
                c = StreamClient(port=port)
                got = []
                for k in range(n_frames):
                    barrier.wait()  # keep both hops inside one tick window
                    got.append(c.process_frame(audio[ch, k * 480 : (k + 1) * 480]))
                c.close()
                outs[ch] = np.concatenate(got)

            # connect L first so channel->slot order is deterministic
            t0 = threading.Thread(target=run, args=(0,))
            t0.start()
            import time as _t
            _t.sleep(0.3)
            t1 = threading.Thread(target=run, args=(1,))
            t1.start()
            t0.join(180)
            t1.join(180)

            rt = StreamingRuntime(model, df_state, rp)
            _, expected = rt.process(rt.init(2), jnp.asarray(audio))
            got = np.stack(outs)
            np.testing.assert_allclose(got, np.asarray(expected), atol=1e-5)

            # and the shared mask actually changes the result vs independent
            rt_ind = StreamingRuntime(model, df_state)
            _, ind = rt_ind.process(rt_ind.init(2), jnp.asarray(audio))
            assert not np.allclose(got, np.asarray(ind), atol=1e-5)
        finally:
            srv.stop()


class TestCClient:
    def test_c_client_round_trip(self, server, rng, tmp_path):
        """Compile the native C client and stream frames through the server,
        checking parity with the Python client."""
        import subprocess

        _, _, port = server
        exe = str(tmp_path / "df_c_test")
        test_c = str(tmp_path / "main.c")
        with open(test_c, "w") as f:
            f.write(r'''
#include "df_client.h"
#include <stdio.h>
#include <stdlib.h>
int main(int argc, char **argv) {
    int port = atoi(argv[1]);
    DfClient *df = df_create("127.0.0.1", port);
    if (!df) { fprintf(stderr, "connect failed\n"); return 2; }
    size_t n = df_get_frame_length(df) * 2;
    float *in = calloc(n, 4), *out = calloc(n, 4);
    FILE *fi = fopen(argv[2], "rb");
    fread(in, 4, n, fi); fclose(fi);
    if (df_process_frame(df, in, out, n) != 0) return 3;
    FILE *fo = fopen(argv[3], "wb");
    fwrite(out, 4, n, fo); fclose(fo);
    df_free(df);
    return 0;
}
''')
        subprocess.run(
            ["gcc", "-O2", "-I", "/root/repo/native", test_c,
             "/root/repo/native/df_client.c", "-o", exe],
            check=True, capture_output=True,
        )
        audio = (rng.standard_normal(960).astype(np.float32) * 0.1)
        fin = str(tmp_path / "in.f32")
        fout = str(tmp_path / "out.f32")
        audio.tofile(fin)
        subprocess.run([exe, str(port), fin, fout], check=True, timeout=120)
        got = np.fromfile(fout, np.float32)

        py = StreamClient(port=port)
        expected = py.process_frame(audio)
        py.close()
        np.testing.assert_allclose(got, expected, atol=1e-6)


def test_client_times_out_on_dead_server():
    """A server that accepts but never replies raises socket.timeout in
    process_frame instead of hanging recv forever (serve.py StreamClient
    timeout default)."""
    import socket
    import struct
    import threading

    lsock = socket.socket()
    lsock.bind(("127.0.0.1", 0))
    lsock.listen(1)
    port = lsock.getsockname()[1]
    held = []

    def accept_and_hold():
        conn, _ = lsock.accept()
        conn.recv(4)  # consume the magic, then go silent
        held.append(conn)

    t = threading.Thread(target=accept_and_hold, daemon=True)
    t.start()
    c = StreamClient(port=port, timeout=0.5)
    with pytest.raises(TimeoutError):
        c.process_frame(np.zeros(480, np.float32))
    c.close()
    for conn in held:
        conn.close()
    lsock.close()
