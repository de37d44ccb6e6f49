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
