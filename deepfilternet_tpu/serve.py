"""Streaming enhancement server: the deployment-surface analog of the
reference's C-API/LADSPA/PipeWire plugins (capi.rs, ladspa/).

The reference embeds a per-process Rust runtime into audio hosts; a TPU
chip is a shared accelerator, so the equivalent surface is a server: audio
clients connect over TCP (or a Unix socket), claim a stream slot, and
exchange 10 ms hops. Per-stream state (STFT memories, norm trackers, GRU
hiddens, DF ring) lives server-side in a fixed `max_streams` slot pool; a
single batcher thread gathers every pending hop each tick into ONE TPU
dispatch (`StreamServer._batch_loop`) and restores idle slots' carry
afterwards — the dynamic-batching design that converts the chip's
aggregate RTF into many concurrent realtime streams. `server.dispatches`
vs `server.frames_processed` exposes the achieved batching factor.

Wire protocol (little-endian):
    client -> server:  u32 magic 0x44465331 ("DFS1"), then per frame:
                       u32 n_samples, f32 x n_samples  (must be k*hop)
    server -> client:  u32 n_samples, f32 x n_samples  (enhanced, delayed
                       by fft-hop samples as in the reference runtime)
    n_samples == 0 closes the stream.

Each tick is ONE device program (`_tick`): slot resets, the streaming
cell, and the idle-slot carry freeze are all folded into a single jitted
call with the carry donated (`donate_argnums`), so the device-side cost
per tick is one executable launch. The host side is pipelined: the
batcher thread only *submits* ticks (JAX async dispatch, no sync) and a
fetcher stage pulls outputs to the host — so per-hop latency through a
high-RTT transport (the axon relay charges ~27 ms per host sync, see
bench_dispatch.json / PERF.md "Dispatch anatomy") overlaps across ticks
instead of serializing.

Run: python -m deepfilternet_tpu.serve [--port 7860] [--model DIR] [...]
"""

from __future__ import annotations

import argparse
import queue
import socket
import struct
import threading
import time
from collections import deque
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

MAGIC = 0x44465331


class _Req:
    """One pending hop for one slot."""

    __slots__ = ("audio", "out", "event")

    def __init__(self, audio: np.ndarray):
        self.audio = audio
        self.out: Optional[np.ndarray] = None
        self.event = threading.Event()


class StreamServer:
    """Dynamic-batching stream server over a fixed slot pool.

    A single batcher thread owns the [max_streams]-wide carry. Connection
    handlers enqueue one 10 ms hop per tick; each tick gathers every
    pending hop into ONE `_tick` TPU dispatch (slot resets + streaming
    cell + idle-slot carry freeze fused into one donated-carry program)
    and hands the device output to a fetcher stage that fans results back
    out. Idle slots participate in the dispatch with zero audio but their
    carry entries are kept (jnp.where select inside `_tick`), so a silent
    client's stream state never advances.
    """

    def __init__(self, model, df_state, host="127.0.0.1", port=7860,
                 runtime_params=None, max_streams: int = 16,
                 batch_window_ms: float = 1.0, fuse_ops: bool = False,
                 max_inflight: int = 3, mesh=None):
        from deepfilternet_tpu.streaming import RuntimeParams, StreamingRuntime

        if mesh is not None:
            # multi-chip serving: the slot pool shards over the mesh's
            # data axis (parallel/streams.py) — per-tick work fans out
            # over ICI with zero cross-chip traffic (weights replicated),
            # so capacity scales linearly with mesh size
            from deepfilternet_tpu.parallel.streams import (
                ShardedStreamingRuntime,
            )

            self.rt = ShardedStreamingRuntime(
                model, df_state, mesh=mesh,
                params=runtime_params or RuntimeParams(), fuse_ops=fuse_ops)
            assert max_streams % mesh.devices.size == 0, (
                f"max_streams={max_streams} must divide over "
                f"{mesh.devices.size} devices")
        else:
            self.rt = StreamingRuntime(model, df_state,
                                       runtime_params or RuntimeParams(),
                                       fuse_ops=fuse_ops)
        self.hop = df_state.hop_size
        self.host = host
        self.port = port
        self.max_streams = max_streams
        self.batch_window = batch_window_ms / 1e3
        self._sock: Optional[socket.socket] = None
        self._threads = []
        self._stop = threading.Event()

        self._carry = self.rt.init(max_streams)
        self._init = self.rt.init(max_streams)  # pristine slot states
        self._free = deque(range(max_streams))
        self._reset_pending: set = set()
        self._pending: Dict[int, _Req] = {}
        self._cv = threading.Condition()
        # fetch pipeline: the batcher submits device work without syncing;
        # fetch jobs (device output + its batch) drain here. Bounded so a
        # slow transport backpressures submission instead of queueing
        # unboundedly.
        self._fetchq: queue.Queue = queue.Queue(maxsize=max_inflight)
        # observability. dispatch_times records submit->output-on-host wall
        # seconds per tick (bounded; includes transport RTT behind a relay —
        # use measure_chip_tick() for the device-only cost).
        self.dispatches = 0
        self.frames_processed = 0
        self.dispatch_times: deque = deque(maxlen=10_000)

        # Not every carry leaf is slot-major (GRU hiddens are [L, S, H]):
        # locate each leaf's stream axis by diffing two init shapes.
        # (multiples of the mesh size so a sharded runtime can init them)
        k = mesh.devices.size if mesh is not None else 1
        a3, a4 = (jax.tree.leaves(self.rt.init(3 * k)),
                  jax.tree.leaves(self.rt.init(4 * k)))
        self._stream_axes = []
        for x, y in zip(a3, a4):
            diff = [i for i, (p, q) in enumerate(zip(x.shape, y.shape)) if p != q]
            assert len(diff) == 1, (x.shape, y.shape)
            self._stream_axes.append(diff[0])

        def _mask_select(mask, new, old):
            """Per-leaf jnp.where along each leaf's stream axis."""
            new_flat, td = jax.tree.flatten(new)
            old_flat = jax.tree.leaves(old)
            out = []
            for n, o, ax in zip(new_flat, old_flat, self._stream_axes):
                m = mask.reshape((1,) * ax + (-1,) + (1,) * (n.ndim - ax - 1))
                out.append(jnp.where(m, n, o))
            return jax.tree.unflatten(td, out)

        def _tick(carry, init, x, active, reset):
            """ONE device program per server tick.

            reset-select (new connections) -> streaming cell over all
            slots -> active-select (idle slots keep their pre-cell carry).
            The carry is donated: the runtime reuses its buffers in place.
            """
            c0 = _mask_select(reset, init, carry)
            c1, out = self.rt.process_frame(c0, x)
            return _mask_select(active, c1, c0), out

        self._tick = jax.jit(_tick, donate_argnums=(0,))

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

    # -- slot pool -----------------------------------------------------------

    def _alloc_slot(self) -> Optional[int]:
        with self._cv:
            if not self._free:
                return None
            slot = self._free.popleft()
            # no dispatch here: the reset rides the slot's first tick
            self._reset_pending.add(slot)
            return slot

    def _release_slot(self, slot: int):
        with self._cv:
            self._pending.pop(slot, None)
            self._free.append(slot)

    def _submit(self, slot: int, hop_audio: np.ndarray) -> np.ndarray:
        req = _Req(hop_audio)
        with self._cv:
            self._pending[slot] = req
            self._cv.notify_all()
        while not req.event.wait(1.0):
            if self._stop.is_set():
                raise RuntimeError("server stopping")
        return req.out  # type: ignore[return-value]

    # -- batcher tick loop -----------------------------------------------------

    def _batch_loop(self):
        """Submit stage: gathers pending hops into one `_tick` dispatch.

        Never syncs on device results — the carry chain stays device-side
        and outputs drain through `_fetch_loop`, so consecutive ticks
        pipeline through a high-RTT transport.
        """
        S, hop = self.max_streams, self.hop
        while not self._stop.is_set():
            with self._cv:
                if not self._pending:
                    self._cv.wait(0.05)
                    if not self._pending:
                        continue
            # short coalescing window so concurrent clients land in one tick
            if self.batch_window > 0:
                time.sleep(self.batch_window)
            with self._cv:
                batch, self._pending = self._pending, {}
                resets, self._reset_pending = self._reset_pending, set()
            if not batch and not resets:
                continue
            x = np.zeros((S, hop), np.float32)
            active = np.zeros((S,), bool)
            reset = np.zeros((S,), bool)
            for slot, req in batch.items():
                x[slot] = req.audio
                active[slot] = True
            for slot in resets:
                reset[slot] = True
            t_disp = time.perf_counter()
            self._carry, out = self._tick(
                self._carry, self._init, jnp.asarray(x),
                jnp.asarray(active), jnp.asarray(reset),
            )
            self.dispatches += 1
            self.frames_processed += len(batch)
            # hand the (async) device output to the fetch stage; blocks
            # only when max_inflight ticks are already outstanding
            while not self._stop.is_set():
                try:
                    self._fetchq.put((out, batch, t_disp), timeout=0.2)
                    break
                except queue.Full:
                    continue

    def _fetch_loop(self):
        """Fetch stage: pulls each tick's output to the host and fans it
        back out to the waiting connection handlers."""
        while not self._stop.is_set():
            try:
                out, batch, t_disp = self._fetchq.get(timeout=0.2)
            except queue.Empty:
                continue
            out_np = np.asarray(out, np.float32)
            self.dispatch_times.append(time.perf_counter() - t_disp)
            for slot, req in batch.items():
                req.out = out_np[slot]
                req.event.set()

    def measure_chip_tick(self, n: int = 50) -> float:
        """Device-only cost of one server tick, in ms.

        Chains `n` dependent `_tick` calls on a throwaway carry with
        device-resident inputs and syncs ONCE at the end, so per-call
        transport RTT amortizes away: (total - one RTT) / n is the
        executable's device time. This is the number a co-located
        deployment would pay per tick (see PERF.md "Dispatch anatomy").
        """
        carry = self.rt.init(self.max_streams)
        x = jnp.zeros((self.max_streams, self.hop), jnp.float32)
        active = jnp.ones((self.max_streams,), bool)
        reset = jnp.zeros((self.max_streams,), bool)
        # warm: compile + one sync
        carry, out = self._tick(carry, self._init, x, active, reset)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n):
            carry, out = self._tick(carry, self._init, x, active, reset)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / n * 1e3

    # -- connection handler ----------------------------------------------------

    def _handle(self, conn: socket.socket):
        slot = None
        try:
            hdr = self._recv_exact(conn, 4)
            if hdr is None or struct.unpack("<I", hdr)[0] != MAGIC:
                return
            slot = self._alloc_slot()
            if slot is None:
                conn.sendall(struct.pack("<I", 0))  # pool exhausted
                return
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
                audio = np.frombuffer(data, "<f4")
                outs = [
                    self._submit(slot, audio[i : i + self.hop])
                    for i in range(0, n, self.hop)
                ]
                out_np = np.concatenate(outs)
                conn.sendall(struct.pack("<I", out_np.size) + out_np.tobytes())
        finally:
            if slot is not None:
                self._release_slot(slot)
            conn.close()

    # -- lifecycle -----------------------------------------------------------

    def start(self):
        self._sock = socket.create_server((self.host, self.port))
        self._sock.settimeout(0.5)
        for target in (self._accept_loop, self._batch_loop, self._fetch_loop):
            t = threading.Thread(target=target, daemon=True)
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
        with self._cv:
            self._cv.notify_all()
        if self._sock is not None:
            self._sock.close()


class StreamClient:
    """Minimal client mirroring the C API surface (df_create /
    df_process_frame / df_free; capi.rs:82-253)."""

    def __init__(self, host="127.0.0.1", port=7860, timeout=300.0):
        # A finite default timeout turns a dead server / lost reply into a
        # socket.timeout instead of an indefinite recv hang (capi callers
        # own their own deadline policy; pass timeout=None to opt out).
        # Default is generous because a cold server's FIRST reply waits on
        # the slot-pool jit compile (tens of seconds on chip, worse on a
        # loaded CPU test host).
        self.sock = socket.create_connection((host, port), timeout=timeout)
        self.sock.settimeout(timeout)
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
    from deepfilternet_tpu.utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()

    parser = argparse.ArgumentParser(description="DeepFilterNet-TPU stream server")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=7860)
    parser.add_argument("--model-base-dir", "-m", default=None)
    parser.add_argument("--pf", action="store_true")
    parser.add_argument("--atten-lim", type=float, default=0.0)
    parser.add_argument("--max-streams", type=int, default=16)
    parser.add_argument("--batch-window-ms", type=float, default=1.0)
    parser.add_argument("--ws-port", type=int, default=0,
                        help="also serve a WebSocket bridge + browser demo "
                             "page on this port (serve_ws.py)")
    parser.add_argument("--fuse-ops", action="store_true",
                        help="op-chain-fused streaming cell (fewer dispatches "
                             "per tick; see PERF.md)")
    args = parser.parse_args(argv)
    model, df_state, _ = init_df(args.model_base_dir, post_filter=args.pf)
    rp = RuntimeParams(atten_lim_db=args.atten_lim,
                       post_filter_beta=0.02 if args.pf else 0.0)
    server = StreamServer(model, df_state, args.host, args.port, rp,
                          max_streams=args.max_streams,
                          batch_window_ms=args.batch_window_ms,
                          fuse_ops=args.fuse_ops)
    server.start()
    print(f"Serving on {args.host}:{args.port} (frame = {df_state.hop_size} samples)")
    if args.ws_port:
        from deepfilternet_tpu.serve_ws import WsBridge

        WsBridge(server, args.host, args.ws_port).start()
        print(f"Browser demo + WebSocket bridge on http://{args.host}:{args.ws_port}/")
    try:
        threading.Event().wait()
    except KeyboardInterrupt:
        server.stop()


if __name__ == "__main__":
    main()
