"""Length-prefixed msgpack framing for the master↔node link.

The reference streams CBOR values over raw TCP (workers.rs:8-10,126-159,
flux-node/src/main.rs:10-12).  msgpack plays the CBOR role here (cbor2 is
not in this environment); each frame is a 4-byte big-endian length followed
by one msgpack map.  Row blocks travel as raw float32 bytes + shape, not as
nested lists — the reference serializes every Color struct individually,
which is most of its network cost.
"""

from __future__ import annotations

import socket
import struct
import zlib

import msgpack
import numpy as np

__all__ = ["send_msg", "recv_msg", "encode_rows", "decode_rows"]

_LEN = struct.Struct(">I")
MAX_FRAME = 1 << 30


def send_msg(sock: socket.socket, obj: dict) -> None:
    payload = msgpack.packb(obj, use_bin_type=True)
    sock.sendall(_LEN.pack(len(payload)) + payload)


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    chunks = []
    while n:
        b = sock.recv(min(n, 1 << 20))
        if not b:
            raise ConnectionError("peer closed connection")
        chunks.append(b)
        n -= len(b)
    return b"".join(chunks)


def recv_msg(sock: socket.socket) -> dict:
    (length,) = _LEN.unpack(_recv_exact(sock, 4))
    if length > MAX_FRAME:
        raise ValueError(f"frame too large: {length}")
    return msgpack.unpackb(_recv_exact(sock, length), raw=False)


def encode_rows(row_start: int, rows: np.ndarray, allow_compress: bool = True) -> dict:
    """Row block as raw f32 bytes + shape, zlib-deflated when that shrinks
    it (rendered radiance is smooth, so byte-level deflate typically takes
    20-50% off; the reference ships every Color struct as an individual
    CBOR value, which is most of its network cost).

    ``allow_compress`` is the capability gate: senders only deflate when
    the peer advertised the ``zlib-rows`` capability (an older master
    would feed compressed bytes straight to ``np.frombuffer``), so
    mixed-version node/master deployments stay compatible."""
    rows = np.ascontiguousarray(rows, np.float32)
    raw = rows.tobytes()
    msg = {
        "type": "rows_ready",
        "row_start": int(row_start),
        "shape": list(rows.shape),
    }
    if allow_compress:
        packed = zlib.compress(raw, 1)
        if len(packed) < len(raw):
            msg["enc"] = "zlib"
            msg["data"] = packed
            return msg
    msg["data"] = raw
    return msg


def decode_rows(msg: dict) -> np.ndarray:
    data = msg["data"]
    if msg.get("enc") == "zlib":
        data = zlib.decompress(data)
    return np.frombuffer(data, np.float32).reshape(msg["shape"]).copy()
