"""Minimal MJPEG-in-AVI container codec (Microsoft RIFF spec) — pure
stdlib. Motion-JPEG is the simplest real video container: each frame
is an independent baseline JPEG (operators/jpeg.py decodes them), so
frame sampling needs no inter-frame state.

Writer emits the canonical structure:
  RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf))
             LIST('movi' '00dc'×n) idx1)
Reader is tolerant: it walks the chunk tree and collects every
``..dc``/``..db`` chunk under 'movi', ignoring unknown chunks — the
posture a real demuxer takes toward the AVI zoo.
"""

from __future__ import annotations

import struct

AVI_FOURCC = b"AVI "


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""  # RIFF word alignment
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def encode_mjpeg_avi(
    frames: list[bytes], width: int, height: int, fps: int = 25
) -> bytes:
    """JPEG payloads → MJPEG AVI bytes (one video stream, no audio)."""
    if not frames:
        raise ValueError("no frames")
    usec_per_frame = 1_000_000 // max(fps, 1)
    max_bytes = max(len(f) for f in frames)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        usec_per_frame, max_bytes * fps, 0, 0x10,  # HASINDEX
        len(frames), 0, 1, max_bytes, width, height, 0, 0, 0, 0,
    )
    strh = b"vids" + b"MJPG" + struct.pack(
        "<IHHIIIIIIIIhhhh",
        0, 0, 0, 0, 1, fps, 0, len(frames), max_bytes, 0xFFFFFFFF, 0,
        0, 0, width, height,
    )
    # BITMAPINFOHEADER
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, width, height, 1, 24, 0x47504A4D,  # 'MJPG'
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_payload = b"".join(_chunk(b"00dc", f) for f in frames)
    movi = _list(b"movi", movi_payload)
    # idx1: one entry per frame, offsets relative to 'movi' fourcc
    idx = bytearray()
    off = 4
    for f in frames:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(f))
        off += 8 + len(f) + (len(f) % 2)
    body = AVI_FOURCC + hdrl + movi + _chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_mjpeg_avi(content: bytes) -> list[bytes]:
    """MJPEG AVI bytes → list of JPEG frame payloads, in stream order."""
    if content[:4] != b"RIFF" or content[8:12] != AVI_FOURCC:
        raise ValueError("not an AVI payload")
    frames: list[bytes] = []

    def walk(data: bytes, in_movi: bool) -> None:
        pos = 0
        while pos + 8 <= len(data):
            fourcc = data[pos : pos + 4]
            (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            payload = data[pos + 8 : pos + 8 + length]
            if fourcc == b"LIST":
                walk(payload[4:], in_movi or payload[:4] == b"movi")
            elif in_movi and fourcc[2:4] in (b"dc", b"db"):
                frames.append(payload)
            pos += 8 + length + (length % 2)

    walk(content[12:], False)
    if not frames:
        raise ValueError("AVI contains no video frame chunks")
    return frames
