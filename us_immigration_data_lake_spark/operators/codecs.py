"""Pure-python/numpy media codecs for the multimodal column pipeline.

The container has no image/audio libraries (PIL, opencv, soundfile),
but two public formats need none:

- **P6 PPM** (Netpbm spec): ``P6\\n<width> <height>\\n<maxval>\\n`` +
  raw big-endian RGB bytes. Parsed with numpy frombuffer.
- **WAV/PCM** (RIFF spec): parsed with the stdlib ``wave`` module +
  numpy frombuffer.

These are REAL decoders — bytes to pixel/sample arrays — so the
multimodal operators exercise a genuine decode→transform→encode path
end-to-end. Compressed formats (png/jpeg/mp3/…) still raise
NotImplementedError at the dispatch layer (operators/multimodal.py):
swapping in PIL/soundfile is a one-function change, and the rest of
the pipeline (schema, Arrow batching, partitioning) is identical.
"""

from __future__ import annotations

import io
import wave

import numpy as np


def decode_ppm(content: bytes) -> np.ndarray:
    """P6 binary PPM → uint8 array (height, width, 3). Handles
    whitespace/comment runs in the header per the Netpbm spec."""
    if not content.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header = magic + 3 ints (width, height, maxval), '#' comments allowed
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(content) and content[pos : pos + 1].isspace():
            pos += 1
        if content[pos : pos + 1] == b"#":
            while pos < len(content) and content[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(content) and not content[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(content[start:pos]))
    pos += 1  # single whitespace after maxval, then raw pixels
    width, height, maxval = fields
    if maxval != 255:
        raise ValueError(f"only 8-bit PPM supported, maxval={maxval}")
    n = width * height * 3
    pixels = np.frombuffer(content, dtype=np.uint8, count=n, offset=pos)
    return pixels.reshape(height, width, 3)


def encode_ppm(pixels: np.ndarray) -> bytes:
    """uint8 (height, width, 3) → P6 binary PPM bytes."""
    h, w, c = pixels.shape
    if c != 3 or pixels.dtype != np.uint8:
        raise ValueError("expected uint8 RGB (h, w, 3)")
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.tobytes()


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample — index arithmetic only, so the result
    is bit-deterministic across platforms (no filter kernels, no
    floating-point resampling differences)."""
    h, w = pixels.shape[:2]
    rows = (np.arange(height) * h) // height
    cols = (np.arange(width) * w) // width
    return pixels[rows][:, cols]


def decode_wav(content: bytes) -> tuple[int, np.ndarray]:
    """WAV/PCM → (sample_rate, int16 array (frames, channels))."""
    with wave.open(io.BytesIO(content), "rb") as f:
        if f.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM supported")
        rate = f.getframerate()
        frames = f.getnframes()
        raw = f.readframes(frames)
        samples = np.frombuffer(raw, dtype="<i2").reshape(-1, f.getnchannels())
    return rate, samples


def encode_wav(rate: int, samples: np.ndarray) -> bytes:
    """int16 (frames, channels) → WAV/PCM bytes."""
    if samples.dtype != np.int16:
        raise ValueError("expected int16 samples")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(samples.shape[1] if samples.ndim > 1 else 1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def audio_features(rate: int, samples: np.ndarray) -> list[float]:
    """Deterministic signal features: duration, RMS energy (per-sample
    normalized), zero-crossing rate, peak amplitude. Mono-mixed first
    (mean across channels in float64)."""
    mono = samples.astype(np.float64).mean(axis=1) if samples.ndim > 1 else samples.astype(np.float64)
    n = len(mono)
    if n == 0:
        return [0.0, 0.0, 0.0, 0.0]
    duration = n / float(rate)
    rms = float(np.sqrt((mono * mono).mean()))
    zcr = float((np.signbit(mono[1:]) != np.signbit(mono[:-1])).mean()) if n > 1 else 0.0
    peak = float(np.abs(mono).max())
    return [duration, rms, zcr, peak]
