"""Minimal pure-Python WAV/PCM decoder for the multimodal audio path.

Like kernel/png.py for images: the sandbox has no codec libraries, but
RIFF/WAVE PCM is just a chunk walk + numpy frombuffer, so the
audio-decode step of the media pipeline is REAL for WAV. Compressed
audio (mp3/aac/...) remains honestly stubbed (media.py).

Supported: RIFF/WAVE, fmt format 1 (integer PCM), 8-bit unsigned and
16-bit signed, any channel count, non-streamed data chunk. Anything
else raises WavError — callers treat a failed decode as data, never as
a task failure (the same permissive contract as the PDF kernel).
"""

from __future__ import annotations

import struct
from typing import Tuple

import numpy as np

MAX_SAMPLE_BYTES = 64 * 1024 * 1024  # decoded-size DoS cap (Z12 spirit)


class WavError(Exception):
    pass


def decode_wav(raw: bytes) -> Tuple[int, int, np.ndarray]:
    """raw WAV bytes -> (sample_rate, channels, samples[n, channels]
    int16). 8-bit unsigned input is centered to int16 range semantics
    ((x - 128) << 8) so downstream stats are depth-independent."""
    if len(raw) < 12 or raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise WavError("bad RIFF/WAVE header")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(raw):
        ctype, length = struct.unpack("<4sI", raw[pos:pos + 8])
        body = raw[pos + 8: pos + 8 + length]
        if len(body) < length:
            raise WavError("truncated chunk")
        if ctype == b"fmt ":
            fmt = body
        elif ctype == b"data":
            data = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise WavError("missing fmt/data chunk")
    if len(fmt) < 16:
        raise WavError("short fmt chunk")
    (audio_format, channels, sample_rate, _byte_rate, _block_align,
     bits) = struct.unpack("<HHIIHH", fmt[:16])
    if audio_format != 1:
        raise WavError(f"unsupported audio format {audio_format} (PCM only)")
    if channels == 0 or sample_rate == 0:
        raise WavError("zero channels/rate")
    if bits not in (8, 16):
        raise WavError(f"unsupported bit depth {bits}")
    if len(data) > MAX_SAMPLE_BYTES:
        raise WavError("audio too large")
    if bits == 16:
        usable = len(data) - (len(data) % (2 * channels))
        samples = np.frombuffer(data[:usable], dtype="<i2").astype(np.int16)
    else:
        usable = len(data) - (len(data) % channels)
        samples = ((np.frombuffer(data[:usable], dtype=np.uint8)
                    .astype(np.int16) - 128) << 8)
    if samples.size == 0:
        raise WavError("empty data chunk")
    return sample_rate, channels, samples.reshape(-1, channels)


def audio_rms_x1000(samples: np.ndarray) -> int:
    """Deterministic integer RMS (×1000, floored) over all channels —
    the fp-stable form carried by the corpus oracle columns."""
    s = samples.astype(np.float64)
    return int(np.floor(np.sqrt(np.mean(s * s)) * 1000.0))


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Minimal 16-bit PCM encoder for fixtures/tests — the independent
    direction against decode_wav's differential tests."""
    arr = np.asarray(samples, dtype=np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    channels = arr.shape[1]
    data = arr.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * channels * 2, channels * 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body
