"""Dependency-free media codecs for the multimodal column surface.

The container images ship no PIL/ffmpeg, but "decode" must still be
real — these are complete pure-Python encoders/decoders for three
honest formats:

- **PPM (P6)** — the canonical uncompressed RGB image format
  (netpbm): ``P6\\n<w> <h>\\n<maxval>\\n`` + ``3*w*h`` raw bytes.
- **WAV (PCM16)** — RIFF/WAVE with a ``fmt `` and ``data`` chunk;
  16-bit little-endian mono/stereo samples.
- **RAWVID** — a minimal video container defined here: magic
  ``RVID`` + uint32 frame count, then each frame as a length-prefixed
  PPM payload. (Real inter-frame codecs are out of scope without
  native libs; a frame-sequence container is the honest pure-Python
  equivalent of an intra-only stream like MJPEG.)

Decoders validate magic/structure and raise ValueError on corrupt
input — the multimodal operators surface that per-row, like the
reference surfaces stream-decode errors.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass


# ---------------------------------------------------------------------------
# PPM (P6)
# ---------------------------------------------------------------------------


@dataclass
class PpmImage:
    width: int
    height: int
    maxval: int
    pixels: bytes  # RGB, row-major, 3*width*height


def encode_ppm(width: int, height: int, pixels: bytes, maxval: int = 255) -> bytes:
    if len(pixels) != 3 * width * height:
        raise ValueError(f"pixel buffer {len(pixels)} != 3*{width}*{height}")
    return f"P6\n{width} {height}\n{maxval}\n".encode() + pixels


def decode_ppm(data: bytes) -> PpmImage:
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    # header: three whitespace-separated tokens after the magic
    # (comments not emitted by our encoder; reject for simplicity)
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            raise ValueError("PPM comments unsupported")
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    need = 3 * w * h
    pixels = data[pos : pos + need]
    if len(pixels) != need:
        raise ValueError(f"PPM truncated: {len(pixels)}/{need} pixel bytes")
    return PpmImage(w, h, maxval, pixels)


def resize_ppm_nearest(img: PpmImage, out_w: int, out_h: int) -> PpmImage:
    """Nearest-neighbor resample (the classic integer scaling kernel)."""
    src = img.pixels
    out = bytearray(3 * out_w * out_h)
    for y in range(out_h):
        sy = y * img.height // out_h
        row_off = 3 * sy * img.width
        oy = 3 * y * out_w
        for x in range(out_w):
            sx = x * img.width // out_w
            s = row_off + 3 * sx
            o = oy + 3 * x
            out[o : o + 3] = src[s : s + 3]
    return PpmImage(out_w, out_h, img.maxval, bytes(out))


# ---------------------------------------------------------------------------
# WAV (PCM16)
# ---------------------------------------------------------------------------


@dataclass
class WavAudio:
    sample_rate: int
    n_channels: int
    samples: list[int]  # interleaved PCM16


def encode_wav(sample_rate: int, samples: list[int], n_channels: int = 1) -> bytes:
    data = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * n_channels * 2
    fmt = struct.pack("<HHIIHH", 1, n_channels, sample_rate, byte_rate, n_channels * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> WavAudio:
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, pcm = 12, None, None
    while pos + 8 <= len(data):
        cid, sz = data[pos : pos + 4], struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        chunk = data[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", chunk[:16])
        elif cid == b"data":
            pcm = chunk
        pos += 8 + sz + (sz & 1)
    if fmt is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"only PCM16 supported (fmt={audio_format}, bits={bits})")
    samples = list(struct.unpack(f"<{len(pcm) // 2}h", pcm[: len(pcm) // 2 * 2]))
    return WavAudio(sample_rate, n_channels, samples)


# ---------------------------------------------------------------------------
# RAWVID (length-prefixed PPM frame sequence)
# ---------------------------------------------------------------------------


def encode_rawvid(frames: list[bytes]) -> bytes:
    out = b"RVID" + struct.pack("<I", len(frames))
    for f in frames:
        out += struct.pack("<I", len(f)) + f
    return out


def decode_rawvid(data: bytes) -> list[bytes]:
    if data[:4] != b"RVID":
        raise ValueError("not a RAWVID stream")
    (n,) = struct.unpack("<I", data[4:8])
    frames, pos = [], 8
    for _ in range(n):
        (sz,) = struct.unpack("<I", data[pos : pos + 4])
        frames.append(data[pos + 4 : pos + 4 + sz])
        if len(frames[-1]) != sz:
            raise ValueError("RAWVID truncated")
        pos += 4 + sz
    return frames
