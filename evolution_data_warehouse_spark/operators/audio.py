"""Real RIFF-WAVE (PCM) audio codec for the multimodal corpus path.

Closes the audio modality the same way operators/jpeg.py, gif.py, and
video.py closed images and video: the container and sample formats are
parsed for real — RIFF chunk walking with word alignment, the fmt
chunk (PCM and WAVE_FORMAT_EXTENSIBLE with a PCM subformat), and
8-bit-unsigned / 16/24/32-bit signed little-endian sample frames —
so audio-bearing corpora get real validation, duration, and
sample-level features inside the engine instead of beside it.
(`multimodal.audio_features_batch` remains the declared plumbing fake
for schema-shape tests.)

Reference parity note: the reference warehouse treats media as opaque
blobs (no decode anywhere in analytics/etl); this exceeds parity the
way every codec here does.

Error contract (identical to the image codecs): malformed, truncated,
or oversized input raises ValueError, nothing else — which keeps the
per-row quarantine path (multimodal.decode_image_tolerant_batch's
shape) sound for audio too. Tests pin conformance to real third-party
encodes: CPython's test/audiodata pluck-pcm{8,16,24,32}.wav decode
byte-exactly against the stdlib `wave` module's independent parse, and
the four widths agree with each other after shift normalization.
"""

from __future__ import annotations

import struct

import numpy as np

# Cap checked BEFORE allocation, like jpeg._MAX_PIXELS: a forged data
# chunk length must not pin memory past the quarantine contract.
_MAX_SAMPLES = 1 << 26


def decode_wav(data: bytes) -> dict:
    """Parse a RIFF-WAVE PCM payload → dict with sample_rate,
    n_channels, sample_width (bytes), and `samples`: an (n_frames,
    n_channels) int32 array. 8-bit samples are stored unsigned per the
    spec and come back centered (v - 128); wider samples are signed
    little-endian, sign-extended. Chunk semantics match the stdlib
    ``wave`` reference exactly: the walk honors the RIFF size field
    (trailing metadata like appended ID3/INFO tags is legal and
    ignored), the FIRST fmt/data chunks win, and unknown chunks are
    skipped with word alignment; anything malformed raises
    ValueError."""
    from evolution_data_warehouse_spark.operators.video import (
        _walk_chunks,
    )

    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF-WAVE payload")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    end = 8 + riff_size
    if end > len(data) or riff_size < 4:
        raise ValueError("truncated WAV payload")
    fmt = None
    body = None
    for tag, start, size in _walk_chunks(data, 12, end):
        if tag == b"fmt " and fmt is None:
            if size < 16:
                raise ValueError("WAV fmt chunk too short")
            fmt = struct.unpack_from("<HHIIHH", data, start)
            if fmt[0] == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE
                if size < 40:
                    raise ValueError("WAV extensible fmt chunk too short")
                (sub,) = struct.unpack_from("<H", data, start + 24)
                if sub != 1:
                    raise ValueError(
                        f"unsupported WAV extensible subformat {sub}"
                    )
            elif fmt[0] != 1:
                raise ValueError(
                    f"unsupported WAV format tag {fmt[0]} (PCM only)"
                )
        elif tag == b"data" and body is None:
            body = data[start : start + size]
    if fmt is None or body is None:
        raise ValueError("WAV missing fmt or data chunk")
    _tag, ch, rate, _brate, balign, bits = fmt
    if ch < 1 or rate < 1 or bits not in (8, 16, 24, 32):
        raise ValueError(
            f"invalid WAV shape (channels={ch}, rate={rate}, bits={bits})"
        )
    width = bits // 8
    if balign != ch * width:
        raise ValueError(
            f"WAV block align {balign} != channels*width {ch * width}"
        )
    if len(body) % balign:
        raise ValueError("WAV data size is not a whole number of frames")
    n = len(body) // balign
    if n * ch > _MAX_SAMPLES:
        raise ValueError(
            f"implausible WAV size {n} frames x {ch} channels "
            f"(cap {_MAX_SAMPLES} samples)"
        )
    raw = np.frombuffer(body, dtype=np.uint8)
    if width == 1:
        samples = raw.astype(np.int32) - 128
    elif width == 3:
        b = raw.reshape(-1, 3).astype(np.uint32)
        u = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        samples = u.astype(np.int32)
        samples = np.where(
            samples & 0x800000, samples - (1 << 24), samples
        ).astype(np.int32)
    else:
        dt = "<i2" if width == 2 else "<i4"
        samples = raw.view(dt).astype(np.int32)
    return {
        "sample_rate": rate,
        "n_channels": ch,
        "sample_width": width,
        "samples": samples.reshape(n, ch),
    }


def encode_wav(samples: np.ndarray, rate: int, width: int) -> bytes:
    """Encode an (n_frames, n_channels) int array as a canonical PCM
    WAV at ``width`` bytes per sample (1 = unsigned 8-bit storage,
    2/3/4 = signed little-endian)."""
    s = np.asarray(samples)
    if s.ndim != 2 or s.shape[0] == 0 or s.shape[1] == 0:
        raise ValueError("samples must be (n_frames, n_channels)")
    if not np.issubdtype(s.dtype, np.integer):
        raise ValueError(
            f"samples must be integers, got {s.dtype} (quantize first)"
        )
    if width not in (1, 2, 3, 4):
        raise ValueError(f"unsupported WAV width {width}")
    if not 1 <= rate <= 0xFFFFFFFF // (s.shape[1] * width):
        raise ValueError(f"WAV sample rate {rate} out of range")
    lo, hi = (-128, 127) if width == 1 else (
        -(1 << (8 * width - 1)),
        (1 << (8 * width - 1)) - 1,
    )
    if int(s.min()) < lo or int(s.max()) > hi:
        raise ValueError(f"sample out of range for width {width}")
    n, ch = s.shape
    if width == 1:
        body = (s.astype(np.int32) + 128).astype(np.uint8).tobytes()
    elif width == 3:
        u = (s.astype(np.int64) & 0xFFFFFF).astype(np.uint32)
        b = np.zeros((n * ch, 3), dtype=np.uint8)
        flat = u.reshape(-1)
        b[:, 0] = flat & 0xFF
        b[:, 1] = (flat >> 8) & 0xFF
        b[:, 2] = (flat >> 16) & 0xFF
        body = b.tobytes()
    else:
        body = s.astype("<i2" if width == 2 else "<i4").tobytes()
    balign = ch * width
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * balign, balign, 8 * width)
    pad = b"\x00" if len(body) & 1 else b""
    riff = (
        b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(body)) + body + pad
    )
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
