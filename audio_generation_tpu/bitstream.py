"""Packed codec bitstream: RVQ indices <-> compact `.agc` files.

The reference never serializes codes — its bitrate story is arithmetic only
(`bitrate_calculator`, networks/utils.py:137-147: bits = num_quantizers x
log2(codebook_size) x latent_fps). This module makes that bitrate REAL: each
RVQ level q is bit-packed at ceil(log2(codebook_size_q)) bits per latent
frame, so the file size matches the advertised bits/s exactly (plus a fixed
32 + 4*nq byte header).

Format AGC1 (little-endian):

    magic        4s   b"AGC1"
    version      u8   1
    num_levels   u8   levels stored (<= the model's num_quantizers:
                      storing fewer = RVQ bitrate truncation)
    flags        u16  reserved (0)
    sample_rate  u32  Hz
    stride       u32  samples per latent frame (the codec's total stride)
    num_frames   u64  latent frames T
    orig_len     u64  original waveform length in samples (decode trims the
                      encoder's zero padding back off)
    sizes        u32 x num_levels   per-level codebook size
    payload      per level: ceil(T * bits_q / 8) bytes, MSB-first bit-packed

Level-major payout keeps each level contiguous, so a decoder can read a
bitrate-truncated prefix of levels without touching the rest.
"""
from __future__ import annotations

import io
import struct
from dataclasses import dataclass
from typing import BinaryIO, Sequence, Union

import numpy as np

MAGIC = b"AGC1"
_HEADER = struct.Struct("<4sBBHIIQQ")


def bits_for(codebook_size: int) -> int:
    """Bits per index for one level: ceil(log2(size)), >= 1."""
    return max(int(codebook_size - 1).bit_length(), 1)


def _pack_bits(vals: np.ndarray, bits: int) -> bytes:
    """vals (T,) non-negative ints < 2**bits -> MSB-first packed bytes."""
    v = np.ascontiguousarray(vals, dtype=np.uint32)
    if v.size and int(v.max()) >= (1 << bits):
        raise ValueError(f"index {int(v.max())} does not fit in {bits} bits")
    shifts = np.arange(bits - 1, -1, -1, dtype=np.uint32)
    bit_rows = ((v[:, None] >> shifts[None, :]) & 1).astype(np.uint8)
    return np.packbits(bit_rows.reshape(-1)).tobytes()


def _unpack_bits(buf: bytes, bits: int, count: int) -> np.ndarray:
    """Inverse of _pack_bits -> (count,) int32."""
    flat = np.unpackbits(np.frombuffer(buf, dtype=np.uint8))[: count * bits]
    if flat.size < count * bits:
        raise ValueError("bitstream payload truncated")
    rows = flat.reshape(count, bits).astype(np.uint32)
    shifts = np.arange(bits - 1, -1, -1, dtype=np.uint32)
    return (rows << shifts[None, :]).sum(axis=1).astype(np.int32)


@dataclass(frozen=True)
class BitstreamMeta:
    """Everything a decoder needs, parsed from the header."""

    sample_rate: int
    stride: int
    num_frames: int
    original_length: int
    codebook_sizes: tuple

    @property
    def num_levels(self) -> int:
        return len(self.codebook_sizes)

    @property
    def bits_per_frame(self) -> int:
        return sum(bits_for(s) for s in self.codebook_sizes)

    @property
    def bitrate_bps(self) -> float:
        return self.bits_per_frame * self.sample_rate / self.stride

    @property
    def duration_seconds(self) -> float:
        return self.original_length / self.sample_rate


def write_bitstream(
    dst: Union[str, BinaryIO],
    indices: np.ndarray,
    codebook_sizes: Sequence[int],
    sample_rate: int,
    stride: int,
    original_length: int,
) -> int:
    """Write indices (T, num_levels) int to an AGC1 stream; returns bytes
    written. `original_length` is the un-padded waveform length in samples."""
    idx = np.asarray(indices)
    if idx.ndim != 2 or idx.shape[1] != len(codebook_sizes):
        raise ValueError(
            f"indices must be (T, {len(codebook_sizes)}), got {idx.shape}"
        )
    T, nq = idx.shape
    if nq > 255:
        raise ValueError("at most 255 levels")
    out = io.BytesIO()
    out.write(
        _HEADER.pack(
            MAGIC, 1, nq, 0, sample_rate, stride, T, int(original_length)
        )
    )
    out.write(struct.pack(f"<{nq}I", *[int(s) for s in codebook_sizes]))
    for q, size in enumerate(codebook_sizes):
        out.write(_pack_bits(idx[:, q], bits_for(size)))
    blob = out.getvalue()
    if isinstance(dst, str):
        with open(dst, "wb") as f:
            f.write(blob)
    else:
        dst.write(blob)
    return len(blob)


def read_bitstream(
    src: Union[str, bytes, BinaryIO], max_levels: int | None = None
) -> tuple[np.ndarray, BitstreamMeta]:
    """Read an AGC1 stream -> (indices (T, n) int32, meta). `max_levels`
    decodes only the first n levels (bitrate truncation on the decode side);
    meta reports the levels actually returned."""
    if isinstance(src, str):
        with open(src, "rb") as f:
            blob = f.read()
    elif isinstance(src, bytes):
        blob = src
    else:
        blob = src.read()
    if len(blob) < _HEADER.size:
        raise ValueError("not an AGC1 stream (too short)")
    magic, version, nq, _flags, sr, stride, T, orig_len = _HEADER.unpack_from(
        blob, 0
    )
    if magic != MAGIC:
        raise ValueError(f"bad magic {magic!r}")
    if version != 1:
        raise ValueError(f"unsupported AGC version {version}")
    off = _HEADER.size
    if len(blob) < off + 4 * nq:
        raise ValueError("truncated AGC1 stream (codebook-size table)")
    sizes = struct.unpack_from(f"<{nq}I", blob, off)
    off += 4 * nq
    # header sanity bounds BEFORE any allocation: a corrupt/crafted u64
    # num_frames would otherwise drive multi-GB _unpack_bits allocations,
    # and stride == 0 makes BitstreamMeta.bitrate_bps divide by zero.
    if stride == 0:
        raise ValueError("corrupt AGC1 stream: stride is 0")
    if any(s < 2 for s in sizes):
        raise ValueError(f"corrupt AGC1 stream: codebook sizes {sizes}")
    payload_bytes = sum((T * bits_for(s) + 7) // 8 for s in sizes)
    if len(blob) - off < payload_bytes:
        raise ValueError(
            f"truncated AGC1 stream: header promises {payload_bytes} payload "
            f"bytes for {T} frames, only {len(blob) - off} present"
        )
    n = nq if max_levels is None else min(max_levels, nq)
    levels = []
    for q, size in enumerate(sizes):
        nbytes = (T * bits_for(size) + 7) // 8
        if q < n:
            levels.append(_unpack_bits(blob[off : off + nbytes], bits_for(size), T))
        off += nbytes
    meta = BitstreamMeta(
        sample_rate=sr,
        stride=stride,
        num_frames=T,
        original_length=orig_len,
        codebook_sizes=tuple(sizes[:n]),
    )
    return np.stack(levels, axis=1) if levels else np.zeros((T, 0), np.int32), meta
