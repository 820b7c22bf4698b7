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
    flags        u16  bit 0: FLAG_ENTROPY (payload is range-coded); rest 0
    sample_rate  u32  Hz
    stride       u32  samples per latent frame (the codec's total stride)
    num_frames   u64  latent frames T
    orig_len     u64  original waveform length in samples (decode trims the
                      encoder's zero padding back off)
    sizes        u32 x num_levels   per-level codebook size
    payload
      packed (flags bit 0 clear):
        per level: ceil(T * bits_q / 8) bytes, MSB-first bit-packed
      entropy (flags bit 0 set):
        priors_crc   u32   entropy.priors_crc of the model priors — decode
                           with a different snapshot fails loudly, not with
                           garbage audio
        per level: u32 byte length, then that many range-coded bytes
                   (entropy.encode_level, seeded-adaptive model)

Level-major payout keeps each level contiguous, so a decoder can read a
bitrate-truncated prefix of levels without touching the rest (entropy
levels are skipped via their explicit lengths).

Entropy mode (see entropy.py) seeds per-level range-coder models from the
quantizer's codebook-usage EMA — state both coder sides already hold via
the snapshot — so the sub-log2(S) *effective* bitrate that evaluate.py
reports from usage perplexity becomes the actual file size, with zero
per-file table overhead. The reference's bitrate is nominal arithmetic
only (networks/utils.py:137-147).
"""
from __future__ import annotations

import io
import struct
from dataclasses import dataclass
from typing import BinaryIO, Sequence, Union

import numpy as np

MAGIC = b"AGC1"
_HEADER = struct.Struct("<4sBBHIIQQ")
FLAG_ENTROPY = 0x0001


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
    entropy_coded: bool = False
    coded_bytes: int = 0  # payload bytes for the RETURNED levels (entropy
    # mode only; 0 for packed streams, whose size is implied by the sizes)

    @property
    def num_levels(self) -> int:
        return len(self.codebook_sizes)

    @property
    def bits_per_frame(self) -> int:
        return sum(bits_for(s) for s in self.codebook_sizes)

    @property
    def bitrate_bps(self) -> float:
        """Nominal (packed) rate; entropy streams land below this."""
        return self.bits_per_frame * self.sample_rate / self.stride

    @property
    def coded_bitrate_bps(self) -> float:
        """Actual payload rate of an entropy-coded stream (over the levels
        this meta covers); 0.0 for packed streams."""
        if not self.entropy_coded or self.num_frames == 0:
            return 0.0
        return 8.0 * self.coded_bytes * self.sample_rate / (
            self.num_frames * self.stride
        )

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
    entropy_priors: Sequence[np.ndarray] | None = None,
) -> int:
    """Write indices (T, num_levels) int to an AGC1 stream; returns bytes
    written. `original_length` is the un-padded waveform length in samples.

    `entropy_priors`: per-level quantized frequency tables (one (size_q,)
    int array per stored level, e.g. ResidualQuantizer.entropy_priors) —
    switches the payload to range coding (FLAG_ENTROPY); decode needs the
    same priors (same snapshot)."""
    idx = np.asarray(indices)
    if idx.ndim != 2 or idx.shape[1] != len(codebook_sizes):
        raise ValueError(
            f"indices must be (T, {len(codebook_sizes)}), got {idx.shape}"
        )
    T, nq = idx.shape
    if nq > 255:
        raise ValueError("at most 255 levels")
    flags = 0
    if entropy_priors is not None:
        if len(entropy_priors) < nq:
            raise ValueError(
                f"{len(entropy_priors)} prior tables for {nq} stored levels"
            )
        for q, size in enumerate(codebook_sizes):
            if len(entropy_priors[q]) != size:
                raise ValueError(
                    f"level {q} prior has {len(entropy_priors[q])} symbols, "
                    f"codebook size is {size}"
                )
        flags |= FLAG_ENTROPY
    out = io.BytesIO()
    out.write(
        _HEADER.pack(
            MAGIC, 1, nq, flags, sample_rate, stride, T, int(original_length)
        )
    )
    out.write(struct.pack(f"<{nq}I", *[int(s) for s in codebook_sizes]))
    if entropy_priors is not None:
        from audio_generation_tpu import entropy

        out.write(struct.pack("<I", entropy.priors_crc(entropy_priors[:nq])))
        for q in range(nq):
            coded = entropy.encode_level(idx[:, q], entropy_priors[q])
            out.write(struct.pack("<I", len(coded)))
            out.write(coded)
    else:
        for q, size in enumerate(codebook_sizes):
            out.write(_pack_bits(idx[:, q], bits_for(size)))
    blob = out.getvalue()
    if isinstance(dst, str):
        with open(dst, "wb") as f:
            f.write(blob)
    else:
        dst.write(blob)
    return len(blob)


def read_header(src: Union[str, bytes, BinaryIO]) -> BitstreamMeta:
    """Parse header + size table only (no payload decode, no priors needed
    even for entropy streams) -> BitstreamMeta over ALL stored levels. For
    entropy streams, coded_bytes sums every level's payload length."""
    if isinstance(src, str):
        with open(src, "rb") as f:
            blob = f.read()
    elif isinstance(src, bytes):
        blob = src
    else:
        blob = src.read()
    if len(blob) < _HEADER.size:
        raise ValueError("not an AGC1 stream (too short)")
    magic, version, nq, flags, sr, stride, T, orig_len = _HEADER.unpack_from(
        blob, 0
    )
    if magic != MAGIC:
        raise ValueError(f"bad magic {magic!r}")
    if version != 1:
        raise ValueError(f"unsupported AGC version {version}")
    if flags & ~FLAG_ENTROPY:
        raise ValueError(f"unknown AGC flags 0x{flags:04x}")
    off = _HEADER.size
    if len(blob) < off + 4 * nq:
        raise ValueError("truncated AGC1 stream (codebook-size table)")
    sizes = struct.unpack_from(f"<{nq}I", blob, off)
    off += 4 * nq
    if stride == 0:
        raise ValueError("corrupt AGC1 stream: stride is 0")
    if any(s < 2 for s in sizes):
        raise ValueError(f"corrupt AGC1 stream: codebook sizes {sizes}")
    coded_bytes = 0
    if flags & FLAG_ENTROPY:
        if len(blob) < off + 4:
            raise ValueError("truncated AGC1 stream (priors CRC)")
        off += 4
        for q in range(nq):
            if len(blob) < off + 4:
                raise ValueError("truncated AGC1 stream (level length)")
            (nbytes,) = struct.unpack_from("<I", blob, off)
            off += 4
            if len(blob) < off + nbytes:
                raise ValueError(
                    f"truncated AGC1 stream: level {q} promises {nbytes} "
                    f"bytes, only {len(blob) - off} present"
                )
            coded_bytes += nbytes
            off += nbytes
    return BitstreamMeta(
        sample_rate=sr,
        stride=stride,
        num_frames=T,
        original_length=orig_len,
        codebook_sizes=tuple(sizes),
        entropy_coded=bool(flags & FLAG_ENTROPY),
        coded_bytes=coded_bytes,
    )


def read_bitstream(
    src: Union[str, bytes, BinaryIO],
    max_levels: int | None = None,
    entropy_priors: Sequence[np.ndarray] | None = None,
) -> tuple[np.ndarray, BitstreamMeta]:
    """Read an AGC1 stream -> (indices (T, n) int32, meta). `max_levels`
    decodes only the first n levels (bitrate truncation on the decode side);
    meta reports the levels actually returned. Entropy-coded streams
    (FLAG_ENTROPY) additionally need `entropy_priors` from the SAME model
    snapshot that encoded them (checked via the embedded priors CRC)."""
    if isinstance(src, str):
        with open(src, "rb") as f:
            blob = f.read()
    elif isinstance(src, bytes):
        blob = src
    else:
        blob = src.read()
    if len(blob) < _HEADER.size:
        raise ValueError("not an AGC1 stream (too short)")
    magic, version, nq, flags, sr, stride, T, orig_len = _HEADER.unpack_from(
        blob, 0
    )
    if magic != MAGIC:
        raise ValueError(f"bad magic {magic!r}")
    if version != 1:
        raise ValueError(f"unsupported AGC version {version}")
    if flags & ~FLAG_ENTROPY:
        raise ValueError(f"unknown AGC flags 0x{flags:04x}")
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
    n = nq if max_levels is None else min(max_levels, nq)
    coded_bytes = 0
    levels = []
    if flags & FLAG_ENTROPY:
        from audio_generation_tpu import entropy

        if entropy_priors is None and n > 0:
            raise ValueError(
                "entropy-coded stream: decoding needs the encoder's model "
                "priors — pass entropy_priors from the same snapshot"
            )
        if len(blob) < off + 4:
            raise ValueError("truncated AGC1 stream (priors CRC)")
        (crc,) = struct.unpack_from("<I", blob, off)
        off += 4
        if entropy_priors is not None:
            if len(entropy_priors) < nq:
                raise ValueError(
                    f"{len(entropy_priors)} prior tables for {nq} stored levels"
                )
            if crc != entropy.priors_crc(entropy_priors[:nq]):
                raise ValueError(
                    "entropy priors mismatch: this stream was encoded with a "
                    "different model snapshot"
                )
        for q, size in enumerate(sizes):
            if len(blob) < off + 4:
                raise ValueError("truncated AGC1 stream (level length)")
            (nbytes,) = struct.unpack_from("<I", blob, off)
            off += 4
            if len(blob) < off + nbytes:
                raise ValueError(
                    f"truncated AGC1 stream: level {q} promises {nbytes} "
                    f"bytes, only {len(blob) - off} present"
                )
            if q < n:
                if len(entropy_priors[q]) != size:
                    raise ValueError(
                        f"level {q} prior has {len(entropy_priors[q])} "
                        f"symbols, stream says codebook size {size}"
                    )
                levels.append(
                    entropy.decode_level(
                        blob[off : off + nbytes], T, entropy_priors[q]
                    )
                )
                coded_bytes += nbytes
            off += nbytes
    else:
        payload_bytes = sum((T * bits_for(s) + 7) // 8 for s in sizes)
        if len(blob) - off < payload_bytes:
            raise ValueError(
                f"truncated AGC1 stream: header promises {payload_bytes} "
                f"payload bytes for {T} frames, only {len(blob) - off} present"
            )
        for q, size in enumerate(sizes):
            nbytes = (T * bits_for(size) + 7) // 8
            if q < n:
                levels.append(
                    _unpack_bits(blob[off : off + nbytes], bits_for(size), T)
                )
            off += nbytes
    meta = BitstreamMeta(
        sample_rate=sr,
        stride=stride,
        num_frames=T,
        original_length=orig_len,
        codebook_sizes=tuple(sizes[:n]),
        entropy_coded=bool(flags & FLAG_ENTROPY),
        coded_bytes=coded_bytes,
    )
    return np.stack(levels, axis=1) if levels else np.zeros((T, 0), np.int32), meta
