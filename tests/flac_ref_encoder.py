"""Minimal FLAC encoder — TEST FIXTURE ONLY.

Produces spec-valid FLAC streams (STREAMINFO + frames with VERBATIM or
FIXED-order rice-coded subframes) so tests can round-trip the native decoder
(native/flac_decoder.cpp) without any external audio tooling in the image.
Correctness-oriented, not compression-oriented; CRC fields are zeroed (the
decoder deliberately does not verify them).
"""
from __future__ import annotations

import numpy as np


class BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int):
        value &= (1 << n) - 1 if n < 64 else (1 << n) - 1
        self.acc = (self.acc << n) | value
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


def _write_frame_header(bw: BitWriter, frame_i: int, blocksize: int,
                        channels: int, bits: int):
    bw.write(0x3FFE, 14)  # sync
    bw.write(0, 1)        # reserved
    bw.write(0, 1)        # fixed-blocksize stream
    bw.write(7, 4)        # blocksize: 16-bit value follows
    bw.write(0, 4)        # sample rate: from STREAMINFO
    bw.write(channels - 1, 4)  # independent channels
    ss = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bits]
    bw.write(ss, 3)
    bw.write(0, 1)        # reserved
    assert frame_i < 128
    bw.write(frame_i, 8)  # UTF-8 coded frame number (single byte)
    bw.write(blocksize - 1, 16)
    bw.write(0, 8)        # header CRC-8 (unchecked by our decoder)


def _write_verbatim(bw: BitWriter, x: np.ndarray, bits: int):
    bw.write(0, 1)
    bw.write(0b000001, 6)
    bw.write(0, 1)  # no wasted bits
    for v in x:
        bw.write(int(v), bits)


def _write_fixed(bw: BitWriter, x: np.ndarray, bits: int, order: int):
    bw.write(0, 1)
    bw.write(0x08 | order, 6)
    bw.write(0, 1)  # no wasted bits
    for v in x[:order]:
        bw.write(int(v), bits)
    # residuals of the fixed predictor
    e = np.asarray(x, dtype=np.int64)
    for _ in range(order):
        e = np.diff(e)
    res = e  # length len(x) - order
    zig = np.where(res >= 0, 2 * res, -2 * res - 1).astype(np.int64)
    param = int(max(0, int(zig.max()).bit_length() - 2)) if len(zig) else 0
    param = min(param, 14)
    bw.write(0, 2)      # rice method 0 (4-bit params)
    bw.write(0, 4)      # partition order 0
    bw.write(param, 4)
    for u in zig:
        q = int(u) >> param
        bw.write(0, q) if q else None
        bw.write(1, 1)
        bw.write(int(u) & ((1 << param) - 1), param)


def encode_flac(pcm: np.ndarray, sample_rate: int, bits: int = 16,
                blocksize: int = 1024, subframe: str = "fixed2") -> bytes:
    """pcm: (channels, length) int array. subframe: 'verbatim' | 'fixed0/1/2'."""
    pcm = np.atleast_2d(np.asarray(pcm))
    channels, length = pcm.shape
    bw = BitWriter()
    bw.buf += b"fLaC"
    # STREAMINFO (last metadata block)
    bw.write(1, 1)
    bw.write(0, 7)
    bw.write(34, 24)
    bw.write(blocksize, 16)
    bw.write(blocksize, 16)
    bw.write(0, 24)
    bw.write(0, 24)
    bw.write(sample_rate, 20)
    bw.write(channels - 1, 3)
    bw.write(bits - 1, 5)
    bw.write(length, 36)
    bw.write(0, 128)  # md5 (unchecked)

    for fi, start in enumerate(range(0, length, blocksize)):
        block = pcm[:, start : start + blocksize]
        bs = block.shape[1]
        _write_frame_header(bw, fi, bs, channels, bits)
        for c in range(channels):
            if subframe == "verbatim":
                _write_verbatim(bw, block[c], bits)
            else:
                order = int(subframe[-1])
                if bs <= order:
                    _write_verbatim(bw, block[c], bits)
                else:
                    _write_fixed(bw, block[c], bits, order)
        bw.align()
        bw.write(0, 16)  # frame CRC-16 (unchecked)
    return bw.bytes()
