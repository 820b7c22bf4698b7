"""Seeded-adaptive range coding for RVQ index streams.

The reference's bitrate story is nominal arithmetic only (bits =
nq x log2(S) x fps, networks/utils.py:137-147) and its own usage tracking
shows deep codebooks far from uniform (networks/training.py:461): the
*entropy* of the code distribution is well below log2(S). `bitstream.py`
made the nominal rate real; this module makes the ENTROPY rate real — the
`effective_bitrate_bps` that `evaluate.py` reports from codebook-usage
perplexity becomes an actual file size.

Design:

- **Range coder** (32-bit carry-less renormalization, byte output): exact
  integer arithmetic only, so streams are bit-stable across platforms —
  the same property the f32 index path guarantees for the codes themselves.
- **Seeded-adaptive model**: per-level symbol frequencies are initialized
  from *model priors* (the quantizer's codebook-usage EMA, which travels
  inside every checkpoint/snapshot) and adapted as symbols are coded.
  Because encoder and decoder hold the same snapshot, the priors never
  ship in the bitstream — zero table overhead even for sub-second clips.
  Adaptation makes coding robust when a file's code distribution drifts
  from the training prior (out-of-domain input, fine-tuned usage): the
  cost of a stale prior decays over the stream instead of compounding.
- **Prior checksum**: decoding with a different model would produce
  garbage audio with no error; callers should store `priors_crc()` next
  to the payload and verify before decoding (bitstream.py does).

Coder invariants: every symbol frequency >= 1 and the per-level total
<= 2**16 (so the renormalized range, always >= 2**16, never divides to a
zero-width interval). `quantize_priors` and `SeededAdaptiveModel` maintain
both by construction.
"""
from __future__ import annotations

import zlib
from typing import Sequence

import numpy as np

_MASK = 0xFFFFFFFF
_TOP = 1 << 24  # emit a byte once the top 8 bits of low are settled
_BOT = 1 << 16  # minimum range before a forced renormalization

# seeded-adaptive model constants (shared encode/decode; changing any of
# these is a bitstream format change)
PRIOR_SCALE = 1 << 13  # integer mass given to the snapshot prior
ADAPT_INC = 32  # frequency added to each coded symbol
_RESCALE_AT = (1 << 16) - 2 * ADAPT_INC  # halve counts before total overflows


class RangeEncoder:
    """32-bit range encoder, byte-wise carry-less renormalization."""

    def __init__(self):
        self.low = 0
        self.range = _MASK
        self.out = bytearray()

    def encode(self, cum: int, freq: int, total: int) -> None:
        """Code a symbol occupying [cum, cum+freq) of a `total`-mass model."""
        r = self.range // total
        self.low = (self.low + r * cum) & _MASK
        self.range = r * freq
        while True:
            if (self.low ^ ((self.low + self.range) & _MASK)) < _TOP:
                pass  # top byte settled: emit
            elif self.range < _BOT:
                # straddling a top-byte boundary with a tiny range: clamp the
                # range to the low side of the 2**16 block so renorm proceeds
                self.range = (-self.low) & (_BOT - 1)
            else:
                break
            self.out.append((self.low >> 24) & 0xFF)
            self.low = (self.low << 8) & _MASK
            self.range = (self.range << 8) & _MASK

    def finish(self) -> bytes:
        for _ in range(4):
            self.out.append((self.low >> 24) & 0xFF)
            self.low = (self.low << 8) & _MASK
        return bytes(self.out)


class RangeDecoder:
    """Mirror of RangeEncoder; reads zeros past the end of the buffer
    (the encoder's 4 flush bytes make that unambiguous)."""

    def __init__(self, buf: bytes):
        self._buf = buf
        self._pos = 0
        self.low = 0
        self.range = _MASK
        self.code = 0
        for _ in range(4):
            self.code = ((self.code << 8) | self._byte()) & _MASK

    def _byte(self) -> int:
        b = self._buf[self._pos] if self._pos < len(self._buf) else 0
        self._pos += 1
        return b

    def decode_target(self, total: int) -> int:
        """Cumulative-frequency position of the next symbol in [0, total)."""
        self._r = self.range // total
        return min(((self.code - self.low) & _MASK) // self._r, total - 1)

    def advance(self, cum: int, freq: int) -> None:
        """Consume the symbol whose [cum, cum+freq) contained the target."""
        self.low = (self.low + self._r * cum) & _MASK
        self.range = self._r * freq
        while True:
            if (self.low ^ ((self.low + self.range) & _MASK)) < _TOP:
                pass
            elif self.range < _BOT:
                self.range = (-self.low) & (_BOT - 1)
            else:
                break
            self.code = ((self.code << 8) | self._byte()) & _MASK
            self.low = (self.low << 8) & _MASK
            self.range = (self.range << 8) & _MASK


def quantize_priors(counts: np.ndarray, scale: int = PRIOR_SCALE) -> np.ndarray:
    """Non-negative float counts (S,) -> integer frequencies (S,) int64 with
    every entry >= 1 and sum <= scale + S. Deterministic (float64 floor), so
    encoder and decoder derive identical tables from the same snapshot."""
    c = np.asarray(counts, dtype=np.float64)
    if c.ndim != 1 or c.size == 0:
        raise ValueError(f"counts must be a non-empty vector, got {c.shape}")
    c = np.maximum(c, 0.0)
    tot = c.sum()
    if not np.isfinite(tot) or tot <= 0:
        return np.ones(c.size, dtype=np.int64)
    f = np.floor(c / tot * float(scale)).astype(np.int64)
    return np.maximum(f, 1)


def priors_crc(priors: Sequence[np.ndarray]) -> int:
    """CRC32 over the quantized per-level tables — a cheap fingerprint that
    catches decoding with the wrong model/snapshot before it emits garbage."""
    crc = 0
    for f in priors:
        crc = zlib.crc32(np.ascontiguousarray(f, dtype=np.int64).tobytes(), crc)
    return crc & 0xFFFFFFFF


class SeededAdaptiveModel:
    """Per-symbol frequency model: starts at the quantized prior, adds
    ADAPT_INC to each coded symbol, halves everything (floor at 1) before
    the total could exceed the coder's 2**16 bound. Pure integer state —
    encoder and decoder stay in lockstep by construction."""

    def __init__(self, freqs_init: np.ndarray):
        f = np.asarray(freqs_init, dtype=np.int64).copy()
        if f.ndim != 1 or f.size < 2:
            raise ValueError(f"need >= 2 symbols, got shape {f.shape}")
        if (f < 1).any():
            raise ValueError("all initial frequencies must be >= 1")
        if int(f.sum()) > _RESCALE_AT:
            raise ValueError(
                f"initial total {int(f.sum())} exceeds rescale bound "
                f"{_RESCALE_AT}; quantize priors with a smaller scale"
            )
        self.freqs = f
        self.total = int(f.sum())

    def lookup(self, symbol: int) -> tuple[int, int, int]:
        cum = int(self.freqs[:symbol].sum())
        return cum, int(self.freqs[symbol]), self.total

    def find(self, target: int) -> tuple[int, int, int]:
        """Symbol whose cumulative interval contains `target`."""
        cumsum = np.cumsum(self.freqs)
        s = int(np.searchsorted(cumsum, target, side="right"))
        cum = int(cumsum[s - 1]) if s else 0
        return s, cum, int(self.freqs[s])

    def update(self, symbol: int) -> None:
        self.freqs[symbol] += ADAPT_INC
        self.total += ADAPT_INC
        if self.total > _RESCALE_AT:
            self.freqs = np.maximum((self.freqs + 1) >> 1, 1)
            self.total = int(self.freqs.sum())


def encode_level(vals: np.ndarray, freqs_init: np.ndarray) -> bytes:
    """Range-code one level's index sequence (T,) with a seeded-adaptive
    model. T == 0 encodes to b''."""
    v = np.asarray(vals)
    if v.size == 0:
        return b""
    if int(v.min()) < 0 or int(v.max()) >= len(freqs_init):
        raise ValueError(
            f"indices [{int(v.min())}, {int(v.max())}] out of range for a "
            f"{len(freqs_init)}-symbol model"
        )
    model = SeededAdaptiveModel(freqs_init)
    enc = RangeEncoder()
    for s in v.tolist():
        cum, f, tot = model.lookup(s)
        enc.encode(cum, f, tot)
        model.update(s)
    return enc.finish()


def decode_level(buf: bytes, count: int, freqs_init: np.ndarray) -> np.ndarray:
    """Inverse of encode_level -> (count,) int32."""
    if count == 0:
        return np.zeros(0, dtype=np.int32)
    model = SeededAdaptiveModel(freqs_init)
    dec = RangeDecoder(buf)
    out = np.empty(count, dtype=np.int32)
    for i in range(count):
        target = dec.decode_target(model.total)
        s, cum, f = model.find(target)
        dec.advance(cum, f)
        model.update(s)
        out[i] = s
    return out
