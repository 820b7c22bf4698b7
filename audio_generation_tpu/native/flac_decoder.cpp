// Native FLAC decoder for the data pipeline.
//
// The reference consumes LibriSpeech *as distributed* (.flac) through
// torchaudio (reference: networks/utils.py:224-226), whose decode path is
// native C++ (libsox/ffmpeg). This is the TPU framework's equivalent: a
// dependency-free FLAC decoder exposed through a C ABI and bound via ctypes
// (audio_generation_tpu/data/flacio.py). Implements the full FLAC subset
// that real encoders emit: CONSTANT / VERBATIM / FIXED(0-4) / LPC subframes,
// rice + rice2 residual partitions with escape codes, wasted bits, all
// stereo decorrelation modes (independent, left/side, right/side, mid/side),
// 8/12/16/20/24/32-bit samples. CRCs are parsed-over, not verified (decode
// integrity is covered by round-trip tests against a reference encoder in
// tests/test_data.py).
//
// Build: g++ -O2 -shared -fPIC -o libflacdec.so flac_decoder.cpp
#include <cstddef>
#include <cstdint>
#include <cstring>

namespace {

struct BitReader {
  const uint8_t* data;
  size_t size;      // bytes
  size_t bitpos;    // bit cursor
  bool ok;

  BitReader(const uint8_t* d, size_t n) : data(d), size(n), bitpos(0), ok(true) {}

  bool eof() const { return bitpos >= size * 8; }

  uint64_t bits(int n) {
    uint64_t v = 0;
    for (int i = 0; i < n; ++i) {
      if (bitpos >= size * 8) {
        ok = false;
        return 0;
      }
      v = (v << 1) | ((data[bitpos >> 3] >> (7 - (bitpos & 7))) & 1u);
      ++bitpos;
    }
    return v;
  }

  int64_t sbits(int n) {
    uint64_t v = bits(n);
    if (n > 0 && (v >> (n - 1)) & 1u) {
      return (int64_t)(v | (~0ULL << n));
    }
    return (int64_t)v;
  }

  uint32_t unary() {
    uint32_t q = 0;
    while (ok) {
      if (bitpos >= size * 8) {
        ok = false;
        return 0;
      }
      uint32_t b = (data[bitpos >> 3] >> (7 - (bitpos & 7))) & 1u;
      ++bitpos;
      if (b) break;
      ++q;
      if (q > 1u << 24) {  // corrupt stream guard
        ok = false;
        return 0;
      }
    }
    return q;
  }

  void align() { bitpos = (bitpos + 7) & ~(size_t)7; }
};

// UTF-8-style coded number (frame/sample index); value is unused but the
// field is variable-length so it must be consumed exactly.
bool skip_utf8(BitReader& br) {
  uint64_t b0 = br.bits(8);
  if (!br.ok) return false;
  int follow;
  if ((b0 & 0x80) == 0) follow = 0;
  else if ((b0 & 0xE0) == 0xC0) follow = 1;
  else if ((b0 & 0xF0) == 0xE0) follow = 2;
  else if ((b0 & 0xF8) == 0xF0) follow = 3;
  else if ((b0 & 0xFC) == 0xF8) follow = 4;
  else if ((b0 & 0xFE) == 0xFC) follow = 5;
  else if (b0 == 0xFE) follow = 6;  // 36-bit sample numbers
  else return false;
  for (int i = 0; i < follow; ++i) {
    if ((br.bits(8) & 0xC0) != 0x80) return false;
  }
  return br.ok;
}

// residual: rice-coded partitions (method 0: 4-bit params, 1: 5-bit)
bool read_residual(BitReader& br, int blocksize, int pred_order, int64_t* res) {
  uint32_t method = (uint32_t)br.bits(2);
  if (method > 1) return false;
  int plen = method == 0 ? 4 : 5;
  uint32_t escape = method == 0 ? 15 : 31;
  uint32_t porder = (uint32_t)br.bits(4);
  uint32_t nparts = 1u << porder;
  if (blocksize % (int)nparts != 0) return false;
  int idx = 0;
  for (uint32_t p = 0; p < nparts; ++p) {
    int count = blocksize / (int)nparts - (p == 0 ? pred_order : 0);
    if (count < 0) return false;
    uint32_t param = (uint32_t)br.bits(plen);
    if (param == escape) {
      uint32_t rawbits = (uint32_t)br.bits(5);
      for (int i = 0; i < count; ++i) res[idx++] = br.sbits((int)rawbits);
    } else {
      for (int i = 0; i < count; ++i) {
        uint32_t q = br.unary();
        uint64_t r = br.bits((int)param);
        uint64_t v = ((uint64_t)q << param) | r;
        res[idx++] = (int64_t)(v >> 1) ^ -(int64_t)(v & 1);  // zigzag
      }
    }
    if (!br.ok) return false;
  }
  return true;
}

bool read_subframe(BitReader& br, int blocksize, int bps, int64_t* x) {
  if (br.bits(1) != 0) return false;  // padding bit
  uint32_t type = (uint32_t)br.bits(6);
  int wasted = 0;
  if (br.bits(1)) wasted = (int)br.unary() + 1;
  int ebps = bps - wasted;
  if (ebps <= 0 || ebps > 33) return false;

  static thread_local int64_t res[65536];
  if (type == 0) {  // CONSTANT
    int64_t v = br.sbits(ebps);
    for (int i = 0; i < blocksize; ++i) x[i] = v;
  } else if (type == 1) {  // VERBATIM
    for (int i = 0; i < blocksize; ++i) x[i] = br.sbits(ebps);
  } else if ((type & 0x38) == 0x08 && (type & 0x07) <= 4) {  // FIXED
    int order = (int)(type & 0x07);
    for (int i = 0; i < order; ++i) x[i] = br.sbits(ebps);
    if (!read_residual(br, blocksize, order, res)) return false;
    const int64_t* e = res;
    switch (order) {
      case 0:
        for (int i = 0; i < blocksize; ++i) x[i] = e[i];
        break;
      case 1:
        for (int i = 1; i < blocksize; ++i) x[i] = x[i - 1] + e[i - 1];
        break;
      case 2:
        for (int i = 2; i < blocksize; ++i)
          x[i] = 2 * x[i - 1] - x[i - 2] + e[i - 2];
        break;
      case 3:
        for (int i = 3; i < blocksize; ++i)
          x[i] = 3 * x[i - 1] - 3 * x[i - 2] + x[i - 3] + e[i - 3];
        break;
      case 4:
        for (int i = 4; i < blocksize; ++i)
          x[i] = 4 * x[i - 1] - 6 * x[i - 2] + 4 * x[i - 3] - x[i - 4] + e[i - 4];
        break;
    }
  } else if (type & 0x20) {  // LPC
    int order = (int)(type & 0x1F) + 1;
    for (int i = 0; i < order; ++i) x[i] = br.sbits(ebps);
    uint32_t prec = (uint32_t)br.bits(4);
    if (prec == 15) return false;
    int precision = (int)prec + 1;
    int shift = (int)br.sbits(5);
    if (shift < 0) return false;
    int64_t coef[32];
    for (int i = 0; i < order; ++i) coef[i] = br.sbits(precision);
    if (!read_residual(br, blocksize, order, res)) return false;
    for (int i = order; i < blocksize; ++i) {
      int64_t acc = 0;
      for (int j = 0; j < order; ++j) acc += coef[j] * x[i - 1 - j];
      x[i] = (acc >> shift) + res[i - order];
    }
  } else {
    return false;
  }
  if (wasted > 0) {
    for (int i = 0; i < blocksize; ++i) x[i] <<= wasted;
  }
  return br.ok;
}

}  // namespace

extern "C" {

// Probe STREAMINFO: fills channels / sample_rate / bits / total samples
// (per channel). Returns 0 on success, negative on parse error.
int flac_probe(const uint8_t* data, long size, int* channels, int* rate,
               int* bits, long* total_samples) {
  if (size < 42 || memcmp(data, "fLaC", 4) != 0) return -1;
  BitReader br(data, (size_t)size);
  br.bits(32);  // magic
  bool last = false;
  while (!last) {
    last = br.bits(1);
    uint32_t type = (uint32_t)br.bits(7);
    uint32_t len = (uint32_t)br.bits(24);
    if (!br.ok) return -2;
    if (type == 0) {  // STREAMINFO
      br.bits(16);  // min blocksize
      br.bits(16);  // max blocksize
      br.bits(24);  // min framesize
      br.bits(24);  // max framesize
      *rate = (int)br.bits(20);
      *channels = (int)br.bits(3) + 1;
      *bits = (int)br.bits(5) + 1;
      *total_samples = (long)br.bits(36);
      br.bits(128);  // md5
    } else {
      for (uint32_t i = 0; i < len; ++i) br.bits(8);
    }
    if (!br.ok) return -2;
  }
  return 0;
}

// Decode the whole stream into out (interleaved int32, frame-major:
// out[i * channels + c]). max_frames bounds the per-channel sample count.
// Returns decoded frames per channel, or negative on error.
long flac_decode(const uint8_t* data, long size, int32_t* out, long max_frames,
                 int* out_channels, int* out_rate, int* out_bits) {
  int channels = 0, rate = 0, bits = 0;
  long total = 0;
  if (flac_probe(data, size, &channels, &rate, &bits, &total) != 0) return -1;
  if (channels < 1 || channels > 8) return -1;
  *out_channels = channels;
  *out_rate = rate;
  *out_bits = bits;

  // skip metadata to the first frame
  BitReader br(data, (size_t)size);
  br.bits(32);
  bool last = false;
  while (!last) {
    last = br.bits(1);
    br.bits(7);
    uint32_t len = (uint32_t)br.bits(24);
    for (uint32_t i = 0; i < len; ++i) br.bits(8);
  }
  if (!br.ok) return -2;

  static thread_local int64_t ch[8][65536];
  long written = 0;
  while (true) {
    br.align();
    if (br.eof() || (size_t)(br.bitpos >> 3) + 2 > (size_t)size) break;
    uint64_t sync = br.bits(14);
    if (!br.ok) break;
    if (sync != 0x3FFE) return -3;  // lost framing
    br.bits(1);                      // reserved
    br.bits(1);                      // blocking strategy
    uint32_t bs_code = (uint32_t)br.bits(4);
    uint32_t sr_code = (uint32_t)br.bits(4);
    uint32_t ch_code = (uint32_t)br.bits(4);
    uint32_t ss_code = (uint32_t)br.bits(3);
    br.bits(1);  // reserved
    if (!skip_utf8(br)) return -4;

    int blocksize;
    if (bs_code == 1) blocksize = 192;
    else if (bs_code >= 2 && bs_code <= 5) blocksize = 576 << (bs_code - 2);
    else if (bs_code == 6) blocksize = (int)br.bits(8) + 1;
    else if (bs_code == 7) blocksize = (int)br.bits(16) + 1;
    else if (bs_code >= 8) blocksize = 256 << (bs_code - 8);
    else return -5;
    if (blocksize > 65536) return -5;

    if (sr_code == 12) br.bits(8);        // kHz value
    else if (sr_code == 13 || sr_code == 14) br.bits(16);

    int bps;
    switch (ss_code) {
      case 0: bps = bits; break;
      case 1: bps = 8; break;
      case 2: bps = 12; break;
      case 4: bps = 16; break;
      case 5: bps = 20; break;
      case 6: bps = 24; break;
      case 7: bps = 32; break;
      default: return -6;
    }
    br.bits(8);  // header CRC-8 (unchecked)

    int nch = channels;
    if (ch_code <= 7) {
      if ((int)ch_code + 1 != channels) return -7;
      for (int c = 0; c < nch; ++c) {
        if (!read_subframe(br, blocksize, bps, ch[c])) return -8;
      }
    } else if (ch_code >= 8 && ch_code <= 10) {
      if (channels != 2) return -7;
      // the side channel carries one extra bit
      int bps0 = bps + (ch_code == 9 ? 1 : 0);
      int bps1 = bps + (ch_code == 9 ? 0 : 1);
      if (!read_subframe(br, blocksize, bps0, ch[0])) return -8;
      if (!read_subframe(br, blocksize, bps1, ch[1])) return -8;
      if (ch_code == 8) {  // left/side: right = left - side
        for (int i = 0; i < blocksize; ++i) ch[1][i] = ch[0][i] - ch[1][i];
      } else if (ch_code == 9) {  // right/side: left = right + side
        for (int i = 0; i < blocksize; ++i) {
          int64_t side = ch[0][i], right = ch[1][i];
          ch[0][i] = right + side;
        }
      } else {  // mid/side
        for (int i = 0; i < blocksize; ++i) {
          int64_t mid = (ch[0][i] << 1) | (ch[1][i] & 1);
          int64_t side = ch[1][i];
          ch[0][i] = (mid + side) >> 1;
          ch[1][i] = (mid - side) >> 1;
        }
      }
    } else {
      return -7;
    }
    br.align();
    br.bits(16);  // frame CRC-16 (unchecked)
    if (!br.ok) return -9;

    long n = blocksize;
    if (written + n > max_frames) n = max_frames - written;
    for (long i = 0; i < n; ++i) {
      for (int c = 0; c < nch; ++c) {
        out[(written + i) * nch + c] = (int32_t)ch[c][i];
      }
    }
    written += n;
    if (written >= max_frames) break;
  }
  return written;
}

}  // extern "C"
