// FLAC stream decoder (native data-engine component).
//
// Decodes the FLAC byte streams stored inside dataset HDF5 files (the
// reference stores lossless-compressed samples per key with a `codec=flac`
// root attribute and reads them via the claxon crate; see SURVEY.md §2.2).
// Subset of the FLAC spec sufficient for libsndfile/flac-encoded audio:
// 16/24-bit, fixed + LPC subframes, rice/rice2 residuals, all channel
// assignments (independent, left/side, right/side, mid/side).
//
// Exposed through the C ABI in dfdata.cpp; consumed from Python via ctypes.

#include <cstdint>
#include <cstring>
#include <vector>

namespace dfdata {

class BitReader {
 public:
  BitReader(const uint8_t* data, size_t size) : data_(data), size_(size) {}

  // Read up to 32 bits MSB-first. Returns false past end of stream.
  bool read(uint32_t nbits, uint32_t* out) {
    uint32_t v = 0;
    for (uint32_t i = 0; i < nbits; ++i) {
      if (pos_ >= size_ * 8) return false;
      v = (v << 1) | ((data_[pos_ >> 3] >> (7 - (pos_ & 7))) & 1);
      ++pos_;
    }
    *out = v;
    return true;
  }

  bool read64(uint32_t nbits, uint64_t* out) {
    uint64_t v = 0;
    for (uint32_t i = 0; i < nbits; ++i) {
      if (pos_ >= size_ * 8) return false;
      v = (v << 1) | ((data_[pos_ >> 3] >> (7 - (pos_ & 7))) & 1);
      ++pos_;
    }
    *out = v;
    return true;
  }

  bool read_signed(uint32_t nbits, int32_t* out) {
    uint32_t v;
    if (!read(nbits, &v)) return false;
    // sign extend
    if (nbits > 0 && (v >> (nbits - 1)) & 1) v |= ~((1u << nbits) - 1);
    *out = static_cast<int32_t>(v);
    return true;
  }

  // Unary: count zero bits until a 1.
  bool read_unary(uint32_t* out) {
    uint32_t q = 0;
    while (true) {
      if (pos_ >= size_ * 8) return false;
      uint32_t bit = (data_[pos_ >> 3] >> (7 - (pos_ & 7))) & 1;
      ++pos_;
      if (bit) break;
      ++q;
    }
    *out = q;
    return true;
  }

  void align_byte() { pos_ = (pos_ + 7) & ~size_t(7); }
  size_t byte_pos() const { return pos_ >> 3; }
  void seek_byte(size_t b) { pos_ = b * 8; }
  bool eof() const { return pos_ >= size_ * 8; }

 private:
  const uint8_t* data_;
  size_t size_;
  size_t pos_ = 0;  // bit position
};

struct StreamInfo {
  uint32_t sample_rate = 0;
  uint32_t channels = 0;
  uint32_t bps = 0;
  uint64_t total_samples = 0;
};

static bool read_utf8_coded(BitReader& br, uint64_t* out) {
  uint32_t b0;
  if (!br.read(8, &b0)) return false;
  int extra = 0;
  uint64_t v = 0;
  if (b0 < 0x80) {
    *out = b0;
    return true;
  } else if ((b0 & 0xE0) == 0xC0) { extra = 1; v = b0 & 0x1F; }
  else if ((b0 & 0xF0) == 0xE0) { extra = 2; v = b0 & 0x0F; }
  else if ((b0 & 0xF8) == 0xF0) { extra = 3; v = b0 & 0x07; }
  else if ((b0 & 0xFC) == 0xF8) { extra = 4; v = b0 & 0x03; }
  else if ((b0 & 0xFE) == 0xFC) { extra = 5; v = b0 & 0x01; }
  else if (b0 == 0xFE) { extra = 6; v = 0; }
  else return false;
  for (int i = 0; i < extra; ++i) {
    uint32_t b;
    if (!br.read(8, &b)) return false;
    if ((b & 0xC0) != 0x80) return false;
    v = (v << 6) | (b & 0x3F);
  }
  *out = v;
  return true;
}

// Decode one residual partition set into out[predictor_order..block_size).
static bool read_residual(BitReader& br, uint32_t block_size, uint32_t order,
                          int32_t* out) {
  uint32_t method;
  if (!br.read(2, &method)) return false;
  if (method > 1) return false;
  uint32_t param_bits = method == 0 ? 4 : 5;
  uint32_t escape = method == 0 ? 0xF : 0x1F;
  uint32_t part_order;
  if (!br.read(4, &part_order)) return false;
  uint32_t n_parts = 1u << part_order;
  if ((block_size >> part_order) == 0) return false;
  uint32_t idx = order;
  for (uint32_t p = 0; p < n_parts; ++p) {
    uint32_t n = (block_size >> part_order) - (p == 0 ? order : 0);
    uint32_t param;
    if (!br.read(param_bits, &param)) return false;
    if (param == escape) {
      uint32_t raw_bits;
      if (!br.read(5, &raw_bits)) return false;
      for (uint32_t i = 0; i < n; ++i) {
        int32_t v = 0;
        if (raw_bits > 0) {
          if (!br.read_signed(raw_bits, &v)) return false;
        }
        out[idx++] = v;
      }
    } else {
      for (uint32_t i = 0; i < n; ++i) {
        uint32_t q, r = 0;
        if (!br.read_unary(&q)) return false;
        if (param > 0 && !br.read(param, &r)) return false;
        uint32_t zz = (q << param) | r;
        out[idx++] = static_cast<int32_t>(zz >> 1) ^ -static_cast<int32_t>(zz & 1);
      }
    }
  }
  return idx == block_size;
}

static bool decode_subframe(BitReader& br, uint32_t block_size, uint32_t bps,
                            std::vector<int64_t>& out) {
  uint32_t pad, type_code, wasted_flag;
  if (!br.read(1, &pad) || pad != 0) return false;
  if (!br.read(6, &type_code)) return false;
  if (!br.read(1, &wasted_flag)) return false;
  uint32_t wasted = 0;
  if (wasted_flag) {
    uint32_t u;
    if (!br.read_unary(&u)) return false;
    wasted = u + 1;
    bps -= wasted;
  }
  out.assign(block_size, 0);
  std::vector<int32_t> res(block_size);

  if (type_code == 0) {  // CONSTANT
    int32_t v;
    if (!br.read_signed(bps, &v)) return false;
    for (uint32_t i = 0; i < block_size; ++i) out[i] = v;
  } else if (type_code == 1) {  // VERBATIM
    for (uint32_t i = 0; i < block_size; ++i) {
      int32_t v;
      if (!br.read_signed(bps, &v)) return false;
      out[i] = v;
    }
  } else if ((type_code & 0x38) == 0x08 && (type_code & 0x07) <= 4) {  // FIXED
    uint32_t order = type_code & 0x07;
    for (uint32_t i = 0; i < order; ++i) {
      int32_t v;
      if (!br.read_signed(bps, &v)) return false;
      out[i] = v;
    }
    if (!read_residual(br, block_size, order, res.data())) return false;
    for (uint32_t i = order; i < block_size; ++i) {
      int64_t pred = 0;
      switch (order) {
        case 0: pred = 0; break;
        case 1: pred = out[i - 1]; break;
        case 2: pred = 2 * out[i - 1] - out[i - 2]; break;
        case 3: pred = 3 * out[i - 1] - 3 * out[i - 2] + out[i - 3]; break;
        case 4: pred = 4 * out[i - 1] - 6 * out[i - 2] + 4 * out[i - 3] - out[i - 4]; break;
      }
      out[i] = pred + res[i];
    }
  } else if (type_code >= 0x20) {  // LPC, order = (type & 0x1F) + 1
    uint32_t order = (type_code & 0x1F) + 1;
    for (uint32_t i = 0; i < order; ++i) {
      int32_t v;
      if (!br.read_signed(bps, &v)) return false;
      out[i] = v;
    }
    uint32_t prec_m1;
    if (!br.read(4, &prec_m1)) return false;
    if (prec_m1 == 0xF) return false;
    uint32_t precision = prec_m1 + 1;
    int32_t shift;
    if (!br.read_signed(5, &shift)) return false;
    if (shift < 0) return false;
    std::vector<int32_t> coefs(order);
    for (uint32_t i = 0; i < order; ++i) {
      if (!br.read_signed(precision, &coefs[i])) return false;
    }
    if (!read_residual(br, block_size, order, res.data())) return false;
    for (uint32_t i = order; i < block_size; ++i) {
      int64_t pred = 0;
      for (uint32_t j = 0; j < order; ++j) pred += (int64_t)coefs[j] * out[i - 1 - j];
      out[i] = (pred >> shift) + res[i];
    }
  } else {
    return false;
  }
  if (wasted > 0) {
    for (uint32_t i = 0; i < block_size; ++i) out[i] <<= wasted;
  }
  return true;
}

// Decode a whole FLAC stream to interleaved int16. Returns number of frames
// (samples per channel) decoded, or -1 on error. `*channels_out` receives
// the channel count. Output buffer holds up to max_frames frames.
int64_t decode_flac(const uint8_t* data, size_t size, int16_t* out,
                    int64_t max_frames, int* channels_out, int* sr_out) {
  if (size < 4 || memcmp(data, "fLaC", 4) != 0) return -1;
  BitReader br(data, size);
  br.seek_byte(4);
  StreamInfo info;
  // metadata blocks
  while (true) {
    uint32_t hdr;
    if (!br.read(8, &hdr)) return -1;
    bool last = hdr & 0x80;
    uint32_t type = hdr & 0x7F;
    uint32_t len;
    if (!br.read(24, &len)) return -1;
    if (type == 0) {  // STREAMINFO
      uint32_t tmp;
      br.read(16, &tmp);  // min blocksize
      br.read(16, &tmp);  // max blocksize
      br.read(24, &tmp);  // min framesize
      br.read(24, &tmp);  // max framesize
      br.read(20, &info.sample_rate);
      br.read(3, &tmp);
      info.channels = tmp + 1;
      br.read(5, &tmp);
      info.bps = tmp + 1;
      br.read64(36, &info.total_samples);
      br.seek_byte(br.byte_pos() + 16);  // md5
    } else {
      br.seek_byte(br.byte_pos() + len);
    }
    if (last) break;
  }
  if (info.channels == 0 || info.channels > 8) return -1;
  *channels_out = (int)info.channels;
  *sr_out = (int)info.sample_rate;

  static const uint32_t kBlockSizes[16] = {0,    192,  576,  1152, 2304, 4608,
                                           0,    0,    256,  512,  1024, 2048,
                                           4096, 8192, 16384, 32768};
  static const uint32_t kRates[12] = {0,     88200, 176400, 192000, 8000, 16000,
                                      22050, 24000, 32000,  44100,  48000, 96000};
  static const uint32_t kBps[8] = {0, 8, 12, 0, 16, 20, 24, 32};

  int64_t frames_done = 0;
  std::vector<std::vector<int64_t>> ch(info.channels);
  while (frames_done < max_frames && !br.eof()) {
    // frame header
    uint32_t sync;
    if (!br.read(14, &sync)) break;
    if (sync != 0x3FFE) return -1;
    uint32_t rsvd, blocking;
    if (!br.read(1, &rsvd) || !br.read(1, &blocking)) return -1;
    uint32_t bs_code, sr_code, chan_code, bps_code, rsvd2;
    if (!br.read(4, &bs_code) || !br.read(4, &sr_code) || !br.read(4, &chan_code) ||
        !br.read(3, &bps_code) || !br.read(1, &rsvd2))
      return -1;
    uint64_t frame_no;
    if (!read_utf8_coded(br, &frame_no)) return -1;
    uint32_t block_size;
    if (bs_code == 6) {
      uint32_t v;
      if (!br.read(8, &v)) return -1;
      block_size = v + 1;
    } else if (bs_code == 7) {
      uint32_t v;
      if (!br.read(16, &v)) return -1;
      block_size = v + 1;
    } else {
      block_size = kBlockSizes[bs_code];
      if (block_size == 0) return -1;
    }
    if (sr_code == 12) {
      uint32_t v;
      br.read(8, &v);
    } else if (sr_code == 13 || sr_code == 14) {
      uint32_t v;
      br.read(16, &v);
    }
    uint32_t bps = bps_code == 0 ? info.bps : kBps[bps_code];
    if (bps == 0) return -1;
    uint32_t crc8;
    if (!br.read(8, &crc8)) return -1;

    uint32_t n_ch = info.channels;
    int stereo_mode = 0;  // 0 indep, 1 L/S, 2 R/S, 3 M/S
    if (chan_code <= 7) {
      n_ch = chan_code + 1;
    } else if (chan_code == 8) { n_ch = 2; stereo_mode = 1; }
    else if (chan_code == 9) { n_ch = 2; stereo_mode = 2; }
    else if (chan_code == 10) { n_ch = 2; stereo_mode = 3; }
    else return -1;
    if (n_ch != info.channels) return -1;

    for (uint32_t c = 0; c < n_ch; ++c) {
      uint32_t sub_bps = bps;
      if ((stereo_mode == 1 && c == 1) || (stereo_mode == 2 && c == 0) ||
          (stereo_mode == 3 && c == 1))
        sub_bps += 1;  // side channel carries one extra bit
      if (!decode_subframe(br, block_size, sub_bps, ch[c])) return -1;
    }
    br.align_byte();
    uint32_t crc16a, crc16b;
    if (!br.read(8, &crc16a) || !br.read(8, &crc16b)) return -1;

    // undo stereo decorrelation
    if (stereo_mode == 1) {  // left/side: R = L - S
      for (uint32_t i = 0; i < block_size; ++i) ch[1][i] = ch[0][i] - ch[1][i];
    } else if (stereo_mode == 2) {  // right/side: L = R + S
      for (uint32_t i = 0; i < block_size; ++i) ch[0][i] = ch[1][i] + ch[0][i];
    } else if (stereo_mode == 3) {  // mid/side
      for (uint32_t i = 0; i < block_size; ++i) {
        int64_t side = ch[1][i];
        int64_t mid = (ch[0][i] << 1) | (side & 1);
        ch[0][i] = (mid + side) >> 1;
        ch[1][i] = (mid - side) >> 1;
      }
    }

    int shift = (int)bps - 16;  // normalize to int16 range
    int64_t n = block_size;
    if (frames_done + n > max_frames) n = max_frames - frames_done;
    for (int64_t i = 0; i < n; ++i) {
      for (uint32_t c = 0; c < info.channels; ++c) {
        int64_t v = ch[c][i];
        v = shift >= 0 ? (v >> shift) : (v << -shift);
        if (v > 32767) v = 32767;
        if (v < -32768) v = -32768;
        out[(frames_done + i) * info.channels + c] = (int16_t)v;
      }
    }
    frames_done += n;
  }
  return frames_done;
}

}  // namespace dfdata
