// MPEG-1 video host frontend: bitstream walk + VLC parse -> dense tensors.
//
// C++ twin of jsmpeg_tpu/host/mpeg1_parse.py (same contract, same
// semantics incl. the persistent block-data quirk; see that file and
// /root/reference/src/mpeg1.js:78-457,698-811 for the behaviour being
// reproduced).  Exposed as a C ABI consumed via ctypes; output arrays are
// caller-allocated numpy buffers (zero copy).
//
// Build: see build_native.py (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstring>
#include <vector>

#include "vlc_tables.h"

namespace {

constexpr int START_PICTURE = 0x00;
constexpr int START_SLICE_FIRST = 0x01;
constexpr int START_SLICE_LAST = 0xAF;
constexpr int START_USER_DATA = 0xB2;
constexpr int START_SEQUENCE = 0xB3;
constexpr int START_EXTENSION = 0xB5;
constexpr int START_SEQUENCE_END = 0xB7;
constexpr int START_GROUP = 0xB8;

constexpr int PIC_I = 1;
constexpr int PIC_P = 2;
constexpr int PIC_B = 3;

struct BitReader {
  std::vector<uint8_t> buf;
  int64_t byte_length = 0;   // valid bytes (buf has >= 8 bytes zero padding)
  int64_t index = 0;         // bit position

  void append(const uint8_t* data, int64_t len) {
    if (byte_length + len + 8 > (int64_t)buf.size())
      buf.resize((byte_length + len + 8) * 2, 0);
    std::memcpy(buf.data() + byte_length, data, len);
    byte_length += len;
    std::memset(buf.data() + byte_length, 0, 8);
  }

  int64_t evict_consumed() {
    int64_t pos = index >> 3;
    if (pos <= 0) return 0;
    std::memmove(buf.data(), buf.data() + pos, byte_length - pos + 8);
    byte_length -= pos;
    index -= pos << 3;
    return pos;
  }

  inline uint32_t peek(int count) const {
    // MSB-first read of up to 25 bits (enough for every VLC + header field
    // read below uses read32 for larger counts)
    int64_t start = index >> 3;
    uint64_t w = 0;
    // 8-byte zero padding makes this load safe at the buffer tail
    const uint8_t* p = buf.data() + start;
    w = ((uint64_t)p[0] << 56) | ((uint64_t)p[1] << 48) |
        ((uint64_t)p[2] << 40) | ((uint64_t)p[3] << 32) |
        ((uint64_t)p[4] << 24);
    int off = index & 7;
    return (uint32_t)((w << off) >> (64 - count));
  }

  inline uint32_t read(int count) {
    uint32_t v = peek(count);
    index += count;
    return v;
  }

  inline uint32_t read32(int count) {  // up to 32 bits
    if (count <= 25) return read(count);
    uint32_t hi = read(count - 16);
    uint32_t lo = read(16);
    return (hi << 16) | lo;
  }

  inline void skip(int64_t count) { index += count; }
  inline void rewind(int64_t count) { index = index >= count ? index - count : 0; }
  bool has(int64_t count) const { return (byte_length << 3) - index >= count; }

  int find_next_start_code() {
    int64_t i = (index + 7) >> 3;
    const uint8_t* b = buf.data();
    while (i + 3 < byte_length + 3) {  // padding makes overread safe
      if (i >= byte_length) break;
      if (b[i] == 0 && b[i + 1] == 0 && b[i + 2] == 1) {
        index = (i + 4) << 3;
        return (i + 3 < byte_length) ? b[i + 3] : 0;
      }
      i++;
    }
    index = byte_length << 3;
    return -1;
  }

  int find_start_code(int code) {
    while (true) {
      int c = find_next_start_code();
      if (c == code || c == -1) return c;
    }
  }

  bool next_bytes_are_start_code() const {
    int64_t i = (index + 7) >> 3;
    if (i >= byte_length) return true;
    const uint8_t* b = buf.data();
    return b[i] == 0 && b[i + 1] == 0 && b[i + 2] == 1;
  }
};

inline int32_t vlc(BitReader& bits, const uint32_t* lut, int maxbits) {
  uint32_t idx = bits.peek(maxbits);
  uint32_t enc = lut[idx];
  int n = enc >> 24;
  if (n == 0) return INT32_MIN;  // invalid code
  bits.skip(n);
  return (int32_t)(enc & 0xFFFFFF) - 0x800000;
}

struct FrameOut {
  int32_t* coef;      // [n_mb, 6, 64]
  uint8_t* coded;     // [n_mb, 6]
  uint8_t* intra;     // [n_mb]
  uint8_t* written;   // [n_mb]
  int32_t* mv;        // [n_mb, 2]
};

struct Parser {
  BitReader bits;
  bool has_seq = false;
  // sequence info
  int width = 0, height = 0, mb_w = 0, mb_h = 0, mb_size = 0;
  int frame_rate_code = 0;
  int32_t intra_q[64], non_intra_q[64];
  // persistent scratch (quirk-exact)
  int32_t block_data[64] = {0};
  int64_t quirk_leaks = 0;
  int64_t frames_parsed = 0;
  bool error = false;

  // picture state
  int pic_type = 0;
  bool full_pel = false;
  int fw_f = 0, fw_r_size = 0;
  int qscale = 0;
  bool slice_begin = false;
  int64_t mb_address = 0;
  int motion_h = 0, motion_v = 0, motion_h_prev = 0, motion_v_prev = 0;
  int32_t dc_y = 0, dc_cr = 0, dc_cb = 0;
  FrameOut out = {};

  void try_sequence_header() {
    int64_t saved = bits.index;
    if (bits.find_start_code(START_SEQUENCE) == -1) {
      bits.index = saved;
      return;
    }
    decode_sequence_header();
  }

  void decode_sequence_header() {
    width = bits.read(12);
    height = bits.read(12);
    bits.skip(4);
    frame_rate_code = bits.read(4);
    bits.skip(18 + 1 + 10 + 1);
    std::memcpy(intra_q, DEFAULT_INTRA_Q, sizeof(intra_q));
    std::memcpy(non_intra_q, DEFAULT_NON_INTRA_Q, sizeof(non_intra_q));
    if (bits.read(1)) {
      for (int i = 0; i < 64; i++) intra_q[ZIG_ZAG[i]] = bits.read(8);
    }
    if (bits.read(1)) {
      for (int i = 0; i < 64; i++) non_intra_q[ZIG_ZAG[i]] = bits.read(8);
    }
    mb_w = (width + 15) >> 4;
    mb_h = (height + 15) >> 4;
    mb_size = mb_w * mb_h;
    has_seq = true;
  }

  bool picture_complete() const {
    int64_t i = (bits.index + 7) >> 3;
    const uint8_t* b = bits.buf.data();
    bool seen_picture = false;
    for (; i + 3 < bits.byte_length; i++) {
      if (b[i] == 0 && b[i + 1] == 0 && b[i + 2] == 1) {
        int c = b[i + 3];
        if (!seen_picture) {
          if (c == START_PICTURE) seen_picture = true;
        } else if (c == START_PICTURE || c == START_SEQUENCE ||
                   c == START_GROUP || c == START_SEQUENCE_END) {
          return true;
        }
        i += 3;
      }
    }
    return false;
  }

  // returns 1 = frame produced, 0 = none available
  int parse_frame(bool eof, const FrameOut& dst) {
    if (!has_seq) return 0;
    out = dst;
    while (true) {
      if (!eof && !picture_complete()) return 0;
      int64_t saved = bits.index;
      if (bits.find_start_code(START_PICTURE) == -1) {
        bits.index = saved;
        return 0;
      }
      if (decode_picture()) {
        frames_parsed++;
        return 1;
      }
      if (eof && !bits.has(32)) return 0;
    }
  }

  bool decode_picture() {
    bits.skip(10);
    pic_type = bits.read(3);
    bits.skip(16);
    if (pic_type <= 0 || pic_type >= PIC_B) return false;
    if (pic_type == PIC_P) {
      full_pel = bits.read(1);
      int f_code = bits.read(3);
      if (f_code == 0) return false;
      fw_r_size = f_code - 1;
      fw_f = 1 << fw_r_size;
    }

    std::memset(out.coef, 0, (size_t)mb_size * 6 * 64 * 4);
    std::memset(out.coded, 0, (size_t)mb_size * 6);
    std::memset(out.intra, 0, (size_t)mb_size);
    std::memset(out.written, 0, (size_t)mb_size);
    std::memset(out.mv, 0, (size_t)mb_size * 2 * 4);

    int code = bits.find_next_start_code();
    while (code == START_EXTENSION || code == START_USER_DATA)
      code = bits.find_next_start_code();
    while (code >= START_SLICE_FIRST && code <= START_SLICE_LAST) {
      decode_slice(code & 0xFF);
      code = bits.find_next_start_code();
    }
    if (code != -1) bits.rewind(32);
    return true;
  }

  void decode_slice(int slice) {
    slice_begin = true;
    mb_address = (int64_t)(slice - 1) * mb_w - 1;
    motion_h = motion_h_prev = 0;
    motion_v = motion_v_prev = 0;
    dc_y = dc_cr = dc_cb = 128;
    qscale = bits.read(5);
    while (bits.read(1)) bits.skip(8);
    do {
      decode_macroblock();
      if (error) return;
    } while (!bits.next_bytes_are_start_code());
  }

  void decode_macroblock() {
    int64_t increment = 0;
    int32_t t = vlc(bits, VLC_MB_INCR, VLC_MB_INCR_BITS);
    while (t == 34) t = vlc(bits, VLC_MB_INCR, VLC_MB_INCR_BITS);
    while (t == 35) {
      increment += 33;
      t = vlc(bits, VLC_MB_INCR, VLC_MB_INCR_BITS);
    }
    if (t == INT32_MIN) { error = true; return; }
    increment += t;

    if (slice_begin) {
      slice_begin = false;
      mb_address += increment;
    } else {
      if (mb_address + increment >= mb_size) return;
      if (increment > 1) {
        dc_y = dc_cr = dc_cb = 128;
        if (pic_type == PIC_P) {
          motion_h = motion_h_prev = 0;
          motion_v = motion_v_prev = 0;
        }
      }
      while (increment > 1) {
        mb_address++;
        if (mb_address >= 0 && mb_address < mb_size) {
          out.written[mb_address] = 1;
          out.mv[mb_address * 2] = motion_h;
          out.mv[mb_address * 2 + 1] = motion_v;
        }
        increment--;
      }
      mb_address++;
    }
    int64_t addr = mb_address;
    bool in_range = addr >= 0 && addr < mb_size;

    const uint32_t* type_lut;
    int type_bits;
    if (pic_type == PIC_I) { type_lut = VLC_MB_TYPE_I; type_bits = VLC_MB_TYPE_I_BITS; }
    else if (pic_type == PIC_P) { type_lut = VLC_MB_TYPE_P; type_bits = VLC_MB_TYPE_P_BITS; }
    else { type_lut = VLC_MB_TYPE_B; type_bits = VLC_MB_TYPE_B_BITS; }
    int32_t mb_type = vlc(bits, type_lut, type_bits);
    if (mb_type == INT32_MIN) { error = true; return; }
    bool intra = mb_type & 0x01;
    bool mot_fw = mb_type & 0x08;

    if (mb_type & 0x10) qscale = bits.read(5);

    if (intra) {
      motion_h = motion_h_prev = 0;
      motion_v = motion_v_prev = 0;
      if (in_range) out.intra[addr] = 1;
    } else {
      dc_y = dc_cr = dc_cb = 128;
      decode_motion_vectors(mot_fw);
      if (in_range) {
        out.written[addr] = 1;
        out.mv[addr * 2] = motion_h;
        out.mv[addr * 2 + 1] = motion_v;
      }
    }

    int cbp;
    if (mb_type & 0x02) {
      cbp = vlc(bits, VLC_CBP, VLC_CBP_BITS);
      if (cbp == INT32_MIN) { error = true; return; }
    } else {
      cbp = intra ? 0x3F : 0;
    }

    for (int block = 0, mask = 0x20; block < 6; block++, mask >>= 1) {
      if (cbp & mask) {
        decode_block(block, intra, in_range ? addr : -1);
        if (error) return;
      }
    }
  }

  void decode_motion_vectors(bool mot_fw) {
    if (mot_fw) {
      for (int axis = 0; axis < 2; axis++) {
        int32_t code = vlc(bits, VLC_MOTION, VLC_MOTION_BITS);
        if (code == INT32_MIN) { error = true; return; }
        int32_t d;
        if (code != 0 && fw_f != 1) {
          int32_t r = bits.read(fw_r_size);
          d = (((code < 0 ? -code : code) - 1) << fw_r_size) + r + 1;
          if (code < 0) d = -d;
        } else {
          d = code;
        }
        int& prev = axis == 0 ? motion_h_prev : motion_v_prev;
        int& cur = axis == 0 ? motion_h : motion_v;
        prev += d;
        if (prev > (fw_f << 4) - 1) prev -= fw_f << 5;
        else if (prev < -(fw_f << 4)) prev += fw_f << 5;
        cur = prev;
        if (full_pel) cur <<= 1;
      }
    } else if (pic_type == PIC_P) {
      motion_h = motion_h_prev = 0;
      motion_v = motion_v_prev = 0;
    }
  }

  void decode_block(int block, bool intra, int64_t addr) {
    int n = 0;
    const int32_t* quant;

    if (intra) {
      int32_t predictor, dct_size;
      if (block < 4) {
        predictor = dc_y;
        dct_size = vlc(bits, VLC_DC_LUMA, VLC_DC_LUMA_BITS);
      } else {
        predictor = block == 4 ? dc_cr : dc_cb;
        dct_size = vlc(bits, VLC_DC_CHROMA, VLC_DC_CHROMA_BITS);
      }
      if (dct_size == INT32_MIN) { error = true; return; }
      if (dct_size > 0) {
        int32_t differential = bits.read(dct_size);
        if (differential & (1 << (dct_size - 1)))
          block_data[0] = predictor + differential;
        else
          block_data[0] = predictor + ((int32_t)(~0u << dct_size) | (differential + 1));
      } else {
        block_data[0] = predictor;
      }
      if (block < 4) dc_y = block_data[0];
      else if (block == 4) dc_cr = block_data[0];
      else dc_cb = block_data[0];
      block_data[0] = (int32_t)((uint32_t)block_data[0] << 8);
      quant = intra_q;
      n = 1;
    } else {
      quant = non_intra_q;
    }

    while (true) {
      int32_t packed = vlc(bits, VLC_DCT_COEFF, VLC_DCT_COEFF_BITS);
      if (packed == INT32_MIN) { error = true; return; }
      if (packed == 0x0001 && n > 0 && bits.read(1) == 0) break;
      int32_t run, level;
      if (packed == 0xFFFF) {                 // escape
        run = bits.read(6);
        level = bits.read(8);
        if (level == 0) level = bits.read(8);
        else if (level == 128) level = (int32_t)bits.read(8) - 256;
        else if (level > 128) level -= 256;
      } else {
        run = packed >> 8;
        level = packed & 0xFF;
        if (bits.read(1)) level = -level;
      }
      n += run;
      if (n > 63) { error = true; return; }
      int dez = ZIG_ZAG[n];
      n++;
      level <<= 1;
      if (!intra) level += level < 0 ? -1 : 1;
      level = (int32_t)((int64_t)level * qscale * quant[dez]) >> 4;
      if ((level & 1) == 0) level -= level > 0 ? 1 : -1;
      if (level > 2047) level = 2047;
      else if (level < -2048) level = -2048;
      block_data[dez] = level * PREMULTIPLIER[dez];
    }

    if (addr >= 0) out.coded[addr * 6 + block] = 1;
    if (n == 1) {
      // DC-only fast path: emit a pure-DC block; stale non-DC entries stay
      // in block_data (the reference's partial clear)
      if (addr >= 0) out.coef[(addr * 6 + block) * 64] = block_data[0];
      for (int i = 1; i < 64; i++) {
        if (block_data[i]) { quirk_leaks++; break; }
      }
      block_data[0] = 0;
    } else {
      if (addr >= 0)
        std::memcpy(out.coef + (addr * 6 + block) * 64, block_data, 64 * 4);
      std::memset(block_data, 0, sizeof(block_data));
    }
  }
};

}  // namespace

extern "C" {

void* mpeg1_parser_create() { return new Parser(); }
void mpeg1_parser_destroy(void* p) { delete (Parser*)p; }

void mpeg1_parser_write(void* p, const uint8_t* data, int64_t len) {
  Parser* ps = (Parser*)p;
  ps->bits.append(data, len);
  if (!ps->has_seq) ps->try_sequence_header();
}

int mpeg1_parser_has_seq(void* p) { return ((Parser*)p)->has_seq ? 1 : 0; }

// info: [width, height, mb_w, mb_h, frame_rate_code]
void mpeg1_parser_seq_info(void* p, int32_t* info) {
  Parser* ps = (Parser*)p;
  info[0] = ps->width;
  info[1] = ps->height;
  info[2] = ps->mb_w;
  info[3] = ps->mb_h;
  info[4] = ps->frame_rate_code;
}

void mpeg1_parser_quant(void* p, int32_t* intra_q, int32_t* non_intra_q) {
  Parser* ps = (Parser*)p;
  std::memcpy(intra_q, ps->intra_q, sizeof(ps->intra_q));
  std::memcpy(non_intra_q, ps->non_intra_q, sizeof(ps->non_intra_q));
}

// returns 1 frame produced, 0 none; info_out = [pic_type, quirk_leaks_lo]
int mpeg1_parser_parse_frame(void* p, int eof, int32_t* coef, uint8_t* coded,
                             uint8_t* intra, uint8_t* written, int32_t* mv,
                             int64_t* info_out) {
  Parser* ps = (Parser*)p;
  ps->error = false;
  FrameOut out{coef, coded, intra, written, mv};
  int r = ps->parse_frame(eof != 0, out);
  info_out[0] = ps->pic_type;
  info_out[1] = ps->quirk_leaks;
  info_out[2] = ps->error ? 1 : 0;
  return r;
}

int64_t mpeg1_parser_bit_index(void* p) { return ((Parser*)p)->bits.index; }
void mpeg1_parser_set_bit_index(void* p, int64_t idx) {
  ((Parser*)p)->bits.index = idx;
}
int64_t mpeg1_parser_evict(void* p) { return ((Parser*)p)->bits.evict_consumed(); }
int64_t mpeg1_parser_frames_parsed(void* p) {
  return ((Parser*)p)->frames_parsed;
}

}  // extern "C"
