// Non-owning MSB-first bit reader over a byte range (caller guarantees
// >= 8 bytes of readable padding past `len` -- the owning buffer provides
// it).  Shared by the MPEG1 and MP2 host frontends; semantics of the
// reference BitBuffer (/root/reference/src/buffer.js:115-187).
#pragma once

#include <cstdint>
#include <cstring>
#include <vector>

// Growable append-only byte buffer owning the bytes a BitView walks.
//
// Padding contract: parsers read *values* (not structure) without bounds
// checks, so a malformed frame can legitimately walk a few KB past the
// valid bytes before a structural bound (start-code check, section count,
// error code) stops it.  PAD zeroed bytes always follow byte_length, so
// such reads are in-allocation and deterministic (they see zeros, exactly
// like the Python BitReader's zero-padded numpy buffer).
struct ByteBuffer {
  // upper bound on any parser's value-read overrun past the end of valid
  // data (MP2 worst case: allocation+scfsi+scale factors+sample bits of
  // one frame ~4.6 KB; MPEG1 block/VLC overruns are far smaller)
  static constexpr int64_t PAD = 8192;

  std::vector<uint8_t> buf;
  int64_t byte_length = 0;
  int64_t bit_index = 0;

  void append(const uint8_t* data, int64_t len) {
    if (byte_length + len + PAD > (int64_t)buf.size())
      buf.resize((byte_length + len + PAD) * 2, 0);
    std::memcpy(buf.data() + byte_length, data, len);
    byte_length += len;
    std::memset(buf.data() + byte_length, 0, PAD);
  }

  int64_t evict() {
    int64_t pos = bit_index >> 3;
    if (pos <= 0) return 0;
    std::memmove(buf.data(), buf.data() + pos, byte_length - pos);
    byte_length -= pos;
    bit_index -= pos << 3;
    std::memset(buf.data() + byte_length, 0, PAD);
    return pos;
  }
};

struct BitView {
  const uint8_t* data = nullptr;
  int64_t len = 0;       // valid bytes
  int64_t index = 0;     // bit position

  inline uint32_t peek(int count) const {
    const uint8_t* p = data + (index >> 3);
    uint64_t w = ((uint64_t)p[0] << 56) | ((uint64_t)p[1] << 48) |
                 ((uint64_t)p[2] << 40) | ((uint64_t)p[3] << 32) |
                 ((uint64_t)p[4] << 24);
    return (uint32_t)((w << (index & 7)) >> (64 - count));
  }

  inline uint32_t read(int count) {
    uint32_t v = peek(count);
    index += count;
    return v;
  }

  inline void skip(int64_t count) { index += count; }
  inline void rewind(int64_t count) {
    index = index >= count ? index - count : 0;
  }
  bool has(int64_t count) const { return (len << 3) - index >= count; }

  int find_next_start_code() {
    int64_t i = (index + 7) >> 3;
    const uint8_t* b = data;
    while (i < len) {
      if (b[i] == 0 && b[i + 1] == 0 && b[i + 2] == 1) {
        index = (i + 4) << 3;
        return (i + 3 < len) ? b[i + 3] : 0;
      }
      i++;
    }
    index = len << 3;
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
    if (i >= len) return true;
    return data[i] == 0 && data[i + 1] == 0 && data[i + 2] == 1;
  }
};
