// Standalone driver for sanitizer runs over the native host frontend
// (ASAN/UBSAN for memory/UB, TSAN for the threaded batch parse).  The
// reference is single-threaded by construction and has no sanitizer rig
// (SURVEY.md section 5); the C++ frontend here is threaded, so races and
// OOB reads are real hazards worth a dedicated harness.
//
//   g++ -fsanitize=address,undefined -g frontend.cpp mp2.cpp \
//       sanitize_main.cpp -o san && ./san video.es audio.mp2
//
// Driven by tools/sanitize_check.py (which also does the TSAN build).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {
void* mpeg1_parser_create();
void mpeg1_parser_destroy(void*);
void mpeg1_parser_write(void*, const uint8_t*, int64_t);
int mpeg1_parser_has_seq(void*);
void mpeg1_parser_seq_info(void*, int32_t*);
int mpeg1_parser_parse_frame(void*, int, int32_t*, uint8_t*, uint8_t*,
                             uint8_t*, int32_t*, int64_t*);
int mpeg1_parser_parse_batch_packed(void*, int, int, uint16_t*, uint8_t*,
                                    uint8_t*, int16_t*, int64_t*, uint8_t*,
                                    uint8_t*, int8_t*, int16_t*, int64_t,
                                    int64_t*, int64_t*);
void mpeg1_parser_set_threads(void*, int);
int64_t mpeg1_parser_evict(void*);

void* ts_demux_create(int);
void ts_demux_destroy(void*);
void ts_demux_connect(void*, int);
long long ts_demux_write(void*, const uint8_t*, long long, uint8_t*,
                         long long);
long long ts_demux_flush(void*, uint8_t*, long long);
long long ts_demux_pending(void*);

void* mp2_decoder_create();
void mp2_decoder_destroy(void*);
void mp2_decoder_write(void*, const uint8_t*, int64_t);
int mp2_decoder_decode(void*, float*, float*);
int64_t mp2_decoder_evict(void*);
}

static std::vector<uint8_t> slurp(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) { std::perror(path); std::exit(2); }
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> v(n);
  if (std::fread(v.data(), 1, n, f) != (size_t)n) std::exit(2);
  std::fclose(f);
  return v;
}

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr, "usage: %s video.es audio.mp2\n", argv[0]);
    return 2;
  }
  std::vector<uint8_t> ves = slurp(argv[1]);
  std::vector<uint8_t> aes = slurp(argv[2]);

  // --- MPEG1: chunked writes + threaded packed batch parse ---
  void* p = mpeg1_parser_create();
  mpeg1_parser_set_threads(p, 4);
  int frames = 0;
  const int F = 8;
  int32_t info[5] = {};
  for (size_t off = 0; off <= ves.size(); off += 1000) {
    size_t n = off + 1000 <= ves.size() ? 1000 : ves.size() - off;
    if (n) mpeg1_parser_write(p, ves.data() + off, (int64_t)n);
    if (!mpeg1_parser_has_seq(p)) continue;
    mpeg1_parser_seq_info(p, info);
    int64_t n_mb = (int64_t)info[2] * info[3];
    int64_t cap = n_mb * 6 * 16;
    std::vector<uint16_t> rl(F * n_mb);
    std::vector<uint8_t> rf(F * n_mb), rc(F * n_mb);
    std::vector<int16_t> rm(F * n_mb * 2);
    std::vector<int64_t> rcounts(F + 1);
    std::vector<uint8_t> pt(F), sp_pos(F * cap);
    std::vector<int8_t> sp_v8(F * cap);
    std::vector<int16_t> sp_esc(F * (cap / 8));
    std::vector<int64_t> sp_counts(F + 2), esc_counts(F + 1);
    int eof = off + 1000 > ves.size();
    int r = mpeg1_parser_parse_batch_packed(
        p, eof, F, rl.data(), rf.data(), rc.data(), rm.data(),
        rcounts.data(), pt.data(), sp_pos.data(), sp_v8.data(),
        sp_esc.data(), cap, sp_counts.data(), esc_counts.data());
    if (r > 0) frames += r;
    mpeg1_parser_evict(p);
  }
  mpeg1_parser_destroy(p);

  // --- MPEG1: serial exact path on a fresh parser ---
  void* p2 = mpeg1_parser_create();
  mpeg1_parser_write(p2, ves.data(), (int64_t)ves.size());
  int serial_frames = 0;
  if (mpeg1_parser_has_seq(p2)) {
    mpeg1_parser_seq_info(p2, info);
    int64_t n_mb = (int64_t)info[2] * info[3];
    std::vector<int32_t> coef(n_mb * 6 * 64);
    std::vector<uint8_t> coded(n_mb * 6), intra(n_mb), written(n_mb);
    std::vector<int32_t> mv(n_mb * 2);
    int64_t finfo[3];
    while (mpeg1_parser_parse_frame(p2, 1, coef.data(), coded.data(),
                                    intra.data(), written.data(), mv.data(),
                                    finfo))
      serial_frames++;
  }
  mpeg1_parser_destroy(p2);

  // --- MP2: chunked writes + full decode ---
  void* a = mp2_decoder_create();
  int audio_frames = 0;
  std::vector<float> left(1152), right(1152);
  for (size_t off = 0; off < aes.size(); off += 777) {
    size_t n = off + 777 <= aes.size() ? 777 : aes.size() - off;
    mp2_decoder_write(a, aes.data() + off, (int64_t)n);
    while (mp2_decoder_decode(a, left.data(), right.data())) audio_frames++;
    mp2_decoder_evict(a);
  }
  mp2_decoder_destroy(a);

  // --- TS demux: clean, chunked and corrupted input (argv[3]) ---
  long long ts_events = 0;
  if (argc > 3) {
    std::vector<uint8_t> ts = slurp(argv[3]);
    for (int round = 0; round < 3; round++) {
      std::vector<uint8_t> in = ts;
      if (round == 1)                       // corrupt bytes + sync marks
        for (size_t k = 0; k < in.size(); k += 531) in[k] ^= 0x5A;
      if (round == 2)                       // garbage prefix
        in.insert(in.begin(), 399, 0x11);
      void* d = ts_demux_create(1);
      ts_demux_connect(d, 0xE0);
      ts_demux_connect(d, 0xC0);
      size_t step = round == 0 ? 188 * 3 : 997;
      for (size_t off = 0; off < in.size(); off += step) {
        size_t n = off + step <= in.size() ? step : in.size() - off;
        long long cap = (long long)n + ts_demux_pending(d)
                        + 16 * (2 * ((long long)n + ts_demux_pending(d))
                                / 188 + 32) + 4096;
        std::vector<uint8_t> out(cap);
        long long r = ts_demux_write(d, in.data() + off, (long long)n,
                                     out.data(), cap);
        if (r < 0) { std::fprintf(stderr, "ts overflow\n"); return 3; }
        ts_events += r > 0;
      }
      std::vector<uint8_t> out(1 << 20);
      if (ts_demux_flush(d, out.data(), out.size()) < 0) return 3;
      ts_demux_destroy(d);
    }
  }

  std::printf("sanitize OK: batch_frames=%d serial_frames=%d audio=%d "
              "ts_rounds_with_events=%lld\n",
              frames, serial_frames, audio_frames, ts_events);
  return 0;
}
