// whisper_tpu native runtime support library.
//
// The reference implements its entire runtime in native code (Mojo): WAV/mel
// handling offline (export_weights.py:94-121 runs once, host-side), a
// positional weight loader (loader.mojo:5-31), and a vocab detokenizer
// (tokenizer.mojo:4-28). In this framework the *compute* path is JAX/XLA/
// Pallas on TPU; this library provides the native host runtime around it:
//
//   * WAV decode (PCM 8/16/24/32-bit + IEEE float, any channel count,
//     mono mixdown) — the serving data loader.
//   * windowed-sinc resampler to 16 kHz (replaces the scipy dependency the
//     reference's exporter uses, export_weights.py:108).
//   * mmap'ed weight-file access — zero-copy load of the reference's
//     headerless fp32 blob (loader.mojo reads+copies the whole 151 MB;
//     mmap serves pages on demand).
//   * GPT-2 byte-level batch detokenizer with the reference's vocab.txt
//     contract (id = line-1, literal "\n" escapes), including the
//     reference's lossy Ġ/\n decode mode for byte parity.
//
// Exposed as a flat C ABI consumed via ctypes (whisper_tpu/native.py);
// every entry point is also implemented in Python as a fallback so the
// framework works without a C++ toolchain.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

void wn_free(void* p) { std::free(p); }

// ---------------------------------------------------------------------------
// WAV decode
// ---------------------------------------------------------------------------

static uint32_t rd_u32(const uint8_t* p) {
  return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
         ((uint32_t)p[3] << 24);
}
static uint16_t rd_u16(const uint8_t* p) {
  return (uint16_t)p[0] | ((uint16_t)p[1] << 8);
}

// Decode a RIFF/WAVE byte buffer to mono float32 in [-1, 1].
// Returns sample count (>=0) or a negative error code:
//   -1 malformed header, -2 unsupported format, -3 allocation failure.
// On success *out (malloc'd; free with wn_free) and *rate_out are set.
long wn_decode_wav(const uint8_t* bytes, long nbytes, float** out,
                   int* rate_out) {
  if (nbytes < 44 || std::memcmp(bytes, "RIFF", 4) != 0 ||
      std::memcmp(bytes + 8, "WAVE", 4) != 0)
    return -1;
  long pos = 12;
  int fmt = 0, channels = 0, bits = 0, rate = 0;
  const uint8_t* data = nullptr;
  long data_len = 0;
  while (pos + 8 <= nbytes) {
    const uint8_t* ck = bytes + pos;
    uint32_t len = rd_u32(ck + 4);
    if (std::memcmp(ck, "fmt ", 4) == 0 && len >= 16) {
      // the declared chunk body must actually be present — a truncated fmt
      // chunk would otherwise read past the buffer below
      if (pos + 8 + (long)len > nbytes) return -1;
      fmt = rd_u16(ck + 8);
      channels = rd_u16(ck + 10);
      rate = (int)rd_u32(ck + 12);
      bits = rd_u16(ck + 22);
      if (fmt == 0xFFFE && len >= 40)  // WAVE_FORMAT_EXTENSIBLE: sub-format
        fmt = rd_u16(ck + 32);
    } else if (std::memcmp(ck, "data", 4) == 0) {
      data = ck + 8;
      data_len = std::min<long>((long)len, nbytes - pos - 8);
    }
    pos += 8 + len + (len & 1);  // chunks are 2-byte aligned
  }
  if (!data || channels <= 0 || rate <= 0) return -1;
  const bool is_float = (fmt == 3);
  if (!is_float && fmt != 1) return -2;
  const int bytes_per = bits / 8;
  if (bytes_per < 1 || bytes_per > 4) return -2;
  if (is_float && bits != 32) return -2;

  const long frames = data_len / (bytes_per * channels);
  float* mono = (float*)std::malloc(sizeof(float) * std::max<long>(frames, 1));
  if (!mono) return -3;
  const float inv_ch = 1.0f / (float)channels;
  for (long i = 0; i < frames; ++i) {
    float acc = 0.0f;
    for (int c = 0; c < channels; ++c) {
      const uint8_t* s = data + (i * channels + c) * bytes_per;
      float v;
      if (is_float) {
        float f;
        std::memcpy(&f, s, 4);
        v = f;
      } else if (bytes_per == 1) {
        v = ((int)s[0] - 128) / 128.0f;  // 8-bit WAV is unsigned
      } else if (bytes_per == 2) {
        int16_t x = (int16_t)rd_u16(s);
        v = x / 32768.0f;
      } else if (bytes_per == 3) {
        int32_t x = (int32_t)((uint32_t)s[0] << 8 | (uint32_t)s[1] << 16 |
                              (uint32_t)s[2] << 24) >> 8;
        v = x / 8388608.0f;
      } else {
        int32_t x = (int32_t)rd_u32(s);
        v = x / 2147483648.0f;
      }
      acc += v;
    }
    mono[i] = acc * inv_ch;
  }
  *out = mono;
  *rate_out = rate;
  return frames;
}

// ---------------------------------------------------------------------------
// Windowed-sinc resampler
// ---------------------------------------------------------------------------

// Resample to out_rate with a Hann-windowed sinc interpolator (anti-aliased
// for downsampling by scaling the cutoff). Returns output length or -3 on
// allocation failure; *out is malloc'd.
long wn_resample(const float* in, long n, int in_rate, int out_rate,
                 float** out) {
  if (in_rate == out_rate) {
    float* cp = (float*)std::malloc(sizeof(float) * std::max<long>(n, 1));
    if (!cp) return -3;
    std::memcpy(cp, in, sizeof(float) * n);
    *out = cp;
    return n;
  }
  const double ratio = (double)out_rate / (double)in_rate;
  const long m = (long)std::floor((double)n * ratio);
  float* y = (float*)std::malloc(sizeof(float) * std::max<long>(m, 1));
  if (!y) return -3;
  // cutoff at the lower Nyquist; HALF_TAPS zero-crossings per side
  const double fc = std::min(1.0, ratio);
  const int HALF = 16;
  const double half_width = HALF / fc;
  for (long j = 0; j < m; ++j) {
    const double t = (double)j / ratio;  // position in input samples
    const long lo = std::max<long>(0, (long)std::ceil(t - half_width));
    const long hi = std::min<long>(n - 1, (long)std::floor(t + half_width));
    double acc = 0.0, wsum = 0.0;
    for (long i = lo; i <= hi; ++i) {
      const double x = (t - (double)i) * fc;
      double s = (x == 0.0) ? 1.0 : std::sin(M_PI * x) / (M_PI * x);
      const double u = (t - (double)i) / half_width;  // in [-1, 1]
      const double w = 0.5 * (1.0 + std::cos(M_PI * u));
      const double coeff = s * w;
      acc += coeff * (double)in[i];
      wsum += coeff;
    }
    y[j] = (float)(wsum != 0.0 ? acc * fc : 0.0);
  }
  *out = y;
  return m;
}

// ---------------------------------------------------------------------------
// mmap weight access
// ---------------------------------------------------------------------------

// Open path read-only and mmap it. Returns the address (or null) and sets
// *size_out. Pages stream from the file cache on demand — no 151 MB copy.
void* wn_mmap_open(const char* path, long* size_out) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    ::close(fd);
    return nullptr;
  }
  void* addr = ::mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  ::close(fd);
  if (addr == MAP_FAILED) return nullptr;
  ::madvise(addr, st.st_size, MADV_SEQUENTIAL);
  *size_out = (long)st.st_size;
  return addr;
}

void wn_mmap_close(void* addr, long size) {
  if (addr) ::munmap(addr, size);
}

// ---------------------------------------------------------------------------
// Detokenizer
// ---------------------------------------------------------------------------

namespace {

struct Detok {
  // per token id: decoded byte string (GPT-2 byte-level) and reference-mode
  // string (Ġ->space, literal \n->newline), plus special flag
  std::vector<std::string> bytes_mode;
  std::vector<std::string> ref_mode;
  std::vector<uint8_t> special;
};

// GPT-2 bytes_to_unicode inverse: unicode codepoint -> byte.
static std::unordered_map<uint32_t, uint8_t> make_byte_decoder() {
  std::unordered_map<uint32_t, uint8_t> m;
  std::vector<int> bs;
  for (int b = '!'; b <= '~'; ++b) bs.push_back(b);
  for (int b = 0xA1; b <= 0xAC; ++b) bs.push_back(b);
  for (int b = 0xAE; b <= 0xFF; ++b) bs.push_back(b);
  std::vector<bool> present(256, false);
  for (int b : bs) present[b] = true;
  for (int b : bs) m[(uint32_t)b] = (uint8_t)b;
  int n = 0;
  for (int b = 0; b < 256; ++b)
    if (!present[b]) m[256 + n++] = (uint8_t)b;
  return m;
}

// Minimal UTF-8 decode; invalid sequences yield U+FFFD and advance 1 byte.
static uint32_t utf8_next(const char* s, size_t len, size_t& i) {
  const uint8_t c = (uint8_t)s[i];
  if (c < 0x80) {
    i += 1;
    return c;
  }
  int extra = (c >= 0xF0) ? 3 : (c >= 0xE0) ? 2 : (c >= 0xC0) ? 1 : 0;
  if (extra == 0 || i + extra >= len) {
    i += 1;
    return 0xFFFD;
  }
  uint32_t cp = c & (0x3F >> extra);
  for (int k = 1; k <= extra; ++k) cp = (cp << 6) | ((uint8_t)s[i + k] & 0x3F);
  i += extra + 1;
  return cp;
}

}  // namespace

// Build a detokenizer from vocab.txt bytes (one token per line, id = line-1,
// real newlines escaped as the literal two characters "\n").
void* wn_detok_new(const char* vocab, long nbytes) {
  auto bd = make_byte_decoder();
  auto* d = new Detok();
  size_t start = 0;
  const std::string buf(vocab, (size_t)nbytes);
  while (start <= buf.size()) {
    size_t end = buf.find('\n', start);
    if (end == std::string::npos) end = buf.size();
    if (start == buf.size() && end == buf.size()) break;  // trailing newline
    std::string tok = buf.substr(start, end - start);
    start = end + 1;
    // unescape the literal two-character "\n"
    std::string unescaped;
    unescaped.reserve(tok.size());
    for (size_t i = 0; i < tok.size(); ++i) {
      if (tok[i] == '\\' && i + 1 < tok.size() && tok[i + 1] == 'n') {
        unescaped.push_back('\n');
        ++i;
      } else {
        unescaped.push_back(tok[i]);
      }
    }
    const bool is_special = tok.size() >= 4 && tok.rfind("<|", 0) == 0 &&
                            tok.compare(tok.size() - 2, 2, "|>") == 0;
    // bytes mode: map each codepoint back to its byte
    std::string bytes_out;
    size_t i = 0;
    while (i < unescaped.size()) {
      uint32_t cp = utf8_next(unescaped.data(), unescaped.size(), i);
      auto it = bd.find(cp);
      bytes_out.push_back(it != bd.end() ? (char)it->second : '?');
    }
    // reference mode (tokenizer.mojo:15-28): "Ġ" (U+0120) -> space
    std::string ref_out;
    i = 0;
    while (i < unescaped.size()) {
      size_t before = i;
      uint32_t cp = utf8_next(unescaped.data(), unescaped.size(), i);
      if (cp == 0x120)
        ref_out.push_back(' ');
      else
        ref_out.append(unescaped, before, i - before);
    }
    d->bytes_mode.push_back(std::move(bytes_out));
    d->ref_mode.push_back(std::move(ref_out));
    d->special.push_back(is_special ? 1 : 0);
  }
  return d;
}

long wn_detok_vocab_size(void* handle) {
  return (long)((Detok*)handle)->bytes_mode.size();
}

// Decode ids into out (capacity cap). Returns bytes written, or -(needed)
// if cap is too small. reference_mode selects the reference's lossy decode.
long wn_detok_decode(void* handle, const int32_t* ids, long n, char* out,
                     long cap, int skip_special, int reference_mode) {
  auto* d = (Detok*)handle;
  const auto& table = reference_mode ? d->ref_mode : d->bytes_mode;
  std::string result;
  for (long i = 0; i < n; ++i) {
    const long id = ids[i];
    if (id < 0 || (size_t)id >= table.size()) continue;
    if (d->special[id]) {
      if (skip_special) continue;
      // specials decode as their literal "<|...|>" text in both modes
      result += reference_mode ? d->ref_mode[id] : d->ref_mode[id];
      continue;
    }
    result += table[id];
  }
  if ((long)result.size() > cap) return -(long)result.size();
  std::memcpy(out, result.data(), result.size());
  return (long)result.size();
}

void wn_detok_free(void* handle) { delete (Detok*)handle; }

}  // extern "C"
