// wcb_native: native host-side runtime for the data pipeline.
//
// The reference's data loader decodes audio in a single Python DataLoader
// worker (librosa per sample). This library provides the C++ replacement the
// TPU input pipeline feeds from:
//   * RIFF/WAVE parsing (PCM8/16/32 + IEEE float32), mono downmix
//   * windowed-sinc polyphase resampling to the target rate
//   * a multithreaded batch API: decode N files into a caller-provided
//     fixed-length (pad/trim) float32 buffer in parallel
//
// Pure C ABI (ctypes-consumable), C++17, no external dependencies.

#include <algorithm>
#include <atomic>
#include <mutex>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr double kPi = 3.14159265358979323846;

struct Wave {
  std::vector<float> samples;  // mono
  int sample_rate = 0;
};

uint32_t rd_u32(const uint8_t* p) {
  return p[0] | (p[1] << 8) | (p[2] << 16) | (uint32_t(p[3]) << 24);
}
uint16_t rd_u16(const uint8_t* p) { return p[0] | (p[1] << 8); }

bool parse_wav(const uint8_t* data, size_t len, Wave* out, std::string* err) {
  if (len < 44 || memcmp(data, "RIFF", 4) != 0 || memcmp(data + 8, "WAVE", 4) != 0) {
    *err = "not a RIFF/WAVE file";
    return false;
  }
  size_t pos = 12;
  uint16_t fmt = 0, channels = 0, bits = 0;
  uint32_t rate = 0;
  const uint8_t* pcm = nullptr;
  size_t pcm_len = 0;
  while (pos + 8 <= len) {
    const uint8_t* hdr = data + pos;
    uint32_t chunk_len = rd_u32(hdr + 4);
    const uint8_t* body = hdr + 8;
    if (pos + 8 + chunk_len > len) chunk_len = uint32_t(len - pos - 8);
    if (memcmp(hdr, "fmt ", 4) == 0 && chunk_len >= 16) {
      fmt = rd_u16(body);
      channels = rd_u16(body + 2);
      rate = rd_u32(body + 4);
      bits = rd_u16(body + 14);
      // WAVE_FORMAT_EXTENSIBLE: the real format is the first two bytes of
      // the SubFormat GUID in the fmt extension (pro-audio tools emit this
      // container for plain PCM/float data)
      if (fmt == 0xFFFE && chunk_len >= 40) fmt = rd_u16(body + 24);
    } else if (memcmp(hdr, "data", 4) == 0) {
      pcm = body;
      pcm_len = chunk_len;
    }
    pos += 8 + chunk_len + (chunk_len & 1);
  }
  if (!pcm || channels == 0 || rate == 0) {
    *err = "missing fmt/data chunk";
    return false;
  }
  if (fmt != 1 && fmt != 3) {  // PCM or IEEE float
    *err = "unsupported WAV format tag " + std::to_string(fmt);
    return false;
  }
  size_t bytes_per = bits / 8;
  if (bytes_per == 0) {
    *err = "bad bit depth";
    return false;
  }
  size_t n_frames = pcm_len / (bytes_per * channels);
  out->samples.assign(n_frames, 0.0f);
  out->sample_rate = int(rate);
  const float inv_ch = 1.0f / channels;
  for (size_t i = 0; i < n_frames; ++i) {
    float acc = 0.0f;
    for (int c = 0; c < channels; ++c) {
      const uint8_t* s = pcm + (i * channels + c) * bytes_per;
      float v = 0.0f;
      if (fmt == 3 && bits == 32) {
        float f;
        memcpy(&f, s, 4);
        v = f;
      } else if (bits == 16) {
        int16_t x;
        memcpy(&x, s, 2);
        v = float(x) / 32768.0f;
      } else if (bits == 32) {
        int32_t x;
        memcpy(&x, s, 4);
        v = float(x) / 2147483648.0f;
      } else if (bits == 8) {
        v = (float(s[0]) - 128.0f) / 128.0f;
      } else {
        *err = "unsupported bit depth " + std::to_string(bits);
        return false;
      }
      acc += v;
    }
    out->samples[i] = acc * inv_ch;
  }
  return true;
}

bool read_file(const char* path, std::vector<uint8_t>* buf) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (n <= 0) {
    fclose(f);
    return false;
  }
  buf->resize(size_t(n));
  size_t got = fread(buf->data(), 1, size_t(n), f);
  fclose(f);
  return got == size_t(n);
}

// Windowed-sinc polyphase resampler (Hann window), zero-phase.
std::vector<float> resample_sinc(const std::vector<float>& in, int sr_in,
                                 int sr_out, int half_taps = 32) {
  if (sr_in == sr_out || in.empty()) return in;
  const double ratio = double(sr_out) / sr_in;
  const double cutoff = std::min(1.0, ratio);  // anti-alias when downsampling
  const size_t n_out = size_t(std::ceil(in.size() * ratio));
  std::vector<float> out(n_out, 0.0f);
  const double support = half_taps / cutoff;
  for (size_t j = 0; j < n_out; ++j) {
    const double center = j / ratio;
    const long lo = std::max(0L, long(std::ceil(center - support)));
    const long hi = std::min(long(in.size()) - 1, long(std::floor(center + support)));
    double acc = 0.0;
    for (long i = lo; i <= hi; ++i) {
      const double x = (i - center) * cutoff;
      double sinc = (std::abs(x) < 1e-9) ? 1.0 : std::sin(kPi * x) / (kPi * x);
      const double w = 0.5 * (1.0 + std::cos(kPi * (i - center) / support));
      acc += in[size_t(i)] * sinc * w;
    }
    out[j] = float(cutoff * acc);
  }
  return out;
}

thread_local std::string g_error;
// batch workers run on their own threads; the first failure's message is
// copied here so the caller's thread can read it
std::mutex g_batch_error_mu;
std::string g_batch_error;

}  // namespace

extern "C" {

const char* wcb_last_error() {
  if (!g_error.empty()) return g_error.c_str();
  std::lock_guard<std::mutex> lock(g_batch_error_mu);
  return g_batch_error.c_str();
}

// Decode one file to mono float32 at target_rate.
// Returns number of samples written to `out` (capped at out_capacity), or -1.
// `actual_len` (may be null) receives the un-truncated length.
long wcb_decode_audio(const char* path, int target_rate, float* out,
                      long out_capacity, long* actual_len) {
  std::vector<uint8_t> raw;
  if (!read_file(path, &raw)) {
    g_error = std::string("cannot read file: ") + path;
    return -1;
  }
  Wave w;
  std::string err;
  if (!parse_wav(raw.data(), raw.size(), &w, &err)) {
    g_error = err + " (" + path + ")";
    return -1;
  }
  std::vector<float> mono = (w.sample_rate == target_rate)
                                ? std::move(w.samples)
                                : resample_sinc(w.samples, w.sample_rate, target_rate);
  if (actual_len) *actual_len = long(mono.size());
  const long n = std::min(long(mono.size()), out_capacity);
  if (out && n > 0) memcpy(out, mono.data(), size_t(n) * sizeof(float));
  return n;
}

// Decode `n` files in parallel into out[n * fixed_len] (pad with zeros /
// trim to fixed_len — the Whisper 30 s window contract). Returns 0 on
// success, else the 1-based index of the first file that failed.
long wcb_decode_batch(const char** paths, long n, int target_rate,
                      long fixed_len, float* out, int num_threads) {
  {
    std::lock_guard<std::mutex> lock(g_batch_error_mu);
    g_batch_error.clear();
  }
  g_error.clear();
  if (num_threads <= 0)
    num_threads = int(std::thread::hardware_concurrency());
  num_threads = std::max(1, std::min<int>(num_threads, int(n)));
  std::atomic<long> next(0), failed(0);
  auto worker = [&]() {
    for (;;) {
      long i = next.fetch_add(1);
      if (i >= n || failed.load() != 0) return;
      float* dst = out + i * fixed_len;
      memset(dst, 0, size_t(fixed_len) * sizeof(float));
      long got = wcb_decode_audio(paths[i], target_rate, dst, fixed_len, nullptr);
      if (got < 0) {
        long expect = 0;
        if (failed.compare_exchange_strong(expect, i + 1)) {
          std::lock_guard<std::mutex> lock(g_batch_error_mu);
          g_batch_error = g_error;  // copy the worker's thread-local message
        }
      }
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < num_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failed.load();
}

// Resample a raw float buffer (for non-WAV decoders upstream).
long wcb_resample(const float* in, long n_in, int sr_in, int sr_out,
                  float* out, long out_capacity) {
  std::vector<float> v(in, in + n_in);
  std::vector<float> r = resample_sinc(v, sr_in, sr_out);
  const long n = std::min(long(r.size()), out_capacity);
  memcpy(out, r.data(), size_t(n) * sizeof(float));
  return n;
}

}  // extern "C"
