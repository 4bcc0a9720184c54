// Native IO runtime: threaded RIFF/WAVE decoding for the feature-extraction
// front-end.
//
// The reference decodes wavs one-by-one with Python's `wave` module on the
// training path (Classification/audio_features_whole.py:78-94).  This
// library is the framework's host-side IO component: it parses 16-bit PCM
// RIFF files directly, converts to float32, and fans a whole corpus read
// out over a thread pool so wav decode overlaps with TPU compute.  (The
// reference's empty-file silence fallback is applied by the PYTHON caller
// — data/eatd.py::_apply_silence_fallback — for both decode paths.)
//
// Exposed C ABI (used from Python via ctypes — see
// icassp2022_depression_tpu/utils/native.py):
//   wavio_read_info(path, *sr, *n_samples) -> 0 ok / <0 error
//   wavio_read(path, out, capacity, *sr)   -> samples written or <0
//   wavio_read_batch(paths, n, outs, caps, srs, lens, n_threads) -> 0/<0

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

#pragma pack(push, 1)
struct RiffHeader {
  char riff[4];
  uint32_t size;
  char wave[4];
};
struct ChunkHeader {
  char id[4];
  uint32_t size;
};
struct FmtChunk {
  uint16_t format;
  uint16_t channels;
  uint32_t sample_rate;
  uint32_t byte_rate;
  uint16_t block_align;
  uint16_t bits;
};
#pragma pack(pop)

struct WavInfo {
  uint32_t sample_rate = 0;
  uint16_t channels = 0;
  uint16_t bits = 0;
  long data_offset = -1;
  uint32_t data_size = 0;
};

int parse_header(FILE* f, WavInfo* info) {
  RiffHeader rh;
  if (fread(&rh, sizeof(rh), 1, f) != 1) return -2;
  if (memcmp(rh.riff, "RIFF", 4) != 0 || memcmp(rh.wave, "WAVE", 4) != 0)
    return -3;
  ChunkHeader ch;
  while (fread(&ch, sizeof(ch), 1, f) == 1) {
    if (memcmp(ch.id, "fmt ", 4) == 0) {
      FmtChunk fmt;
      uint32_t take = ch.size < sizeof(fmt) ? ch.size : sizeof(fmt);
      if (fread(&fmt, take, 1, f) != 1) return -4;
      // skip any fmt extension AND the RIFF word-alignment pad byte for
      // odd-sized chunks (legal, if unusual) — omitting the pad would
      // misalign the next ChunkHeader read by one byte
      if (ch.size > take) fseek(f, ch.size - take, SEEK_CUR);
      if (ch.size & 1) fseek(f, 1, SEEK_CUR);
      info->sample_rate = fmt.sample_rate;
      info->channels = fmt.channels;
      info->bits = fmt.bits;
    } else if (memcmp(ch.id, "data", 4) == 0) {
      info->data_offset = ftell(f);
      info->data_size = ch.size;
      return 0;
    } else {
      // chunks are word-aligned
      fseek(f, ch.size + (ch.size & 1), SEEK_CUR);
    }
  }
  return info->data_offset >= 0 ? 0 : -5;
}

int read_one(const char* path, float* out, int64_t capacity, int32_t* sr) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  WavInfo info;
  int rc = parse_header(f, &info);
  if (rc != 0) {
    fclose(f);
    return rc;
  }
  // mono 16-bit PCM only: multi-channel semantics would diverge from the
  // stdlib wave path (which keeps interleaved samples) — reject instead
  if (info.bits != 16 || info.channels != 1) {
    fclose(f);
    return -6;
  }
  *sr = static_cast<int32_t>(info.sample_rate);
  int64_t n_frames =
      info.data_size / (info.channels * (info.bits / 8));
  if (out == nullptr) {
    fclose(f);
    return static_cast<int>(n_frames > INT32_MAX ? -7 : n_frames);
  }
  if (n_frames > capacity) n_frames = capacity;
  fseek(f, info.data_offset, SEEK_SET);
  std::vector<int16_t> buf(4096 * info.channels);
  int64_t written = 0;
  while (written < n_frames) {
    int64_t want = n_frames - written;
    int64_t chunk = want < 4096 ? want : 4096;
    size_t got = fread(buf.data(), sizeof(int16_t) * info.channels,
                       static_cast<size_t>(chunk), f);
    if (got == 0) break;
    for (size_t i = 0; i < got; ++i) {
      // channel 0 only (EATD/DAIC wavs are mono)
      out[written + static_cast<int64_t>(i)] =
          static_cast<float>(buf[i * info.channels]);
    }
    written += static_cast<int64_t>(got);
  }
  fclose(f);
  return static_cast<int>(written);
}

}  // namespace

extern "C" {

int wavio_read_info(const char* path, int32_t* sr, int64_t* n_samples) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  WavInfo info;
  int rc = parse_header(f, &info);
  fclose(f);
  if (rc != 0) return rc;
  if (info.bits != 16 || info.channels != 1) return -6;
  *sr = static_cast<int32_t>(info.sample_rate);
  *n_samples = info.data_size / (info.channels * (info.bits / 8));
  return 0;
}

int wavio_read(const char* path, float* out, int64_t capacity, int32_t* sr) {
  return read_one(path, out, capacity, sr);
}

// Parallel batch read: outs[i] must have capacity caps[i] floats.
// lens[i] receives the sample count (or a negative error code).
int wavio_read_batch(const char** paths, int32_t n, float** outs,
                     const int64_t* caps, int32_t* srs, int64_t* lens,
                     int32_t n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int32_t> next(0);
  std::atomic<int> status(0);
  auto worker = [&]() {
    while (true) {
      int32_t i = next.fetch_add(1);
      if (i >= n) break;
      int rc = read_one(paths[i], outs[i], caps[i], &srs[i]);
      lens[i] = rc;
      if (rc < 0) status.store(rc);
    }
  };
  std::vector<std::thread> pool;
  int32_t workers = n_threads < n ? n_threads : n;
  pool.reserve(static_cast<size_t>(workers));
  for (int32_t t = 0; t < workers; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return status.load();
}

}  // extern "C"
