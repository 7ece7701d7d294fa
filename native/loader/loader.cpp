// Native audio window decoder for the training feeder.
//
// The feeder's hot host loop assembles [start, start+size) sample windows
// from per-second wav chunk files ({:06d}.wav) with zero padding outside the
// recorded range and an optional ambisonic azimuth rotation
// (data/readers.py AudioChunkReader semantics). In Python this work is
// GIL-bound; this decoder runs it in C (ctypes releases the GIL for the
// call), so feeder worker threads scale with host cores.
//
// Supports the layouts the ETL writes: PCM 16/24/32 and float32 RIFF at the
// dataset's native rate (resampling paths stay in Python).

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct WavInfo {
  uint16_t format = 0;
  uint16_t channels = 0;
  uint32_t rate = 0;
  uint16_t bits = 0;
  uint16_t block_align = 0;
  long data_offset = 0;
  uint32_t data_size = 0;
};

bool ParseHeader(FILE* f, WavInfo* info) {
  unsigned char hdr[12];
  if (fread(hdr, 1, 12, f) != 12) return false;
  if (memcmp(hdr, "RIFF", 4) != 0 || memcmp(hdr + 8, "WAVE", 4) != 0) return false;
  unsigned char chunk[8];
  while (fread(chunk, 1, 8, f) == 8) {
    uint32_t size;
    memcpy(&size, chunk + 4, 4);
    if (memcmp(chunk, "fmt ", 4) == 0) {
      std::vector<unsigned char> fmt(size);
      if (fread(fmt.data(), 1, size, f) != size) return false;
      memcpy(&info->format, fmt.data(), 2);
      memcpy(&info->channels, fmt.data() + 2, 2);
      memcpy(&info->rate, fmt.data() + 4, 4);
      memcpy(&info->block_align, fmt.data() + 12, 2);
      memcpy(&info->bits, fmt.data() + 14, 2);
      if (info->format == 0xFFFE && size >= 26) {
        memcpy(&info->format, fmt.data() + 24, 2);
      }
      if (size & 1) fseek(f, 1, SEEK_CUR);
    } else if (memcmp(chunk, "data", 4) == 0) {
      info->data_offset = ftell(f);
      info->data_size = size;
      return info->format != 0;
    } else {
      fseek(f, size + (size & 1), SEEK_CUR);
    }
  }
  return false;
}

// Decode `n_frames` frames starting at `frame0` of the file into out
// (n_frames x out_channels, f32, channel-truncated). Returns frames decoded.
long DecodeRange(const char* path, long frame0, long n_frames,
                 int out_channels, float* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  WavInfo info;
  if (!ParseHeader(f, &info)) {
    fclose(f);
    return -1;
  }
  const long file_frames = info.data_size / info.block_align;
  frame0 = std::max(0L, std::min(frame0, file_frames));
  n_frames = std::max(0L, std::min(n_frames, file_frames - frame0));
  if (n_frames == 0) {
    fclose(f);
    return 0;
  }
  fseek(f, info.data_offset + frame0 * info.block_align, SEEK_SET);
  std::vector<unsigned char> raw(n_frames * info.block_align);
  const size_t got = fread(raw.data(), 1, raw.size(), f);
  fclose(f);
  const long frames = static_cast<long>(got / info.block_align);
  const int nc = std::min<int>(info.channels, out_channels);
  const int bytes = info.bits / 8;

  for (long t = 0; t < frames; ++t) {
    const unsigned char* p = raw.data() + t * info.block_align;
    float* o = out + t * out_channels;
    for (int c = 0; c < nc; ++c) {
      const unsigned char* q = p + c * bytes;
      float v = 0.0f;
      if (info.format == 1 && info.bits == 16) {
        int16_t x;
        memcpy(&x, q, 2);
        v = x / 32768.0f;
      } else if (info.format == 1 && info.bits == 24) {
        int32_t x = q[0] | (q[1] << 8) | (q[2] << 16);
        if (x >= (1 << 23)) x -= (1 << 24);
        v = x / 8388608.0f;
      } else if (info.format == 1 && info.bits == 32) {
        int32_t x;
        memcpy(&x, q, 4);
        v = static_cast<float>(x / 2147483648.0);
      } else if (info.format == 3 && info.bits == 32) {
        memcpy(&v, q, 4);
      }
      o[c] = v;
    }
  }
  return frames;
}

}  // namespace

extern "C" {

// Decode an entire wav file (up to max_frames) into out
// (max_frames x out_channels f32, channel-truncated, zero-filled for
// missing channels). Returns the number of frames decoded, negative on
// error. Used by the feeder's per-second chunk cache: decoding runs
// GIL-free here while the (cheap, vectorized) window assembly and cache
// bookkeeping stay in Python, so overlapping windows never re-decode.
long sag_decode_wav(const char* path, int out_channels, long max_frames,
                    float* out) {
  return DecodeRange(path, 0, max_frames, out_channels, out);
}

}  // extern "C"
