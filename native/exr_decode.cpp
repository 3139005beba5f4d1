// Native scanline-EXR chunk decoder for reni_tpu.data.exr.
//
// The Python module parses the (tiny) header and hands the chunk region to
// this library, which does the hot work: zlib inflate, the EXR ZIP
// pre-filter inversion (delta-decode + half de-interleave, ImfZip.cpp
// uncompress path), HALF/FLOAT/UINT -> float32 conversion, and the scatter
// from channel-planar scanlines into an interleaved (H, W, C) float buffer.
// Chunks are independent, so they decode on a small thread pool; the ctypes
// call releases the GIL, so the Python-side ThreadPoolExecutor over files
// also scales (the pure-Python decoder is GIL-bound).
//
// Replaces the native OpenEXR/imageio dependency of the reference
// (reference: src/data/datasets.py:80, environment.yml `openexr`).
//
// Build: g++ -O3 -shared -fPIC exr_decode.cpp -o libexr_decode.so -lz

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

// 65536-entry half->float table, built once (branch-free inner loops).
float g_half_table[65536];
std::atomic<bool> g_half_ready{false};

float half_bits_to_float(uint16_t h) {
  uint32_t sign = static_cast<uint32_t>(h >> 15) << 31;
  uint32_t exp = (h >> 10) & 0x1F;
  uint32_t mant = h & 0x3FF;
  uint32_t bits;
  if (exp == 0) {
    if (mant == 0) {
      bits = sign;  // +-0
    } else {  // subnormal half (mant * 2^-24) -> normal float
      int e = 0;
      uint32_t m = mant;
      while (!(m & 0x400)) {
        m <<= 1;
        ++e;
      }
      m &= 0x3FF;
      // e shifts normalise the top set bit to 2^10: value = mant * 2^-24
      // = (1 + m/1024) * 2^(-14 - e), so the float exponent is 113 - e
      bits = sign | (static_cast<uint32_t>(127 - 14 - e) << 23) | (m << 13);
    }
  } else if (exp == 31) {  // inf / nan
    bits = sign | 0x7F800000u | (mant << 13);
  } else {
    bits = sign | ((exp - 15 + 127) << 23) | (mant << 13);
  }
  float f;
  std::memcpy(&f, &bits, 4);
  return f;
}

void ensure_half_table() {
  if (g_half_ready.load(std::memory_order_acquire)) return;
  for (int i = 0; i < 65536; ++i)
    g_half_table[i] = half_bits_to_float(static_cast<uint16_t>(i));
  g_half_ready.store(true, std::memory_order_release);
}

// Invert the EXR ZIP pre-filter (ImfZip.cpp): delta-decode then
// de-interleave the two halves (out[0::2] = t[:half], out[1::2] = t[half:]).
void unpredict_deinterleave(const uint8_t* in, size_t n, uint8_t* out,
                            uint8_t* scratch) {
  if (n == 0) return;
  uint8_t prev = in[0];
  scratch[0] = prev;
  for (size_t i = 1; i < n; ++i) {
    prev = static_cast<uint8_t>(prev + in[i] - 128);
    scratch[i] = prev;
  }
  size_t half = (n + 1) / 2;
  const uint8_t* a = scratch;
  const uint8_t* b = scratch + half;
  size_t na = half, nb = n - half;
  for (size_t i = 0; i < nb; ++i) {
    out[2 * i] = a[i];
    out[2 * i + 1] = b[i];
  }
  if (na > nb) out[2 * nb] = a[nb];  // odd byte count
}

struct ChunkInfo {
  int y;
  const uint8_t* payload;
  size_t size;
};

struct DecodeJob {
  const std::vector<ChunkInfo>* chunks;
  int lines_per_chunk;
  int compression;  // 0 NONE, 2 ZIPS, 3 ZIP
  int width;
  int height;
  int ymin;
  int n_file_channels;
  const int32_t* ch_ptypes;  // 0 UINT, 1 HALF, 2 FLOAT (file channel order)
  const int32_t* ch_out;     // output channel index or -1 (file channel order)
  int out_channels;
  float* out;  // (height, width, out_channels), interleaved
  std::atomic<int>* next;
  std::atomic<int>* err;
};

size_t itemsize(int ptype) { return ptype == 1 ? 2 : 4; }

void decode_worker(DecodeJob job) {
  size_t bytes_per_pixel = 0;
  for (int c = 0; c < job.n_file_channels; ++c)
    bytes_per_pixel += itemsize(job.ch_ptypes[c]);
  const size_t max_raw =
      static_cast<size_t>(job.lines_per_chunk) * job.width * bytes_per_pixel;
  std::vector<uint8_t> raw(max_raw), scratch(max_raw), inflated(max_raw);

  for (;;) {
    int ci = job.next->fetch_add(1);
    if (ci >= static_cast<int>(job.chunks->size())) return;
    if (job.err->load(std::memory_order_relaxed)) return;
    const ChunkInfo& ch = (*job.chunks)[ci];
    int row0 = ch.y - job.ymin;
    if (row0 < 0 || row0 >= job.height) {
      job.err->store(2);
      return;
    }
    int nrows = job.lines_per_chunk;
    if (row0 + nrows > job.height) nrows = job.height - row0;
    size_t raw_size = static_cast<size_t>(nrows) * job.width * bytes_per_pixel;

    const uint8_t* src;
    if (job.compression == 0 || ch.size >= raw_size) {
      // uncompressed, or the writer stored the chunk raw (ZIP chunks whose
      // deflate output would not shrink)
      if (ch.size < raw_size) {
        job.err->store(3);
        return;
      }
      src = ch.payload;
    } else {
      uLongf dest_len = raw_size;
      int rc = uncompress(inflated.data(), &dest_len, ch.payload,
                          static_cast<uLong>(ch.size));
      if (rc != Z_OK || dest_len != raw_size) {
        job.err->store(4);
        return;
      }
      unpredict_deinterleave(inflated.data(), raw_size, raw.data(),
                             scratch.data());
      src = raw.data();
    }

    // scanline layout: per row, channels in file order, each a contiguous
    // width * itemsize run
    const uint8_t* p = src;
    for (int r = 0; r < nrows; ++r) {
      float* out_row = job.out + (static_cast<size_t>(row0 + r) * job.width) *
                                     job.out_channels;
      for (int c = 0; c < job.n_file_channels; ++c) {
        int ptype = job.ch_ptypes[c];
        int oc = job.ch_out[c];
        if (oc < 0) {
          p += job.width * itemsize(ptype);
          continue;
        }
        float* dst = out_row + oc;
        if (ptype == 1) {
          const uint16_t* hp = reinterpret_cast<const uint16_t*>(p);
          for (int x = 0; x < job.width; ++x) {
            uint16_t h;
            std::memcpy(&h, hp + x, 2);
            dst[static_cast<size_t>(x) * job.out_channels] = g_half_table[h];
          }
          p += job.width * 2;
        } else if (ptype == 2) {
          for (int x = 0; x < job.width; ++x) {
            float f;
            std::memcpy(&f, p + 4 * x, 4);
            dst[static_cast<size_t>(x) * job.out_channels] = f;
          }
          p += job.width * 4;
        } else {  // UINT
          for (int x = 0; x < job.width; ++x) {
            uint32_t u;
            std::memcpy(&u, p + 4 * x, 4);
            dst[static_cast<size_t>(x) * job.out_channels] =
                static_cast<float>(u);
          }
          p += job.width * 4;
        }
      }
    }
  }
}

}  // namespace

extern "C" {

// Returns 0 on success; 1 bad chunk framing, 2 bad y, 3 short raw chunk,
// 4 zlib failure.
int exr_decode_chunks(const uint8_t* data, long long data_size, long long pos,
                      int n_chunks, int lines_per_chunk, int compression,
                      int width, int height, int ymin, int n_file_channels,
                      const int32_t* ch_ptypes, const int32_t* ch_out,
                      int out_channels, float* out, int n_threads) {
  ensure_half_table();

  // sequential scan of the chunk framing (y:int32, size:int32, payload)
  std::vector<ChunkInfo> chunks;
  chunks.reserve(n_chunks);
  long long p = pos;
  for (int i = 0; i < n_chunks; ++i) {
    if (p + 8 > data_size) return 1;
    int32_t y, size;
    std::memcpy(&y, data + p, 4);
    std::memcpy(&size, data + p + 4, 4);
    p += 8;
    if (size < 0 || p + size > data_size) return 1;
    chunks.push_back({y, data + p, static_cast<size_t>(size)});
    p += size;
  }

  std::atomic<int> next{0}, err{0};
  DecodeJob job{&chunks,  lines_per_chunk, compression, width,
                height,   ymin,            n_file_channels,
                ch_ptypes, ch_out,         out_channels, out,
                &next,    &err};

  int hw = static_cast<int>(std::thread::hardware_concurrency());
  if (hw <= 0) hw = 4;
  int nt = n_threads > 0 ? n_threads : hw;
  if (nt > n_chunks) nt = n_chunks;
  if (nt <= 1) {
    decode_worker(job);
  } else {
    std::vector<std::thread> threads;
    threads.reserve(nt);
    for (int t = 0; t < nt; ++t) threads.emplace_back(decode_worker, job);
    for (auto& th : threads) th.join();
  }
  return err.load();
}

}  // extern "C"
