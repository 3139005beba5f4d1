// Test-only oracle around the SYSTEM OpenEXR library (libopenexr-dev).
//
// The production decoder is the self-contained in-repo codec
// (reni_tpu/data/exr.py + native/exr_decode.cpp); this wrapper exists so
// the test suite can pin that codec against the AUTHORITATIVE
// implementation instead of against its own encoder: tests encode
// fixtures through real OpenEXR (every compression the format defines,
// scanline and tiled) and assert our reader reproduces OpenEXR's decoded
// values bit-for-bit, and that files our writer emits are accepted and
// correctly decoded by OpenEXR. Reference counterpart: the reference
// leans on the same library through imageio/openexr
// (/root/reference/src/data/datasets.py:80, environment.yml `openexr`).
//
// Built on first use by tests/exr_oracle.py via utils/native_build.py;
// tests skip when the system library is absent.

#include <ImfChannelList.h>
#include <ImfFrameBuffer.h>
#include <ImfHeader.h>
#include <ImfInputFile.h>
#include <ImfInputPart.h>
#include <ImfMultiPartInputFile.h>
#include <ImfMultiPartOutputFile.h>
#include <ImfOutputFile.h>
#include <ImfOutputPart.h>
#include <ImfPartType.h>
#include <ImfStandardAttributes.h>
#include <ImfTiledOutputFile.h>
#include <half.h>

#include <cstring>
#include <string>
#include <vector>

using namespace OPENEXR_IMF_NAMESPACE;
using IMATH_NAMESPACE::Box2i;
using IMATH_NAMESPACE::V2i;

extern "C" {

// Writes an RGB image. pixel_type: 0 = HALF, 1 = FLOAT.
// layout: 0 = scanline, 1 = tiled ONE_LEVEL, 2 = tiled MIPMAP (ROUND_DOWN).
// dwa_level <= 0 leaves the library default (45).
int oracle_write(const char *path, int width, int height, const float *rgb,
                 int compression, int pixel_type, int layout, int tile_size,
                 float dwa_level) {
  try {
    Header header(width, height);
    header.compression() = static_cast<Compression>(compression);
    if (dwa_level > 0) addDwaCompressionLevel(header, dwa_level);
    PixelType pt = pixel_type == 0 ? HALF : FLOAT;
    const char *names[3] = {"R", "G", "B"};
    for (int c = 0; c < 3; ++c) header.channels().insert(names[c], Channel(pt));

    // Interleaved staging buffer in the file's pixel type.
    std::vector<half> hbuf;
    std::vector<float> fbuf;
    const char *base;
    size_t xs, ys;
    if (pt == HALF) {
      hbuf.resize(static_cast<size_t>(width) * height * 3);
      for (size_t i = 0; i < hbuf.size(); ++i) hbuf[i] = half(rgb[i]);
      base = reinterpret_cast<const char *>(hbuf.data());
      xs = 3 * sizeof(half);
      ys = xs * width;
    } else {
      fbuf.assign(rgb, rgb + static_cast<size_t>(width) * height * 3);
      base = reinterpret_cast<const char *>(fbuf.data());
      xs = 3 * sizeof(float);
      ys = xs * width;
    }
    size_t esz = pt == HALF ? sizeof(half) : sizeof(float);

    auto fill_fb = [&](FrameBuffer &fb, const char *b, size_t xst, size_t yst) {
      for (int c = 0; c < 3; ++c)
        fb.insert(names[c],
                  Slice(pt, const_cast<char *>(b) + c * esz, xst, yst));
    };

    if (layout == 0) {
      OutputFile out(path, header);
      FrameBuffer fb;
      fill_fb(fb, base, xs, ys);
      out.setFrameBuffer(fb);
      out.writePixels(height);
      return 0;
    }

    header.setTileDescription(TileDescription(
        tile_size, tile_size, layout == 1 ? ONE_LEVEL : MIPMAP_LEVELS,
        ROUND_DOWN));
    TiledOutputFile out(path, header);
    if (layout == 1) {
      FrameBuffer fb;
      fill_fb(fb, base, xs, ys);
      out.setFrameBuffer(fb);
      out.writeTiles(0, out.numXTiles() - 1, 0, out.numYTiles() - 1);
      return 0;
    }
    // MIPMAP: box-downsample floats per level, restage per level.
    std::vector<float> level(rgb, rgb + static_cast<size_t>(width) * height * 3);
    int lw = width, lh = height;
    for (int l = 0; l < out.numLevels(); ++l) {
      if (l > 0) {
        int nw = std::max(1, lw / 2), nh = std::max(1, lh / 2);
        std::vector<float> next(static_cast<size_t>(nw) * nh * 3);
        for (int y = 0; y < nh; ++y)
          for (int x = 0; x < nw; ++x)
            for (int c = 0; c < 3; ++c) {
              float s = 0;
              int cnt = 0;
              for (int dy = 0; dy < 2; ++dy)
                for (int dx = 0; dx < 2; ++dx) {
                  int sy = 2 * y + dy, sx = 2 * x + dx;
                  if (sy < lh && sx < lw) {
                    s += level[(static_cast<size_t>(sy) * lw + sx) * 3 + c];
                    ++cnt;
                  }
                }
              next[(static_cast<size_t>(y) * nw + x) * 3 + c] = s / cnt;
            }
        level.swap(next);
        lw = nw;
        lh = nh;
      }
      const char *lbase;
      std::vector<half> lh16;
      if (pt == HALF) {
        lh16.resize(level.size());
        for (size_t i = 0; i < level.size(); ++i) lh16[i] = half(level[i]);
        lbase = reinterpret_cast<const char *>(lh16.data());
      } else {
        lbase = reinterpret_cast<const char *>(level.data());
      }
      FrameBuffer fb;
      fill_fb(fb, lbase, 3 * esz, 3 * esz * lw);
      out.setFrameBuffer(fb);
      out.writeTiles(0, out.numXTiles(l) - 1, 0, out.numYTiles(l) - 1, l);
    }
    return 0;
  } catch (...) {
    return 1;
  }
}

// Multi-part scanline RGB writer: n_parts images of identical size, each
// with its own compression (compressions[i]) and part name "part<i>".
int oracle_write_multipart(const char *path, int width, int height,
                           const float *rgb /* n_parts*H*W*3 */, int n_parts,
                           const int *compressions, int pixel_type) {
  try {
    PixelType pt = pixel_type == 0 ? HALF : FLOAT;
    const char *names[3] = {"R", "G", "B"};
    std::vector<Header> headers;
    for (int p = 0; p < n_parts; ++p) {
      Header h(width, height);
      h.compression() = static_cast<Compression>(compressions[p]);
      for (int c = 0; c < 3; ++c) h.channels().insert(names[c], Channel(pt));
      h.setName("part" + std::to_string(p));
      h.setType(SCANLINEIMAGE);
      headers.push_back(h);
    }
    MultiPartOutputFile out(path, headers.data(), n_parts);
    size_t npix = static_cast<size_t>(width) * height * 3;
    for (int p = 0; p < n_parts; ++p) {
      const float *src = rgb + p * npix;
      std::vector<half> hbuf;
      std::vector<float> fbuf;
      const char *base;
      size_t esz = pt == HALF ? sizeof(half) : sizeof(float);
      if (pt == HALF) {
        hbuf.resize(npix);
        for (size_t i = 0; i < npix; ++i) hbuf[i] = half(src[i]);
        base = reinterpret_cast<const char *>(hbuf.data());
      } else {
        base = reinterpret_cast<const char *>(src);
      }
      FrameBuffer fb;
      for (int c = 0; c < 3; ++c)
        fb.insert(names[c], Slice(pt, const_cast<char *>(base) + c * esz,
                                  3 * esz, 3 * esz * width));
      OutputPart part(out, p);
      part.setFrameBuffer(fb);
      part.writePixels(height);
    }
    return 0;
  } catch (...) {
    return 1;
  }
}

// Generic scanline writer for arbitrary channel sets (DWA classifies
// channels by NAME — R/G/B/Y/BY/RY are LOSSY_DCT, A is RLE, anything else
// UNKNOWN — so codec tests need more than RGB). `names` is ';'-joined,
// `types` per channel (0 UINT, 1 HALF, 2 FLOAT), `planes` is planar
// float data (n_ch * height * width); UINT channels store the float cast
// to uint32.
int oracle_write_channels(const char *path, int width, int height, int n_ch,
                          const char *names, const int *types,
                          const float *planes, int compression,
                          float dwa_level) {
  try {
    std::vector<std::string> chnames;
    {
      std::string all(names);
      size_t start = 0;
      while (start <= all.size()) {
        size_t end = all.find(';', start);
        if (end == std::string::npos) end = all.size();
        chnames.push_back(all.substr(start, end - start));
        start = end + 1;
      }
    }
    Header header(width, height);
    header.compression() = static_cast<Compression>(compression);
    if (dwa_level > 0) addDwaCompressionLevel(header, dwa_level);
    for (int c = 0; c < n_ch; ++c)
      header.channels().insert(chnames[c].c_str(),
                               Channel(static_cast<PixelType>(types[c])));

    size_t npix = static_cast<size_t>(width) * height;
    std::vector<std::vector<half>> hplanes(n_ch);
    std::vector<std::vector<unsigned int>> uplanes(n_ch);
    FrameBuffer fb;
    for (int c = 0; c < n_ch; ++c) {
      const float *src = planes + c * npix;
      PixelType pt = static_cast<PixelType>(types[c]);
      char *base;
      size_t esz;
      if (pt == HALF) {
        hplanes[c].resize(npix);
        for (size_t i = 0; i < npix; ++i) hplanes[c][i] = half(src[i]);
        base = reinterpret_cast<char *>(hplanes[c].data());
        esz = sizeof(half);
      } else if (pt == UINT) {
        uplanes[c].resize(npix);
        for (size_t i = 0; i < npix; ++i)
          uplanes[c][i] = static_cast<unsigned int>(src[i]);
        base = reinterpret_cast<char *>(uplanes[c].data());
        esz = sizeof(unsigned int);
      } else {
        base = reinterpret_cast<char *>(const_cast<float *>(src));
        esz = sizeof(float);
      }
      fb.insert(chnames[c].c_str(), Slice(pt, base, esz, esz * width));
    }
    OutputFile out(path, header);
    out.setFrameBuffer(fb);
    out.writePixels(height);
    return 0;
  } catch (...) {
    return 1;
  }
}

// Reads one named channel as float (UINT/HALF converted by OpenEXR).
int oracle_read_channel(const char *path, const char *name, float *out) {
  try {
    InputFile in(path);
    Box2i dw = in.header().dataWindow();
    int w = dw.max.x - dw.min.x + 1;
    FrameBuffer fb;
    char *origin = reinterpret_cast<char *>(out) -
                   (static_cast<ptrdiff_t>(dw.min.y) * w + dw.min.x) *
                       sizeof(float);
    fb.insert(name, Slice(FLOAT, origin, sizeof(float), sizeof(float) * w));
    in.setFrameBuffer(fb);
    in.readPixels(dw.min.y, dw.max.y);
    return 0;
  } catch (...) {
    return 1;
  }
}

int oracle_read_size(const char *path, int *w, int *h) {
  try {
    InputFile in(path);
    Box2i dw = in.header().dataWindow();
    *w = dw.max.x - dw.min.x + 1;
    *h = dw.max.y - dw.min.y + 1;
    return 0;
  } catch (...) {
    return 1;
  }
}

// Reads R,G,B to float (OpenEXR converts half->float on read — the exact
// widening our table-driven half->float is pinned against).
int oracle_read(const char *path, float *out) {
  try {
    InputFile in(path);
    Box2i dw = in.header().dataWindow();
    int w = dw.max.x - dw.min.x + 1, h = dw.max.y - dw.min.y + 1;
    const char *names[3] = {"R", "G", "B"};
    FrameBuffer fb;
    char *origin = reinterpret_cast<char *>(out) -
                   (static_cast<ptrdiff_t>(dw.min.y) * w + dw.min.x) * 3 *
                       sizeof(float);
    for (int c = 0; c < 3; ++c)
      fb.insert(names[c], Slice(FLOAT, origin + c * sizeof(float),
                                3 * sizeof(float), 3 * sizeof(float) * w));
    in.setFrameBuffer(fb);
    in.readPixels(dw.min.y, dw.max.y);
    return 0;
  } catch (...) {
    return 1;
  }
}

int oracle_part_count(const char *path) {
  try {
    MultiPartInputFile in(path);
    return in.parts();
  } catch (...) {
    return -1;
  }
}

int oracle_read_part(const char *path, int part, float *out) {
  try {
    MultiPartInputFile in(path);
    InputPart ip(in, part);
    Box2i dw = ip.header().dataWindow();
    int w = dw.max.x - dw.min.x + 1;
    const char *names[3] = {"R", "G", "B"};
    FrameBuffer fb;
    char *origin = reinterpret_cast<char *>(out) -
                   (static_cast<ptrdiff_t>(dw.min.y) * w + dw.min.x) * 3 *
                       sizeof(float);
    for (int c = 0; c < 3; ++c)
      fb.insert(names[c], Slice(FLOAT, origin + c * sizeof(float),
                                3 * sizeof(float), 3 * sizeof(float) * w));
    ip.setFrameBuffer(fb);
    ip.readPixels(dw.min.y, dw.max.y);
    return 0;
  } catch (...) {
    return 1;
  }
}

}  // extern "C"
