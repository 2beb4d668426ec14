// Fast PNG encode for the serving path.
//
// The reference project has no native code at all (SURVEY.md §2: pure
// Python) and no serving path; this exists because on a single-core TPU-VM
// host, PIL's PNG encoder (adaptive row filtering + zlib) costs more wall
// time per response than the jitted SR forward itself. Encoding with
// filter=NONE + a caller-chosen zlib level, called through ctypes (which
// releases the GIL), moves the encode off the Python hot path entirely.
//
// Build: g++ -O3 -shared -fPIC fast_png.cpp -lpng -lz -o libfastpng.so
// (see native/__init__.py, which builds on first import when needed).

#include <png.h>
#include <zlib.h>

#include <csetjmp>
#include <cstring>

namespace {

struct MemBuf {
  unsigned char* data;
  long cap;
  long len;
  bool overflow;
};

void write_cb(png_structp png, png_bytep chunk, png_size_t n) {
  MemBuf* buf = static_cast<MemBuf*>(png_get_io_ptr(png));
  if (buf->len + static_cast<long>(n) > buf->cap) {
    buf->overflow = true;
    return;  // keep libpng happy; caller sees overflow flag
  }
  std::memcpy(buf->data + buf->len, chunk, n);
  buf->len += static_cast<long>(n);
}

void flush_cb(png_structp) {}

}  // namespace

extern "C" {

// Encode HxW RGB8 (tightly packed, stride = 3*w) into `out`.
// Returns bytes written, or -1 on error / insufficient out_cap.
// level: zlib 0..9 (1 = fastest compression, 0 = store).
// filters: libpng PNG_FILTER_* mask; 0 = PNG_FILTER_SUB (measured best
// time/size balance on photographic SR outputs: adaptive all-filter search
// costs ~20% more time for ~8% smaller files, NONE is ~2% faster but ~10%
// larger).
long fastpng_encode_rgb8(const unsigned char* rgb, int w, int h, int level,
                         int filters, unsigned char* out, long out_cap) {
  if (!rgb || !out || w <= 0 || h <= 0) return -1;

  png_structp png =
      png_create_write_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return -1;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_write_struct(&png, nullptr);
    return -1;
  }

  MemBuf buf{out, out_cap, 0, false};

  if (setjmp(png_jmpbuf(png))) {  // libpng error path
    png_destroy_write_struct(&png, &info);
    return -1;
  }

  png_set_write_fn(png, &buf, write_cb, flush_cb);
  png_set_IHDR(png, info, w, h, 8, PNG_COLOR_TYPE_RGB, PNG_INTERLACE_NONE,
               PNG_COMPRESSION_TYPE_DEFAULT, PNG_FILTER_TYPE_DEFAULT);
  // The speed levers: one fixed filter (no per-row search), chosen level.
  png_set_filter(png, 0, filters ? filters : PNG_FILTER_SUB);
  png_set_compression_level(png, level < 0 ? 1 : (level > 9 ? 9 : level));
  png_set_compression_strategy(png, Z_DEFAULT_STRATEGY);
  png_write_info(png, info);

  for (int y = 0; y < h; ++y) {
    png_write_row(png, const_cast<png_bytep>(rgb + static_cast<long>(y) * w * 3));
  }
  png_write_end(png, info);
  png_destroy_write_struct(&png, &info);

  if (buf.overflow) return -1;
  return buf.len;
}

}  // extern "C"
