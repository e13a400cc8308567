// rcot-tpu native data loader: threaded PNG/JPEG decode + patch crop.
//
// The reference loads/crops every sample in Python DataLoader workers
// (reference: trainer.py:134-135, util/dataset_utils.py:215-262). This is
// the native-tier equivalent for the TPU build: libpng/libjpeg decode and
// uint8 patch extraction run on a C++ thread pool with no GIL involvement,
// so the host side of the input pipeline keeps up with multi-chip training.
//
// C ABI (ctypes-friendly), wrapped by rcot_tpu/data/native.py:
//   rcot_image_size(path, &h, &w)            peek dimensions
//   rcot_decode_rgb(path, out, h, w)         full RGB8 decode
//   rcot_load_patches(paths, n, ys, xs, ps, nthreads, out)
//       decode n images and copy ps*ps RGB patches at (ys[i], xs[i])
//       into out[n*ps*ps*3]; returns 0 on success, else 1-based index of
//       the first failing file.
//
// Build: native/build.sh (g++ -O2 -shared -fPIC, links libpng + libjpeg).

#include <cctype>
#include <csetjmp>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <atomic>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

struct Image {
  int h = 0, w = 0;
  std::vector<unsigned char> rgb;  // h*w*3
};

bool has_suffix(const char* path, const char* a, const char* b) {
  std::string s(path);
  // unsigned char cast: std::tolower on a negative char (non-ASCII UTF-8
  // byte on signed-char platforms) is undefined behavior
  for (auto& c : s)
    c = static_cast<char>(std::tolower(static_cast<unsigned char>(c)));
  auto ends = [&](const char* suf) {
    size_t n = strlen(suf);
    return s.size() >= n && s.compare(s.size() - n, n, suf) == 0;
  };
  return ends(a) || (b && ends(b));
}

// ------------------------------------------------------------------- PNG

bool decode_png(const char* path, Image* im, bool header_only) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  // Declared BEFORE setjmp: libpng reports errors by longjmp'ing back to
  // png_jmpbuf, and jumping over a live non-trivially-destructible local
  // is undefined behavior (in practice the row-pointer vector leaked on
  // every corrupt PNG). Constructed here, it is destroyed on every exit.
  std::vector<png_bytep> rows;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  png_infop info = png ? png_create_info_struct(png) : nullptr;
  if (!info || setjmp(png_jmpbuf(png))) {
    if (png) png_destroy_read_struct(&png, info ? &info : nullptr, nullptr);
    fclose(f);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  im->h = png_get_image_height(png, info);
  im->w = png_get_image_width(png, info);
  if (header_only) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return true;
  }
  // normalize anything to 8-bit RGB
  png_byte color = png_get_color_type(png, info);
  png_byte depth = png_get_bit_depth(png, info);
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (color & PNG_COLOR_MASK_ALPHA || png_get_valid(png, info, PNG_INFO_tRNS))
    png_set_strip_alpha(png);
  png_read_update_info(png, info);

  im->rgb.resize(size_t(im->h) * im->w * 3);
  rows.resize(im->h);
  size_t stride = png_get_rowbytes(png, info);
  if (stride != size_t(im->w) * 3) {  // unexpected layout after transforms
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return false;
  }
  for (int y = 0; y < im->h; ++y) rows[y] = im->rgb.data() + size_t(y) * stride;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(f);
  return true;
}

// ------------------------------------------------------------------ JPEG

struct JpegErr {
  jpeg_error_mgr pub;
  jmp_buf jmp;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jmp, 1);
}

bool decode_jpeg(const char* path, Image* im, bool header_only) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jmp)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  im->h = cinfo.image_height;
  im->w = cinfo.image_width;
  if (header_only) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return true;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  im->rgb.resize(size_t(im->h) * im->w * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row =
        im->rgb.data() + size_t(cinfo.output_scanline) * im->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

bool decode(const char* path, Image* im, bool header_only) {
  if (has_suffix(path, ".png", nullptr)) return decode_png(path, im, header_only);
  if (has_suffix(path, ".jpg", ".jpeg")) return decode_jpeg(path, im, header_only);
  // try PNG then JPEG
  if (decode_png(path, im, header_only)) return true;
  return decode_jpeg(path, im, header_only);
}

}  // namespace

extern "C" {

int rcot_image_size(const char* path, int* h, int* w) {
  Image im;
  if (!decode(path, &im, /*header_only=*/true)) return 1;
  *h = im.h;
  *w = im.w;
  return 0;
}

int rcot_decode_rgb(const char* path, unsigned char* out, int h, int w) {
  Image im;
  if (!decode(path, &im, false)) return 1;
  if (im.h != h || im.w != w) return 2;
  memcpy(out, im.rgb.data(), size_t(h) * w * 3);
  return 0;
}

int rcot_load_patches(const char** paths, int n, const int* ys, const int* xs,
                      int ps, int nthreads, unsigned char* out) {
  if (nthreads < 1) nthreads = 1;
  std::atomic<int> next(0);
  std::atomic<int> failed(0);

  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n || failed.load()) return;
      Image im;
      if (!decode(paths[i], &im, false)) {
        int expect = 0;
        failed.compare_exchange_strong(expect, i + 1);
        return;
      }
      int y = ys[i], x = xs[i];
      if (y < 0 || x < 0 || y + ps > im.h || x + ps > im.w) {
        int expect = 0;
        failed.compare_exchange_strong(expect, i + 1);
        return;
      }
      unsigned char* dst = out + size_t(i) * ps * ps * 3;
      for (int r = 0; r < ps; ++r) {
        memcpy(dst + size_t(r) * ps * 3,
               im.rgb.data() + (size_t(y + r) * im.w + x) * 3, size_t(ps) * 3);
      }
    }
  };

  std::vector<std::thread> threads;
  int nt = std::min(nthreads, n);
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failed.load();
}

}  // extern "C"
