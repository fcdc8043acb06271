// Threaded RGB-D frame decoding (libjpeg + libpng), C ABI for ctypes.
//
// The host-side data pipeline feeding the TPU: decodes a batch of
// (JPEG rgb, 16-bit PNG depth) frame pairs in parallel worker threads into
// caller-provided float32 buffers, applying the dataset depth scale.  This
// is the native data-loader counterpart of the reference's C++ runtime
// layer, shaped for the actual bottleneck on a TPU host (image decode is
// GIL-bound and slow in pure Python).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>
#include <png.h>

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

bool decode_jpeg_rgb(const char* path, float* out, int height, int width) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  if ((int)cinfo.output_height != height ||
      (int)cinfo.output_width != width || cinfo.output_components != 3) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return false;
  }
  std::vector<unsigned char> row(width * 3);
  unsigned char* rp = row.data();
  const float inv = 1.0f / 255.0f;
  const int plane = height * width;
  while ((int)cinfo.output_scanline < height) {
    int y = cinfo.output_scanline;
    jpeg_read_scanlines(&cinfo, &rp, 1);
    // planar CHW float output (matches the renderer's (3, H, W) layout)
    for (int x = 0; x < width; ++x) {
      out[0 * plane + y * width + x] = row[3 * x + 0] * inv;
      out[1 * plane + y * width + x] = row[3 * x + 1] * inv;
      out[2 * plane + y * width + x] = row[3 * x + 2] * inv;
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  return true;
}

bool decode_png_depth(const char* path, float* out, int height, int width,
                      float inv_scale) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(f);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  int w = png_get_image_width(png, info);
  int h = png_get_image_height(png, info);
  int depth = png_get_bit_depth(png, info);
  int color = png_get_color_type(png, info);
  if (w != width || h != height || color != PNG_COLOR_TYPE_GRAY) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(f);
    return false;
  }
  std::vector<unsigned char> row(width * (depth == 16 ? 2 : 1));
  for (int y = 0; y < height; ++y) {
    png_read_row(png, row.data(), nullptr);
    if (depth == 16) {
      for (int x = 0; x < width; ++x) {
        uint16_t v = (uint16_t(row[2 * x]) << 8) | row[2 * x + 1];  // PNG is BE
        out[y * width + x] = v * inv_scale;
      }
    } else {
      for (int x = 0; x < width; ++x) out[y * width + x] = row[x] * inv_scale;
    }
  }
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(f);
  return true;
}

}  // namespace

extern "C" {

// Decode `n` frame pairs with `n_threads` workers.
// rgb_paths/depth_paths: arrays of n C strings.
// rgb_out: [n, 3, H, W] float32; depth_out: [n, H, W] float32.
// Returns number of successfully decoded pairs.
int decode_rgbd_batch(const char** rgb_paths, const char** depth_paths,
                      int n, int height, int width, float depth_scale,
                      float* rgb_out, float* depth_out, int n_threads) {
  std::atomic<int> next(0), ok(0);
  const float inv = 1.0f / depth_scale;
  const size_t rgb_stride = (size_t)3 * height * width;
  const size_t d_stride = (size_t)height * width;
  auto work = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      bool good = true;
      if (rgb_paths && rgb_paths[i])
        good &= decode_jpeg_rgb(rgb_paths[i], rgb_out + rgb_stride * i,
                                height, width);
      if (depth_paths && depth_paths[i])
        good &= decode_png_depth(depth_paths[i], depth_out + d_stride * i,
                                 height, width, inv);
      if (good) ok.fetch_add(1);
    }
  };
  if (n_threads < 1) n_threads = 1;
  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(work);
  for (auto& t : threads) t.join();
  return ok.load();
}

}  // extern "C"
