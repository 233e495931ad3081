// Native batched image decoder — the C++ half of the data layer.
//
// The reference's input pipeline leans on torch DataLoader worker
// processes for JPEG/PNG decode (SURVEY §2.9: torchvision ImageFolder +
// PIL in worker subprocesses). Host CPUs feeding a TPU do the same work
// in-process here: a thread pool decodes a whole batch of image files
// straight into the caller's float CHW tensor (libjpeg / libpng — the
// same codecs PIL wraps, so pixels match the PIL path bit-for-bit when
// no resize is involved).
//
// Contract: images whose native size differs from (W, H) are NOT decoded
// (ok[i] = 0) — the python caller falls back to its PIL resize path,
// keeping resize-filter parity decisions out of native code.
//
// C ABI (ctypes):
//   id_decode_batch(paths, n, out, H, W, threads, ok) -> 0
//     paths: n C strings; out: float32 [n, 3, H, W]; ok: n bytes.
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

struct JpegErr {
  jpeg_error_mgr pub;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

bool decode_jpeg(const unsigned char* data, size_t len,
                 std::vector<unsigned char>& rgb, int& w, int& h,
                 int want_w, int want_h) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  // dims are known from the header: decline resize-needed images BEFORE
  // paying the full decode (the caller re-decodes via PIL on decline)
  if (static_cast<int>(cinfo.image_width) != want_w ||
      static_cast<int>(cinfo.image_height) != want_h) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  w = static_cast<int>(cinfo.output_width);
  h = static_cast<int>(cinfo.output_height);
  rgb.resize(static_cast<size_t>(w) * h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row =
        rgb.data() + static_cast<size_t>(cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

bool decode_png_mem(const unsigned char* data, size_t len,
                    std::vector<unsigned char>& rgb, int& w, int& h,
                    int want_w, int want_h) {
  png_image image;
  std::memset(&image, 0, sizeof image);
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_memory(&image, data, len)) return false;
  image.format = PNG_FORMAT_RGB;
  w = static_cast<int>(image.width);
  h = static_cast<int>(image.height);
  if (w != want_w || h != want_h) {  // decline before the pixel decode
    png_image_free(&image);
    return false;
  }
  rgb.resize(PNG_IMAGE_SIZE(image));
  if (!png_image_finish_read(&image, nullptr, rgb.data(), 0, nullptr)) {
    png_image_free(&image);
    return false;
  }
  return true;
}

bool read_file(const char* path, std::vector<unsigned char>& buf) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long sz = std::ftell(f);
  if (sz <= 0) {
    std::fclose(f);
    return false;
  }
  std::fseek(f, 0, SEEK_SET);
  buf.resize(static_cast<size_t>(sz));
  size_t got = std::fread(buf.data(), 1, buf.size(), f);
  std::fclose(f);
  return got == buf.size();
}

// decode one file into out (float CHW /255); 1 on success, 0 on any
// failure or size mismatch (caller falls back to PIL)
int decode_one(const char* path, float* out, int64_t H, int64_t W) {
  std::vector<unsigned char> file;
  if (!read_file(path, file) || file.size() < 8) return 0;
  std::vector<unsigned char> rgb;
  int w = 0, h = 0;
  bool ok = false;
  if (file[0] == 0xFF && file[1] == 0xD8) {
    ok = decode_jpeg(file.data(), file.size(), rgb, w, h,
                     static_cast<int>(W), static_cast<int>(H));
  } else if (file[0] == 0x89 && file[1] == 'P' && file[2] == 'N' &&
             file[3] == 'G') {
    ok = decode_png_mem(file.data(), file.size(), rgb, w, h,
                        static_cast<int>(W), static_cast<int>(H));
  }
  if (!ok || w != W || h != H) return 0;

  const int64_t plane = H * W;
  for (int64_t y = 0; y < H; ++y) {
    const unsigned char* row = rgb.data() + y * W * 3;
    float* r = out + y * W;
    float* g = out + plane + y * W;
    float* b = out + 2 * plane + y * W;
    for (int64_t x = 0; x < W; ++x) {
      r[x] = row[3 * x + 0] / 255.0f;
      g[x] = row[3 * x + 1] / 255.0f;
      b[x] = row[3 * x + 2] / 255.0f;
    }
  }
  return 1;
}

}  // namespace

extern "C" {

// Decode n image files in parallel into out[n, 3, H, W] float32 (/255,
// CHW). ok[i]=1 where decoded natively; 0 where the caller must fall
// back (unreadable, unsupported codec, or size != (W, H)). Returns 0.
int id_decode_batch(const char** paths, int64_t n, float* out, int64_t H,
                    int64_t W, int threads, unsigned char* ok) {
  if (n <= 0) return 0;
  int nt = threads < 1 ? 1 : (threads > 64 ? 64 : threads);
  if (nt > n) nt = static_cast<int>(n);
  std::atomic<int64_t> next(0);
  const int64_t stride = 3 * H * W;
  auto worker = [&]() {
    for (;;) {
      int64_t i = next.fetch_add(1);
      if (i >= n) return;
      ok[i] = static_cast<unsigned char>(
          decode_one(paths[i], out + i * stride, H, W));
    }
  };
  if (nt == 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    pool.reserve(nt);
    for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
  return 0;
}

}  // extern "C"
