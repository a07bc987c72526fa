// Native data loader: JPEG decode + NEAREST letterbox + RGB->BGR, batched.
//
// The reference's input pipeline is tf.data's C++ runtime
// (dataset/file_util.py rides on it); our Python/PIL fallback decodes
// ~100-200 images/s on the single host core, which would starve a TPU
// training step running at ~1800 img/s.  This loader uses libjpeg(-turbo)
// directly, fuses the letterbox resample into the decode output pass, and
// releases the Python GIL (ctypes does) so it overlaps with the train loop.
//
// Geometry matches data/loader.py exactly:
//   ratio = min(dst_h/src_h, dst_w/src_w); resized = floor(src * ratio);
//   centred with floor-divided padding; NEAREST with PIL's center
//   convention: src_idx = floor((dst_idx + 0.5) * src/resized_dst).
//
// Build: make -C native      (produces libyolo_loader.so)
// Python binding: yolov3_tensorflow_tpu/data/native_loader.py (ctypes).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <csetjmp>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// corrupt-data warnings surface through num_warnings -> status 4; the
// default handler would also spam stderr once per repeat-epoch pass
void silent_output(j_common_ptr) {}

// Decode one JPEG file and letterbox it into out (dst_h*dst_w*3, BGR).
// Returns 0 on success; fills src dims.  `src` is caller-owned scratch:
// an automatic object modified between setjmp and longjmp has an
// indeterminate value after the jump (C11 7.13.2.1), so the buffer must
// NOT live in this frame — resize() happens after setjmp, and a corrupt
// image's longjmp would then run the destructor on a formally
// indeterminate vector.  Owning it in the caller (whose frame never
// longjmps) removes the UB and reuses the allocation across a worker's
// whole batch slice.
int decode_one(const char* path, int dst_h, int dst_w, unsigned char* out,
               int* src_h_out, int* src_w_out,
               std::vector<unsigned char>& src) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return 1;

  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  jerr.pub.output_message = silent_output;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return 2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  const int sw = cinfo.output_width;
  const int sh = cinfo.output_height;
  *src_h_out = sh;
  *src_w_out = sw;

  try {
    src.resize(static_cast<size_t>(sw) * sh * 3);
  } catch (const std::exception&) {
    // bad_alloc from a huge-dimension header (65500x65500 is legal per
    // the JPEG spec, ~12.8 GB decoded): an exception escaping the
    // worker thread would std::terminate the whole process — report a
    // per-image status instead (Python falls back to PIL, which
    // raises its own DecompressionBomb/size errors)
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return 3;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row = src.data() + static_cast<size_t>(
        cinfo.output_scanline) * sw * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  // libjpeg reports a truncated stream (premature EOF) as a WARNING
  // and fake-EOI-pads the remaining rows rather than calling
  // error_exit; PIL raises on the same file.  Surface any
  // corrupt-data warning as a failure so the per-image PIL fallback
  // (data/loader.py) decides, keeping the two paths' accept/reject
  // behavior aligned instead of silently training on garbage rows.
  const long warnings = jerr.pub.num_warnings;
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  if (warnings > 0) return 4;

  // letterbox geometry (data/loader.py letterbox_geometry)
  const double ratio = std::min(static_cast<double>(dst_h) / sh,
                                static_cast<double>(dst_w) / sw);
  // clamp to >=1: an extreme-aspect image (e.g. 4000x8 into 416x416)
  // floors one resized axis to 0 — without the clamp this path emits
  // an all-black image while the PIL path divides by zero (both
  // clamp identically now; see data/loader.py letterbox_geometry)
  const int rh = std::max(1, static_cast<int>(sh * ratio));
  const int rw = std::max(1, static_cast<int>(sw * ratio));
  const int pt = (dst_h - rh) / 2;
  const int pl = (dst_w - rw) / 2;

  std::memset(out, 0, static_cast<size_t>(dst_h) * dst_w * 3);

  // NEAREST with PIL's center convention, fused RGB->BGR
  const double sy = static_cast<double>(sh) / rh;
  const double sx = static_cast<double>(sw) / rw;
  std::vector<int> xmap(rw);
  for (int j = 0; j < rw; ++j) {
    int v = static_cast<int>((j + 0.5) * sx);
    xmap[j] = std::min(v, sw - 1);
  }
  for (int i = 0; i < rh; ++i) {
    int si = std::min(static_cast<int>((i + 0.5) * sy), sh - 1);
    const unsigned char* srow =
        src.data() + static_cast<size_t>(si) * sw * 3;
    unsigned char* drow =
        out + (static_cast<size_t>(pt + i) * dst_w + pl) * 3;
    for (int j = 0; j < rw; ++j) {
      const unsigned char* p = srow + xmap[j] * 3;
      drow[j * 3 + 0] = p[2];  // B
      drow[j * 3 + 1] = p[1];  // G
      drow[j * 3 + 2] = p[0];  // R
    }
  }
  return 0;
}

}  // namespace

extern "C" {

// Decode a batch of JPEG files into a preallocated (n, dst_h, dst_w, 3)
// uint8 BGR buffer.  src_dims receives n*(h, w) pairs.  status receives a
// per-image return code (0 ok).  num_threads <= 0 uses hardware_concurrency.
void yolo_decode_letterbox_batch(const char** paths, int n, int dst_h,
                                 int dst_w, unsigned char* out,
                                 int* src_dims, int* status,
                                 int num_threads) {
  int workers = num_threads > 0
      ? num_threads
      : static_cast<int>(std::thread::hardware_concurrency());
  workers = std::max(1, std::min(workers, n));
  std::atomic<int> next(0);
  const size_t img_bytes = static_cast<size_t>(dst_h) * dst_w * 3;

  auto work = [&]() {
    std::vector<unsigned char> scratch;  // per-thread; see decode_one
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) return;
      try {
        status[i] = decode_one(paths[i], dst_h, dst_w, out + i * img_bytes,
                               &src_dims[i * 2], &src_dims[i * 2 + 1],
                               scratch);
      } catch (...) {
        // an exception escaping a std::thread calls std::terminate —
        // never let one image kill the process
        status[i] = 3;
      }
    }
  };
  if (workers == 1) {
    work();
  } else {
    std::vector<std::thread> pool;
    pool.reserve(workers);
    for (int t = 0; t < workers; ++t) pool.emplace_back(work);
    for (auto& th : pool) th.join();
  }
}

}  // extern "C"
