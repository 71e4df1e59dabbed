// Native JPEG decode + CLIP/BLIP resize for the preprocessing pipeline.
//
// Replaces the per-image PIL path in clipcap_tpu/tools/preprocess.py (the
// rebuild of the reference's create_dataset.py host loop,
// /root/reference/README.md:5-22) with one C call per image:
//
//   JPEG bytes -> libjpeg-turbo decode (optional DCT-domain prescale)
//              -> PIL-style convolution resample (cubic, a = -0.5,
//                 support scaled for downscale = antialias)
//              -> fused center crop (only cropped output pixels computed)
//              -> [3, S, S] float32 in 0..1 (normalize stays on device)
//
// Geometry matches clipcap_tpu/data/preprocessing.py exactly:
//   clip mode: scale = S / min(w, h) on the ORIGINAL dims,
//              new = round(dim * scale), crop offset = (new - S) // 2
//   blip mode: square resize to (S, S)
// so with DCT prescale disabled the output differs from the PIL path only
// by PIL's 8-bit fixed-point resampling coefficients (bounded by the
// parity test). With prescale enabled the IDCT itself downscales (M/8
// steps, libjpeg-turbo) before resampling — cheaper, slightly different
// pixels, the standard trade every native ingest pipeline (DALI etc.)
// makes.
//
// C ABI (ctypes-friendly, see clipcap_tpu/data/native_jpeg.py):
//   clip_jpeg_decode(data, len, image_size, mode, use_dct_scale, out)
//   clip_jpeg_decode_batch(...same per-image, n, n_threads, status[])
// Returns 0 on success; negative codes on failure (caller falls back to
// PIL for exotic color spaces, truncated files, ...).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int kErrBadArgs = -1;
constexpr int kErrDecode = -2;      // libjpeg error (corrupt, truncated, ...)
constexpr int kErrColorSpace = -3;  // not convertible to RGB here (e.g. CMYK)

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->jump, 1);
}

void silence_output(j_common_ptr) {}

// Pillow's cubic filter (a = -0.5, support 2.0) — ImagingResample's
// bicubic kernel, reimplemented in float.
inline float cubic_filter(float x) {
  constexpr float a = -0.5f;
  x = std::fabs(x);
  if (x < 1.0f) return ((a + 2.0f) * x - (a + 3.0f)) * x * x + 1.0f;
  if (x < 2.0f) return (((x - 5.0f) * x + 8.0f) * x - 4.0f) * a;
  return 0.0f;
}

struct ResampleAxis {
  // Per-output-pixel convolution windows over the input axis, PIL-style:
  // support is scaled by the downscale ratio (antialiasing) and weights
  // are normalized to sum 1.
  std::vector<int> xmin;            // first input index of each window
  std::vector<int> count;           // window length
  std::vector<std::vector<float>> weights;
};

// Windows for output pixels [out_lo, out_hi) of a virtual full resize
// in_size -> out_size (the crop is fused by only materializing that range).
ResampleAxis build_axis(int in_size, int out_size, int out_lo, int out_hi) {
  ResampleAxis ax;
  const double scale = static_cast<double>(in_size) / out_size;
  const double filterscale = std::max(scale, 1.0);
  const double support = 2.0 * filterscale;
  const int n = out_hi - out_lo;
  ax.xmin.resize(n);
  ax.count.resize(n);
  ax.weights.resize(n);
  for (int i = 0; i < n; ++i) {
    const double center = (out_lo + i + 0.5) * scale;
    int lo = static_cast<int>(std::floor(center - support));
    lo = std::max(lo, 0);
    int hi = static_cast<int>(std::ceil(center + support));
    hi = std::min(hi, in_size);
    const int cnt = std::max(hi - lo, 1);
    std::vector<float> w(cnt);
    float total = 0.0f;
    for (int k = 0; k < cnt; ++k) {
      w[k] = cubic_filter(
          static_cast<float>((lo + k - center + 0.5) / filterscale));
      total += w[k];
    }
    if (total != 0.0f)
      for (float& v : w) v /= total;
    ax.xmin[i] = lo;
    ax.count[i] = cnt;
    ax.weights[i] = std::move(w);
  }
  return ax;
}

int decode_one(const unsigned char* data, size_t len, int image_size,
               int mode, int use_dct_scale, float* out) {
  if (data == nullptr || len == 0 || image_size <= 0 || out == nullptr ||
      (mode != 0 && mode != 1))
    return kErrBadArgs;

  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  jerr.pub.output_message = silence_output;
  std::vector<uint8_t> pixels;  // declared before setjmp (longjmp safety)
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return kErrDecode;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(data),
               static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);

  if (cinfo.jpeg_color_space == JCS_CMYK ||
      cinfo.jpeg_color_space == JCS_YCCK) {
    jpeg_destroy_decompress(&cinfo);
    return kErrColorSpace;  // PIL fallback handles these
  }
  cinfo.out_color_space = JCS_RGB;

  // Geometry from the ORIGINAL dims (exact clip_preprocess parity).
  const int w0 = static_cast<int>(cinfo.image_width);
  const int h0 = static_cast<int>(cinfo.image_height);
  if (w0 <= 0 || h0 <= 0) {
    jpeg_destroy_decompress(&cinfo);
    return kErrDecode;
  }
  int new_w, new_h, left, top;
  if (mode == 0) {  // clip: short side -> S, center crop S
    const double scale = static_cast<double>(image_size) / std::min(w0, h0);
    new_w = static_cast<int>(std::lround(w0 * scale));
    new_h = static_cast<int>(std::lround(h0 * scale));
    left = (new_w - image_size) / 2;
    top = (new_h - image_size) / 2;
  } else {  // blip: square resize
    new_w = new_h = image_size;
    left = top = 0;
  }

  if (use_dct_scale) {
    // Largest DCT downscale (M/8, libjpeg-turbo) that keeps the decoded
    // image at least as large as the resample target on both axes.
    unsigned num = 8;
    for (unsigned m = 1; m < 8; ++m) {
      const long sw = (static_cast<long>(w0) * m + 7) / 8;
      const long sh = (static_cast<long>(h0) * m + 7) / 8;
      if (sw >= new_w && sh >= new_h) {
        num = m;
        break;
      }
    }
    cinfo.scale_num = num;
    cinfo.scale_denom = 8;
  }

  jpeg_start_decompress(&cinfo);
  const int dw = static_cast<int>(cinfo.output_width);
  const int dh = static_cast<int>(cinfo.output_height);
  const int ch = static_cast<int>(cinfo.output_components);
  if (ch != 3) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return kErrColorSpace;
  }
  pixels.resize(static_cast<size_t>(dw) * dh * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = pixels.data() + static_cast<size_t>(cinfo.output_scanline) * dw * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  // libjpeg treats premature EOF as a warning and gray-fills the missing
  // scanlines; PIL raises on truncated files. Match PIL: any corrupt-data
  // warning fails the native decode (the caller's PIL fallback then skips
  // the sample, same as the reference's None-on-error datasets).
  const long warnings = cinfo.err->num_warnings;
  jpeg_destroy_decompress(&cinfo);
  if (warnings > 0) return kErrDecode;

  const int S = image_size;
  if (dw == new_w && dh == new_h && new_w == S && new_h == S) {
    // Decoded exactly at target (DCT scale hit S, or source was SxS):
    // no resample pass — straight uint8 -> CHW float.
    for (int c = 0; c < 3; ++c)
      for (int y = 0; y < S; ++y) {
        const uint8_t* src = pixels.data() + (static_cast<size_t>(y) * S) * 3 + c;
        float* dst = out + (static_cast<size_t>(c) * S + y) * S;
        for (int x = 0; x < S; ++x) dst[x] = src[x * 3] * (1.0f / 255.0f);
      }
    return 0;
  }

  // Horizontal pass (only the cropped output columns), then vertical
  // (only the cropped rows) — the crop never materializes.
  const ResampleAxis ax = build_axis(dw, new_w, left, left + S);
  const ResampleAxis ay = build_axis(dh, new_h, top, top + S);

  std::vector<float> mid(static_cast<size_t>(dh) * S * 3);
  for (int y = 0; y < dh; ++y) {
    const uint8_t* src = pixels.data() + static_cast<size_t>(y) * dw * 3;
    float* dst = mid.data() + static_cast<size_t>(y) * S * 3;
    for (int x = 0; x < S; ++x) {
      const int lo = ax.xmin[x], cnt = ax.count[x];
      const float* w = ax.weights[x].data();
      float r = 0.0f, g = 0.0f, b = 0.0f;
      const uint8_t* p = src + lo * 3;
      for (int k = 0; k < cnt; ++k) {
        r += w[k] * p[0];
        g += w[k] * p[1];
        b += w[k] * p[2];
        p += 3;
      }
      dst[x * 3 + 0] = r;
      dst[x * 3 + 1] = g;
      dst[x * 3 + 2] = b;
    }
  }
  for (int y = 0; y < S; ++y) {
    const int lo = ay.xmin[y], cnt = ay.count[y];
    const float* w = ay.weights[y].data();
    float* dr = out + (0 * static_cast<size_t>(S) + y) * S;
    float* dg = out + (1 * static_cast<size_t>(S) + y) * S;
    float* db = out + (2 * static_cast<size_t>(S) + y) * S;
    for (int x = 0; x < S; ++x) {
      float r = 0.0f, g = 0.0f, b = 0.0f;
      const float* p = mid.data() + (static_cast<size_t>(lo) * S + x) * 3;
      for (int k = 0; k < cnt; ++k) {
        r += w[k] * p[0];
        g += w[k] * p[1];
        b += w[k] * p[2];
        p += static_cast<size_t>(S) * 3;
      }
      // PIL clamps each resample pass to uint8; we clamp once to [0, 255]
      // in float (keeps full precision between passes).
      dr[x] = std::clamp(r, 0.0f, 255.0f) * (1.0f / 255.0f);
      dg[x] = std::clamp(g, 0.0f, 255.0f) * (1.0f / 255.0f);
      db[x] = std::clamp(b, 0.0f, 255.0f) * (1.0f / 255.0f);
    }
  }
  return 0;
}

int decode_one_u8(const unsigned char* data, size_t len, int image_size,
                  int mode, int use_dct_scale, uint8_t* out) {
  // uint8 variant for the host->device transfer path: PIL's own resize
  // output IS uint8 (clip_preprocess divides it by 255), so rounding the
  // float resample result to uint8 loses nothing vs the PIL reference
  // while quartering the relay upload bytes.
  std::vector<float> buf(static_cast<size_t>(3) * image_size * image_size);
  const int status = decode_one(data, len, image_size, mode, use_dct_scale,
                                buf.data());
  if (status != 0) return status;
  for (size_t i = 0; i < buf.size(); ++i)
    out[i] = static_cast<uint8_t>(std::lrintf(buf[i] * 255.0f));
  return 0;
}

}  // namespace

extern "C" {

// Decode one JPEG into out[3 * image_size * image_size] (CHW, 0..1).
// mode: 0 = clip (short-side resize + center crop), 1 = blip (square).
// use_dct_scale: nonzero enables the M/8 IDCT prescale fast path.
int clip_jpeg_decode(const unsigned char* data, size_t len, int image_size,
                     int mode, int use_dct_scale, float* out) {
  return decode_one(data, len, image_size, mode, use_dct_scale, out);
}

// As clip_jpeg_decode but writing CHW uint8 (round-to-nearest of the
// float result; exact vs PIL whose resize output is itself uint8).
int clip_jpeg_decode_u8(const unsigned char* data, size_t len, int image_size,
                        int mode, int use_dct_scale, unsigned char* out) {
  return decode_one_u8(data, len, image_size, mode, use_dct_scale, out);
}

// Batched, optionally threaded variant: images are concatenated in
// `data` with per-image offsets/lengths; per-image return codes land in
// `status`. Returns the number of successful decodes.
int clip_jpeg_decode_batch(const unsigned char* data, const size_t* offsets,
                           const size_t* lens, int n, int image_size,
                           int mode, int use_dct_scale, int n_threads,
                           float* out, int* status) {
  if (n <= 0 || data == nullptr || offsets == nullptr || lens == nullptr ||
      out == nullptr || status == nullptr)
    return 0;
  const size_t per = static_cast<size_t>(3) * image_size * image_size;
  std::atomic<int> next{0};
  std::atomic<int> ok{0};
  auto worker = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) return;
      status[i] = decode_one(data + offsets[i], lens[i], image_size, mode,
                             use_dct_scale, out + per * i);
      if (status[i] == 0) ok.fetch_add(1);
    }
  };
  const int t = std::clamp(n_threads, 1, n);
  if (t == 1) {
    worker();
  } else {
    std::vector<std::thread> threads;
    threads.reserve(t);
    for (int i = 0; i < t; ++i) threads.emplace_back(worker);
    for (auto& th : threads) th.join();
  }
  return ok.load();
}

// Batched uint8 variant (same contract as clip_jpeg_decode_batch).
int clip_jpeg_decode_batch_u8(const unsigned char* data,
                              const size_t* offsets, const size_t* lens,
                              int n, int image_size, int mode,
                              int use_dct_scale, int n_threads,
                              unsigned char* out, int* status) {
  if (n <= 0 || data == nullptr || offsets == nullptr || lens == nullptr ||
      out == nullptr || status == nullptr)
    return 0;
  const size_t per = static_cast<size_t>(3) * image_size * image_size;
  std::atomic<int> next{0};
  std::atomic<int> ok{0};
  auto worker = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) return;
      status[i] = decode_one_u8(data + offsets[i], lens[i], image_size, mode,
                                use_dct_scale, out + per * i);
      if (status[i] == 0) ok.fetch_add(1);
    }
  };
  const int t = std::clamp(n_threads, 1, n);
  if (t == 1) {
    worker();
  } else {
    std::vector<std::thread> threads;
    threads.reserve(t);
    for (int i = 0; i < t; ++i) threads.emplace_back(worker);
    for (auto& th : threads) th.join();
  }
  return ok.load();
}

}  // extern "C"
