// Native JPEG frame decoder for the training feeder / deploy reader.
//
// The feeder's video hot path decodes one 224x448 jpg per 0.1 s chunk
// (data/readers.py VideoFrameReader, parity with reference feeder.py:106-132).
// PIL holds the GIL per frame, so on a many-core host the feeder cannot
// scale past ~1 core of decode. This decoder wraps libjpeg(-turbo) behind a
// batch call: one ctypes invocation (GIL released) decodes a whole chunk's
// frames and applies the horizontal equirect roll augmentation during the
// row copy, so Python never touches pixel bytes.
//
// API (ctypes, see utils/native.py):
//   sag_jpeg_probe(path, &h, &w, &c)            -> 0 on success
//   sag_jpeg_decode_batch(paths, n, h, w, c, roll, out) -> #frames decoded
// `paths` is n null-terminated strings back to back; `out` is (n, h, w, c)
// uint8; `roll` is the np.roll(axis=width) shift in pixels.

#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

#include <jpeglib.h>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void ErrorExit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->jump, 1);
}

void SilentOutput(j_common_ptr) {}

// Decode one file. When out != nullptr it must hold h*w*c bytes and the
// image dims must match (h, w, c); rows are written with a cyclic width
// shift of `roll` pixels (out column (x + roll) mod w <- source column x,
// matching np.roll semantics). Returns 0 on success.
int DecodeOne(const char* path, int* h, int* w, int* c, int roll,
              uint8_t* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;

  jpeg_decompress_struct cinfo;
  ErrorMgr err;
  cinfo.err = jpeg_std_error(&err.pub);
  err.pub.error_exit = ErrorExit;
  err.pub.output_message = SilentOutput;
  std::vector<uint8_t> row;
  if (setjmp(err.jump)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return -2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);

  const int want_c = out ? *c : 0;
  if (!out || want_c == 3) {
    cinfo.out_color_space = JCS_RGB;  // grayscale sources are expanded
  } else if (want_c == 1) {
    cinfo.out_color_space = JCS_GRAYSCALE;
  } else {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return -3;
  }
  jpeg_start_decompress(&cinfo);

  const int height = cinfo.output_height;
  const int width = cinfo.output_width;
  const int comps = cinfo.output_components;
  if (!out) {
    *h = height;
    *w = width;
    *c = comps;
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return 0;
  }
  if (height != *h || width != *w || comps != *c) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return -4;
  }

  const int stride = width * comps;
  int shift = roll % width;
  if (shift < 0) shift += width;
  row.resize(stride);
  uint8_t* row_ptr = row.data();
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* dst = out + static_cast<size_t>(cinfo.output_scanline) * stride;
    if (shift == 0) {
      JSAMPROW rows[1] = {dst};
      jpeg_read_scanlines(&cinfo, rows, 1);
    } else {
      JSAMPROW rows[1] = {row_ptr};
      jpeg_read_scanlines(&cinfo, rows, 1);
      const int tail = (width - shift) * comps;  // bytes moved to the right
      memcpy(dst + static_cast<size_t>(shift) * comps, row_ptr, tail);
      memcpy(dst, row_ptr + tail, static_cast<size_t>(shift) * comps);
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return 0;
}

// Decode one 4:2:0 jpg's raw coefficient planes into I420 layout (no color
// conversion, no chroma upsampling): out holds Y (h*w) then U (h/2*w/2)
// then V. Ships HALF the bytes of RGB888 over the host->device link; the
// deploy graph upsamples + converts on device (deploy/deploy.py). Returns
// 0 on success, <0 when the file is not a 2x2-subsampled YCbCr jpg or the
// dims are not multiples of 16 (the iMCU granularity) — callers fall back
// to the RGB path.
int DecodeOneYuv420(const char* path, int h, int w, uint8_t* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;

  jpeg_decompress_struct cinfo;
  ErrorMgr err;
  cinfo.err = jpeg_std_error(&err.pub);
  err.pub.error_exit = ErrorExit;
  err.pub.output_message = SilentOutput;
  if (setjmp(err.jump)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return -2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);

  const bool is_420 =
      cinfo.num_components == 3 && cinfo.jpeg_color_space == JCS_YCbCr &&
      cinfo.comp_info[0].h_samp_factor == 2 &&
      cinfo.comp_info[0].v_samp_factor == 2 &&
      cinfo.comp_info[1].h_samp_factor == 1 &&
      cinfo.comp_info[1].v_samp_factor == 1 &&
      cinfo.comp_info[2].h_samp_factor == 1 &&
      cinfo.comp_info[2].v_samp_factor == 1;
  if (!is_420 || static_cast<int>(cinfo.image_height) != h ||
      static_cast<int>(cinfo.image_width) != w || h % 16 || w % 16) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return -5;
  }

  cinfo.raw_data_out = TRUE;
  jpeg_start_decompress(&cinfo);

  uint8_t* yplane = out;
  uint8_t* uplane = out + static_cast<size_t>(h) * w;
  uint8_t* vplane = uplane + static_cast<size_t>(h / 2) * (w / 2);
  JSAMPROW yrows[16], urows[8], vrows[8];
  JSAMPARRAY planes[3] = {yrows, urows, vrows};
  while (cinfo.output_scanline < cinfo.output_height) {
    const int base = cinfo.output_scanline;
    for (int i = 0; i < 16; ++i)
      yrows[i] = yplane + static_cast<size_t>(base + i) * w;
    for (int i = 0; i < 8; ++i) {
      urows[i] = uplane + static_cast<size_t>(base / 2 + i) * (w / 2);
      vrows[i] = vplane + static_cast<size_t>(base / 2 + i) * (w / 2);
    }
    if (jpeg_read_raw_data(&cinfo, planes, 16) == 0) {
      jpeg_abort_decompress(&cinfo);
      jpeg_destroy_decompress(&cinfo);
      fclose(f);
      return -6;
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return 0;
}

}  // namespace

extern "C" {

// Batch raw-YUV decode: `out` is (n, h*3/2, w) uint8 in per-frame I420
// layout (Y plane, then the U plane packed into h/4 rows of width w, then
// V). Returns the number of frames decoded; a short count means frame i
// failed (caller falls back to RGB).
int sag_jpeg_decode_batch_yuv420(const char* paths, int n, int h, int w,
                                 uint8_t* out) {
  const char* p = paths;
  const size_t frame_bytes = static_cast<size_t>(h) * w * 3 / 2;
  for (int i = 0; i < n; ++i) {
    if (DecodeOneYuv420(p, h, w, out + i * frame_bytes) != 0) {
      return i;
    }
    p += strlen(p) + 1;
  }
  return n;
}

int sag_jpeg_probe(const char* path, int* h, int* w, int* c) {
  return DecodeOne(path, h, w, c, 0, nullptr);
}

int sag_jpeg_decode_batch(const char* paths, int n, int h, int w, int c,
                          int roll, uint8_t* out) {
  const char* p = paths;
  const size_t frame_bytes = static_cast<size_t>(h) * w * c;
  for (int i = 0; i < n; ++i) {
    int hh = h, ww = w, cc = c;
    if (DecodeOne(p, &hh, &ww, &cc, roll, out + i * frame_bytes) != 0) {
      return i;
    }
    p += strlen(p) + 1;
  }
  return n;
}

}  // extern "C"
