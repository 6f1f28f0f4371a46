// Native helpers for unclerenderer_tpu (host-side asset pipeline).
//
// The reference renderer's asset path is C++ (stb_image, ddspp,
// FTaskScheduler: Source/Render/TextureLoader.cpp, Source/Core/TaskSystem.cpp).
// This library is the TPU build's native equivalent: the serial inner loops of
// image decoding that numpy cannot vectorize (PNG scanline unfiltering, BC
// block decompression) plus a small parallel-for thread pool.
//
// Exposed with a plain C ABI and loaded from Python via ctypes
// (unclerenderer_tpu/textures/native.py).

#include <algorithm>
#include <cstdint>
#include <cstring>

extern "C" {

// ---------------------------------------------------------------------------
// PNG scanline unfiltering (RFC 2083 section 6; stb_image equivalent)
// ---------------------------------------------------------------------------

static inline int paeth(int a, int b, int c) {
  const int p = a + b - c;
  const int pa = std::abs(p - a), pb = std::abs(p - b), pc = std::abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

// in: height rows of (1 filter byte + stride bytes). out: height*stride bytes.
// bpp = bytes per pixel. Returns 0 on success.
int png_unfilter(const uint8_t* in, uint8_t* out, int64_t height, int64_t stride,
                 int64_t bpp) {
  if (height <= 0 || stride <= 0 || bpp <= 0) return 1;
  for (int64_t y = 0; y < height; ++y) {
    const uint8_t filter = in[y * (stride + 1)];
    const uint8_t* src = in + y * (stride + 1) + 1;
    uint8_t* dst = out + y * stride;
    const uint8_t* up = y > 0 ? out + (y - 1) * stride : nullptr;
    switch (filter) {
      case 0:
        std::memcpy(dst, src, stride);
        break;
      case 1:  // Sub
        std::memcpy(dst, src, std::min(bpp, stride));
        for (int64_t x = bpp; x < stride; ++x) dst[x] = src[x] + dst[x - bpp];
        break;
      case 2:  // Up
        if (up) {
          for (int64_t x = 0; x < stride; ++x) dst[x] = src[x] + up[x];
        } else {
          std::memcpy(dst, src, stride);
        }
        break;
      case 3:  // Average
        for (int64_t x = 0; x < stride; ++x) {
          const int a = x >= bpp ? dst[x - bpp] : 0;
          const int b = up ? up[x] : 0;
          dst[x] = static_cast<uint8_t>(src[x] + ((a + b) >> 1));
        }
        break;
      case 4:  // Paeth
        for (int64_t x = 0; x < stride; ++x) {
          const int a = x >= bpp ? dst[x - bpp] : 0;
          const int b = up ? up[x] : 0;
          const int c = (up && x >= bpp) ? up[x - bpp] : 0;
          dst[x] = static_cast<uint8_t>(src[x] + paeth(a, b, c));
        }
        break;
      default:
        return 2;
    }
  }
  return 0;
}

// ---------------------------------------------------------------------------
// BC (S3TC / RGTC) block decompression -> RGBA8.
// Formats follow the D3D11.3 functional spec section 19. The reference decodes
// these via ddspp + the GPU's fixed function; here we decode on the host once
// at load time.
// ---------------------------------------------------------------------------

static inline void bc1_colors(uint16_t c0, uint16_t c1, uint8_t cols[4][4],
                              bool allow_punch) {
  auto expand = [](uint16_t c, uint8_t* out) {
    const int r = (c >> 11) & 31, g = (c >> 5) & 63, b = c & 31;
    out[0] = static_cast<uint8_t>((r * 255 + 15) / 31);
    out[1] = static_cast<uint8_t>((g * 255 + 31) / 63);
    out[2] = static_cast<uint8_t>((b * 255 + 15) / 31);
    out[3] = 255;
  };
  expand(c0, cols[0]);
  expand(c1, cols[1]);
  if (!allow_punch || c0 > c1) {
    for (int i = 0; i < 3; ++i) {
      cols[2][i] = static_cast<uint8_t>((2 * cols[0][i] + cols[1][i]) / 3);
      cols[3][i] = static_cast<uint8_t>((cols[0][i] + 2 * cols[1][i]) / 3);
    }
    cols[2][3] = cols[3][3] = 255;
  } else {
    for (int i = 0; i < 3; ++i) {
      cols[2][i] = static_cast<uint8_t>((cols[0][i] + cols[1][i]) / 2);
      cols[3][i] = 0;
    }
    cols[2][3] = 255;
    cols[3][3] = 0;
  }
}

static inline void bc_alpha_block(const uint8_t* block, uint8_t out[16]) {
  const int a0 = block[0], a1 = block[1];
  int pal[8];
  pal[0] = a0;
  pal[1] = a1;
  if (a0 > a1) {
    for (int i = 1; i < 7; ++i) pal[1 + i] = ((7 - i) * a0 + i * a1) / 7;
  } else {
    for (int i = 1; i < 5; ++i) pal[1 + i] = ((5 - i) * a0 + i * a1) / 5;
    pal[6] = 0;
    pal[7] = 255;
  }
  uint64_t bits = 0;
  for (int i = 0; i < 6; ++i) bits |= static_cast<uint64_t>(block[2 + i]) << (8 * i);
  for (int i = 0; i < 16; ++i) out[i] = static_cast<uint8_t>(pal[(bits >> (3 * i)) & 7]);
}

// kind: 1=BC1, 2=BC2, 3=BC3, 4=BC4(R), 5=BC5(RG). out is RGBA8 w*h.
int bc_decode(const uint8_t* in, uint8_t* out, int64_t width, int64_t height,
              int kind) {
  const int64_t bw = (width + 3) / 4, bh = (height + 3) / 4;
  const int64_t block_bytes = (kind == 1 || kind == 4) ? 8 : 16;
  for (int64_t by = 0; by < bh; ++by) {
    for (int64_t bx = 0; bx < bw; ++bx) {
      const uint8_t* block = in + (by * bw + bx) * block_bytes;
      uint8_t texels[16][4];
      if (kind == 1 || kind == 2 || kind == 3) {
        const uint8_t* cblock = block + (kind == 1 ? 0 : 8);
        const uint16_t c0 = static_cast<uint16_t>(cblock[0] | (cblock[1] << 8));
        const uint16_t c1 = static_cast<uint16_t>(cblock[2] | (cblock[3] << 8));
        uint8_t cols[4][4];
        bc1_colors(c0, c1, cols, kind == 1);
        const uint32_t idx = static_cast<uint32_t>(cblock[4]) |
                             (static_cast<uint32_t>(cblock[5]) << 8) |
                             (static_cast<uint32_t>(cblock[6]) << 16) |
                             (static_cast<uint32_t>(cblock[7]) << 24);
        for (int i = 0; i < 16; ++i) {
          const int sel = (idx >> (2 * i)) & 3;
          std::memcpy(texels[i], cols[sel], 4);
        }
        if (kind == 2) {  // explicit 4-bit alpha
          for (int i = 0; i < 16; ++i) {
            const int nib = (block[i / 2] >> ((i & 1) * 4)) & 15;
            texels[i][3] = static_cast<uint8_t>(nib * 17);
          }
        } else if (kind == 3) {  // interpolated alpha
          uint8_t alpha[16];
          bc_alpha_block(block, alpha);
          for (int i = 0; i < 16; ++i) texels[i][3] = alpha[i];
        }
      } else if (kind == 4 || kind == 5) {
        uint8_t red[16];
        bc_alpha_block(block, red);
        uint8_t green[16];
        if (kind == 5) {
          bc_alpha_block(block + 8, green);
        } else {
          std::memset(green, 0, sizeof(green));
        }
        for (int i = 0; i < 16; ++i) {
          texels[i][0] = red[i];
          texels[i][1] = kind == 5 ? green[i] : red[i];
          texels[i][2] = kind == 5 ? 0 : red[i];
          texels[i][3] = 255;
        }
      } else {
        return 1;
      }
      for (int py = 0; py < 4; ++py) {
        const int64_t y = by * 4 + py;
        if (y >= height) break;
        for (int px = 0; px < 4; ++px) {
          const int64_t x = bx * 4 + px;
          if (x >= width) break;
          std::memcpy(out + (y * width + x) * 4, texels[py * 4 + px], 4);
        }
      }
    }
  }
  return 0;
}

int native_version() { return 1; }

}  // extern "C"
