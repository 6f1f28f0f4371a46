// BC6H / BC7 block decompression (D3D11.3 functional spec section 19.5/19.6).
//
// The reference feeds these formats straight to the GPU's fixed-function
// decoder (ddspp only parses headers); on TPU we decode once on the host at
// asset-load time.  Implemented from the public format spec.
//
// Exposed via bc67_decode() in unclerenderer_native.cpp's C ABI:
//   kind 6 = BC6H_UF16 -> float32 RGBA
//   kind 7 = BC6H_SF16 -> float32 RGBA
//   kind 8 = BC7       -> uint8 RGBA

#include <cstdint>
#include <cstring>
#include <cmath>

namespace bc67 {

// ---------------------------------------------------------------------------
// Shared tables (D3D11.3 spec 19.5.2)
// ---------------------------------------------------------------------------

static const uint8_t kWeights2[4] = {0, 21, 43, 64};
static const uint8_t kWeights3[8] = {0, 9, 18, 27, 37, 46, 55, 64};
static const uint8_t kWeights4[16] = {0, 4, 9, 13, 17, 21, 26, 30,
                                      34, 38, 43, 47, 51, 55, 60, 64};

// 2-subset partition table (64 partitions x 16 texels).
static const uint8_t kPartition2[64][16] = {
    {0,0,1,1,0,0,1,1,0,0,1,1,0,0,1,1},{0,0,0,1,0,0,0,1,0,0,0,1,0,0,0,1},
    {0,1,1,1,0,1,1,1,0,1,1,1,0,1,1,1},{0,0,0,1,0,0,1,1,0,0,1,1,0,1,1,1},
    {0,0,0,0,0,0,0,1,0,0,0,1,0,0,1,1},{0,0,1,1,0,1,1,1,0,1,1,1,1,1,1,1},
    {0,0,0,1,0,0,1,1,0,1,1,1,1,1,1,1},{0,0,0,0,0,0,0,1,0,0,1,1,0,1,1,1},
    {0,0,0,0,0,0,0,0,0,0,0,1,0,0,1,1},{0,0,1,1,0,1,1,1,1,1,1,1,1,1,1,1},
    {0,0,0,0,0,0,0,1,0,1,1,1,1,1,1,1},{0,0,0,0,0,0,0,0,0,0,0,1,0,1,1,1},
    {0,0,0,1,0,1,1,1,1,1,1,1,1,1,1,1},{0,0,0,0,0,0,0,0,1,1,1,1,1,1,1,1},
    {0,0,0,0,1,1,1,1,1,1,1,1,1,1,1,1},{0,0,0,0,0,0,0,0,0,0,0,0,1,1,1,1},
    {0,0,0,0,1,0,0,0,1,1,1,0,1,1,1,1},{0,1,1,1,0,0,0,1,0,0,0,0,0,0,0,0},
    {0,0,0,0,0,0,0,0,1,0,0,0,1,1,1,0},{0,1,1,1,0,0,1,1,0,0,0,1,0,0,0,0},
    {0,0,1,1,0,0,0,1,0,0,0,0,0,0,0,0},{0,0,0,0,1,0,0,0,1,1,0,0,1,1,1,0},
    {0,0,0,0,0,0,0,0,1,0,0,0,1,1,0,0},{0,1,1,1,0,0,1,1,0,0,1,1,0,0,0,1},
    {0,0,1,1,0,0,0,1,0,0,0,1,0,0,0,0},{0,0,0,0,1,0,0,0,1,0,0,0,1,1,0,0},
    {0,1,1,0,0,1,1,0,0,1,1,0,0,1,1,0},{0,0,1,1,0,1,1,0,0,1,1,0,1,1,0,0},
    {0,0,0,1,0,1,1,1,1,1,1,0,1,0,0,0},{0,0,0,0,1,1,1,1,1,1,1,1,0,0,0,0},
    {0,1,1,1,0,0,0,1,1,0,0,0,1,1,1,0},{0,0,1,1,1,0,0,1,1,0,0,1,1,1,0,0},
    {0,1,0,1,0,1,0,1,0,1,0,1,0,1,0,1},{0,0,0,0,1,1,1,1,0,0,0,0,1,1,1,1},
    {0,1,0,1,1,0,1,0,0,1,0,1,1,0,1,0},{0,0,1,1,0,0,1,1,1,1,0,0,1,1,0,0},
    {0,0,1,1,1,1,0,0,0,0,1,1,1,1,0,0},{0,1,0,1,0,1,0,1,1,0,1,0,1,0,1,0},
    {0,1,1,0,1,0,0,1,0,1,1,0,1,0,0,1},{0,1,0,1,1,0,1,0,1,0,1,0,0,1,0,1},
    {0,1,1,1,0,0,1,1,1,1,0,0,1,1,1,0},{0,0,0,1,0,0,1,1,1,1,0,0,1,0,0,0},
    {0,0,1,1,0,0,1,0,0,1,0,0,1,1,0,0},{0,0,1,1,1,0,1,1,1,1,0,1,1,1,0,0},
    {0,1,1,0,1,0,0,1,1,0,0,1,0,1,1,0},{0,0,1,1,1,1,0,0,1,1,0,0,0,0,1,1},
    {0,1,1,0,0,1,1,0,1,0,0,1,1,0,0,1},{0,0,0,0,0,1,1,0,0,1,1,0,0,0,0,0},
    {0,1,0,0,1,1,1,0,0,1,0,0,0,0,0,0},{0,0,1,0,0,1,1,1,0,0,1,0,0,0,0,0},
    {0,0,0,0,0,0,1,0,0,1,1,1,0,0,1,0},{0,0,0,0,0,1,0,0,1,1,1,0,0,1,0,0},
    {0,1,1,0,1,1,0,0,1,0,0,1,0,0,1,1},{0,0,1,1,0,1,1,0,1,1,0,0,1,0,0,1},
    {0,1,1,0,0,0,1,1,1,0,0,1,1,1,0,0},{0,0,1,1,1,0,0,1,1,1,0,0,0,1,1,0},
    {0,1,1,0,1,1,0,0,1,1,0,0,1,0,0,1},{0,1,1,0,0,0,1,1,0,0,1,1,1,0,0,1},
    {0,1,1,1,1,1,1,0,1,0,0,0,0,0,0,1},{0,0,0,1,1,0,0,0,1,1,1,0,0,1,1,1},
    {0,0,0,0,1,1,1,1,0,0,1,1,0,0,1,1},{0,0,1,1,0,0,1,1,1,1,1,1,0,0,0,0},
    {0,0,1,0,0,0,1,0,1,1,1,0,1,1,1,0},{0,1,0,0,0,1,0,0,0,1,1,1,0,1,1,1}};

// 3-subset partition table (64 partitions x 16 texels).
static const uint8_t kPartition3[64][16] = {
    {0,0,1,1,0,0,1,1,0,2,2,1,2,2,2,2},{0,0,0,1,0,0,1,1,2,2,1,1,2,2,2,1},
    {0,0,0,0,2,0,0,1,2,2,1,1,2,2,1,1},{0,2,2,2,0,0,2,2,0,0,1,1,0,1,1,1},
    {0,0,0,0,0,0,0,0,1,1,2,2,1,1,2,2},{0,0,1,1,0,0,1,1,0,0,2,2,0,0,2,2},
    {0,0,2,2,0,0,2,2,1,1,1,1,1,1,1,1},{0,0,1,1,0,0,1,1,2,2,1,1,2,2,1,1},
    {0,0,0,0,0,0,0,0,1,1,1,1,2,2,2,2},{0,0,0,0,1,1,1,1,1,1,1,1,2,2,2,2},
    {0,0,0,0,1,1,1,1,2,2,2,2,2,2,2,2},{0,0,1,2,0,0,1,2,0,0,1,2,0,0,1,2},
    {0,1,1,2,0,1,1,2,0,1,1,2,0,1,1,2},{0,1,2,2,0,1,2,2,0,1,2,2,0,1,2,2},
    {0,0,1,1,0,1,1,2,1,1,2,2,1,2,2,2},{0,0,1,1,2,0,0,1,2,2,0,0,2,2,2,0},
    {0,0,0,1,0,0,1,1,0,1,1,2,1,1,2,2},{0,1,1,1,0,0,1,1,2,0,0,1,2,2,0,0},
    {0,0,0,0,1,1,2,2,1,1,2,2,1,1,2,2},{0,0,2,2,0,0,2,2,0,0,2,2,1,1,1,1},
    {0,1,1,1,0,1,1,1,0,2,2,2,0,2,2,2},{0,0,0,1,0,0,0,1,2,2,2,1,2,2,2,1},
    {0,0,0,0,0,0,1,1,0,1,2,2,0,1,2,2},{0,0,0,0,1,1,0,0,2,2,1,0,2,2,1,0},
    {0,1,2,2,0,1,2,2,0,0,1,1,0,0,0,0},{0,0,1,2,0,0,1,2,1,1,2,2,2,2,2,2},
    {0,1,1,0,1,2,2,1,1,2,2,1,0,1,1,0},{0,0,0,0,0,1,1,0,1,2,2,1,1,2,2,1},
    {0,0,2,2,1,1,0,2,1,1,0,2,0,0,2,2},{0,1,1,0,0,1,1,0,2,0,0,2,2,2,2,2},
    {0,0,1,1,0,1,2,2,0,1,2,2,0,0,1,1},{0,0,0,0,2,0,0,0,2,2,1,1,2,2,2,1},
    {0,0,0,0,0,0,0,2,1,1,2,2,1,2,2,2},{0,2,2,2,0,0,2,2,0,0,1,2,0,0,1,1},
    {0,0,1,1,0,0,1,2,0,0,2,2,0,2,2,2},{0,1,2,0,0,1,2,0,0,1,2,0,0,1,2,0},
    {0,0,0,0,1,1,1,1,2,2,2,2,0,0,0,0},{0,1,2,0,1,2,0,1,2,0,1,2,0,1,2,0},
    {0,1,2,0,2,0,1,2,1,2,0,1,0,1,2,0},{0,0,1,1,2,2,0,0,1,1,2,2,0,0,1,1},
    {0,0,1,1,1,1,2,2,2,2,0,0,0,0,1,1},{0,1,0,1,0,1,0,1,2,2,2,2,2,2,2,2},
    {0,0,0,0,0,0,0,0,2,1,2,1,2,1,2,1},{0,0,2,2,1,1,2,2,0,0,2,2,1,1,2,2},
    {0,0,2,2,0,0,1,1,0,0,2,2,0,0,1,1},{0,2,2,0,1,2,2,1,0,2,2,0,1,2,2,1},
    {0,1,0,1,2,2,2,2,2,2,2,2,0,1,0,1},{0,0,0,0,2,1,2,1,2,1,2,1,2,1,2,1},
    {0,1,0,1,0,1,0,1,0,1,0,1,2,2,2,2},{0,2,2,2,0,1,1,1,0,2,2,2,0,1,1,1},
    {0,0,0,2,1,1,1,2,0,0,0,2,1,1,1,2},{0,0,0,0,2,1,1,2,2,1,1,2,2,1,1,2},
    {0,2,2,2,0,1,1,1,0,1,1,1,0,2,2,2},{0,0,0,2,1,1,1,2,1,1,1,2,0,0,0,2},
    {0,1,1,0,0,1,1,0,0,1,1,0,2,2,2,2},{0,0,0,0,0,0,0,0,2,1,1,2,2,1,1,2},
    {0,1,1,0,0,1,1,0,2,2,2,2,2,2,2,2},{0,0,2,2,0,0,1,1,0,0,1,1,0,0,2,2},
    {0,0,2,2,1,1,2,2,1,1,2,2,0,0,2,2},{0,0,0,0,0,0,0,0,0,0,0,0,2,1,1,2},
    {0,0,0,2,0,0,0,1,0,0,0,2,0,0,0,1},{0,2,2,2,1,2,2,2,0,2,2,2,1,2,2,2},
    {0,1,0,1,2,2,2,2,2,2,2,2,2,2,2,2},{0,1,1,1,2,0,1,1,2,2,0,1,2,2,2,0}};

// Anchor index (second subset) for 2-subset partitions.
static const uint8_t kAnchor2[64] = {
    15,15,15,15,15,15,15,15,15,15,15,15,15,15,15,15,
    15, 2, 8, 2, 2, 8, 8,15, 2, 8, 2, 2, 8, 8, 2, 2,
    15,15, 6, 8, 2, 8,15,15, 2, 8, 2, 2, 2,15,15, 6,
     6, 2, 6, 8,15,15, 2, 2,15,15,15,15,15, 2, 2,15};

// Anchor indices for 3-subset partitions (subset 1 and subset 2).
static const uint8_t kAnchor3a[64] = {
     3, 3,15,15, 8, 3,15,15, 8, 8, 6, 6, 6, 5, 3, 3,
     3, 3, 8,15, 3, 3, 6,10, 5, 8, 8, 6, 8, 5,15,15,
     8,15, 3, 5, 6,10, 8,15,15, 3,15, 5,15,15,15,15,
     3,15, 5, 5, 5, 8, 5,10, 5,10, 8,13,15,12, 3, 3};
static const uint8_t kAnchor3b[64] = {
    15, 8, 8, 3,15,15, 3, 8,15,15,15,15,15,15,15, 8,
    15, 8,15, 3,15, 8,15, 8, 3,15, 6,10,15,15,10, 8,
    15, 3,15,10,10, 8, 9,10, 6,15, 8,15, 3, 6, 6, 8,
    15, 3,15,15,15,15,15,15,15,15,15,15, 3,15,15, 8};

// ---------------------------------------------------------------------------
// Bit reader
// ---------------------------------------------------------------------------

struct BitReader {
  const uint8_t* data;
  int pos = 0;
  explicit BitReader(const uint8_t* d) : data(d) {}
  uint32_t Read(int n) {
    uint32_t v = 0;
    for (int i = 0; i < n; ++i) {
      v |= static_cast<uint32_t>((data[pos >> 3] >> (pos & 7)) & 1) << i;
      ++pos;
    }
    return v;
  }
  uint32_t ReadBit() { return Read(1); }
};

static inline int interpolate(int a, int b, int w) {
  return (a * (64 - w) + b * w + 32) >> 6;
}

// ---------------------------------------------------------------------------
// BC7
// ---------------------------------------------------------------------------

struct Bc7ModeInfo {
  int num_subsets;
  int partition_bits;
  int rotation_bits;
  int index_selection_bits;
  int color_bits;
  int alpha_bits;
  int endpoint_pbits;   // unique p-bit per endpoint
  int shared_pbits;     // shared p-bit per subset
  int index_bits;
  int index_bits2;
};

static const Bc7ModeInfo kBc7Modes[8] = {
    {3, 4, 0, 0, 4, 0, 1, 0, 3, 0},  // 0
    {2, 6, 0, 0, 6, 0, 0, 1, 3, 0},  // 1
    {3, 6, 0, 0, 5, 0, 0, 0, 2, 0},  // 2
    {2, 6, 0, 0, 7, 0, 1, 0, 2, 0},  // 3
    {1, 0, 2, 1, 5, 6, 0, 0, 2, 3},  // 4
    {1, 0, 2, 0, 7, 8, 0, 0, 2, 2},  // 5
    {1, 0, 0, 0, 7, 7, 1, 0, 4, 0},  // 6
    {2, 6, 0, 0, 5, 5, 1, 0, 2, 0},  // 7
};

static inline int unquant_bc7(int v, int bits) {
  v <<= (8 - bits);
  return v | (v >> bits);
}

void decode_bc7_block(const uint8_t* block, uint8_t out[16][4]) {
  BitReader br(block);
  int mode = 0;
  while (mode < 8 && br.ReadBit() == 0) ++mode;
  if (mode >= 8) {
    std::memset(out, 0, 64);
    return;
  }
  const Bc7ModeInfo& mi = kBc7Modes[mode];
  const int partition = mi.partition_bits ? br.Read(mi.partition_bits) : 0;
  const int rotation = mi.rotation_bits ? br.Read(mi.rotation_bits) : 0;
  const int index_sel = mi.index_selection_bits ? br.Read(mi.index_selection_bits) : 0;

  const int ns = mi.num_subsets;
  int endpoints[6][4];  // up to 3 subsets x 2 endpoints, RGBA
  // color channels, then alpha: per channel, all endpoints in order.
  for (int c = 0; c < 3; ++c) {
    for (int e = 0; e < ns * 2; ++e) endpoints[e][c] = br.Read(mi.color_bits);
  }
  if (mi.alpha_bits) {
    for (int e = 0; e < ns * 2; ++e) endpoints[e][3] = br.Read(mi.alpha_bits);
  } else {
    for (int e = 0; e < ns * 2; ++e) endpoints[e][3] = 255;
  }

  int color_bits = mi.color_bits;
  int alpha_bits = mi.alpha_bits;
  if (mi.endpoint_pbits) {
    for (int e = 0; e < ns * 2; ++e) {
      const int p = br.ReadBit();
      for (int c = 0; c < 3; ++c) endpoints[e][c] = (endpoints[e][c] << 1) | p;
      if (mi.alpha_bits) endpoints[e][3] = (endpoints[e][3] << 1) | p;
    }
    color_bits += 1;
    if (alpha_bits) alpha_bits += 1;
  } else if (mi.shared_pbits) {
    for (int s = 0; s < ns; ++s) {
      const int p = br.ReadBit();
      for (int e = s * 2; e < s * 2 + 2; ++e) {
        for (int c = 0; c < 3; ++c) endpoints[e][c] = (endpoints[e][c] << 1) | p;
        if (mi.alpha_bits) endpoints[e][3] = (endpoints[e][3] << 1) | p;
      }
    }
    color_bits += 1;
    if (alpha_bits) alpha_bits += 1;
  }
  for (int e = 0; e < ns * 2; ++e) {
    for (int c = 0; c < 3; ++c) endpoints[e][c] = unquant_bc7(endpoints[e][c], color_bits);
    if (mi.alpha_bits) endpoints[e][3] = unquant_bc7(endpoints[e][3], alpha_bits);
  }

  // Index data. Anchor texels drop their MSB.
  auto subset_of = [&](int t) -> int {
    if (ns == 1) return 0;
    if (ns == 2) return kPartition2[partition][t];
    return kPartition3[partition][t];
  };
  auto is_anchor = [&](int t) -> bool {
    if (t == 0) return true;
    if (ns == 2) return t == kAnchor2[partition];
    if (ns == 3) return t == kAnchor3a[partition] || t == kAnchor3b[partition];
    return false;
  };

  int idx1[16], idx2[16];
  for (int t = 0; t < 16; ++t) {
    const int bits = mi.index_bits - (is_anchor(t) ? 1 : 0);
    idx1[t] = br.Read(bits);
  }
  if (mi.index_bits2) {
    for (int t = 0; t < 16; ++t) {
      const int bits = mi.index_bits2 - (t == 0 ? 1 : 0);
      idx2[t] = br.Read(bits);
    }
  }

  const uint8_t* w1 = mi.index_bits == 2 ? kWeights2 : (mi.index_bits == 3 ? kWeights3 : kWeights4);
  const uint8_t* w2 = mi.index_bits2 == 2 ? kWeights2 : kWeights3;

  for (int t = 0; t < 16; ++t) {
    const int s = subset_of(t);
    const int* e0 = endpoints[s * 2];
    const int* e1 = endpoints[s * 2 + 1];
    int cw, aw;
    if (mi.index_bits2 == 0) {
      cw = w1[idx1[t]];
      aw = cw;
    } else if (index_sel == 0) {
      cw = w1[idx1[t]];
      aw = w2[idx2[t]];
    } else {
      cw = w2[idx2[t]];
      aw = w1[idx1[t]];
    }
    int r = interpolate(e0[0], e1[0], cw);
    int g = interpolate(e0[1], e1[1], cw);
    int b = interpolate(e0[2], e1[2], cw);
    int a = interpolate(e0[3], e1[3], aw);
    // rotation swaps alpha with a color channel
    switch (rotation) {
      case 1: { int tmp = r; r = a; a = tmp; break; }
      case 2: { int tmp = g; g = a; a = tmp; break; }
      case 3: { int tmp = b; b = a; a = tmp; break; }
      default: break;
    }
    out[t][0] = static_cast<uint8_t>(r);
    out[t][1] = static_cast<uint8_t>(g);
    out[t][2] = static_cast<uint8_t>(b);
    out[t][3] = static_cast<uint8_t>(a);
  }
}

// ---------------------------------------------------------------------------
// BC6H
// ---------------------------------------------------------------------------

// Per-mode bit sequences implemented directly, matching the D3D11.3 spec's
// "BC6H Mode Bits" table bit-by-bit.
struct Bc6Block {
  int r[4], g[4], b[4];  // endpoints: w, x, y, z
  int partition = 0;
  bool two = false;
  int epb = 0;
  int dbits[3] = {0, 0, 0};
  bool transformed = false;
};

static bool read_bc6_header(BitReader& br, Bc6Block& blk) {
  auto& r = blk.r; auto& g = blk.g; auto& b = blk.b;
  std::memset(r, 0, sizeof(blk.r));
  std::memset(g, 0, sizeof(blk.g));
  std::memset(b, 0, sizeof(blk.b));
  const int m2 = br.Read(2);
  int mode;
  if (m2 < 2) mode = m2; else mode = (br.Read(3) << 2) | m2;
  auto rd = [&](int n) { return static_cast<int>(br.Read(n)); };
  switch (mode) {
    case 0:  // 10.555, transformed, two regions
      blk.two = true; blk.transformed = true; blk.epb = 10;
      blk.dbits[0] = blk.dbits[1] = blk.dbits[2] = 5;
      g[2] |= rd(1) << 4; b[2] |= rd(1) << 4; b[3] |= rd(1) << 4;
      r[0] = rd(10); g[0] = rd(10); b[0] = rd(10);
      r[1] = rd(5); g[3] |= rd(1) << 4; g[2] |= rd(4);
      g[1] = rd(5); b[3] |= rd(1); g[3] |= rd(4);
      b[1] = rd(5); b[3] |= rd(1) << 1; b[2] |= rd(4);
      r[2] = rd(5); b[3] |= rd(1) << 2;
      r[3] = rd(5); b[3] |= rd(1) << 3;
      break;
    case 1:  // 7.666
      blk.two = true; blk.transformed = true; blk.epb = 7;
      blk.dbits[0] = blk.dbits[1] = blk.dbits[2] = 6;
      g[2] |= rd(1) << 5; g[3] |= rd(1) << 4; g[3] |= rd(1) << 5;
      r[0] = rd(7); b[3] |= rd(1); b[3] |= rd(1) << 1; b[2] |= rd(1) << 4;
      g[0] = rd(7); b[2] |= rd(1) << 5; b[3] |= rd(1) << 2; g[2] |= rd(1) << 4;
      b[0] = rd(7); b[3] |= rd(1) << 3; b[3] |= rd(1) << 5; b[3] |= rd(1) << 4;
      r[1] = rd(6); g[2] |= rd(4);
      g[1] = rd(6); g[3] |= rd(4);
      b[1] = rd(6); b[2] |= rd(4);
      r[2] = rd(6);
      r[3] = rd(6);
      break;
    case 2:  // 11.555 (r) .444 (g,b)... actually 11.544
      blk.two = true; blk.transformed = true; blk.epb = 11;
      blk.dbits[0] = 5; blk.dbits[1] = 4; blk.dbits[2] = 4;
      r[0] = rd(10); g[0] = rd(10); b[0] = rd(10);
      r[1] = rd(5); r[0] |= rd(1) << 10; g[2] |= rd(4);
      g[1] = rd(4); g[0] |= rd(1) << 10; b[3] |= rd(1); g[3] |= rd(4);
      b[1] = rd(4); b[0] |= rd(1) << 10; b[3] |= rd(1) << 1; b[2] |= rd(4);
      r[2] = rd(5); b[3] |= rd(1) << 2;
      r[3] = rd(5); b[3] |= rd(1) << 3;
      break;
    case 6:  // 11.455
      blk.two = true; blk.transformed = true; blk.epb = 11;
      blk.dbits[0] = 4; blk.dbits[1] = 5; blk.dbits[2] = 4;
      r[0] = rd(10); g[0] = rd(10); b[0] = rd(10);
      r[1] = rd(4); r[0] |= rd(1) << 10; g[3] |= rd(1) << 4; g[2] |= rd(4);
      g[1] = rd(5); g[0] |= rd(1) << 10; g[3] |= rd(4);
      b[1] = rd(4); b[0] |= rd(1) << 10; b[3] |= rd(1) << 1; b[2] |= rd(4);
      r[2] = rd(4); b[3] |= rd(1); b[3] |= rd(1) << 2;
      r[3] = rd(4); g[2] |= rd(1) << 4; b[3] |= rd(1) << 3;
      break;
    case 10:  // 11.445
      blk.two = true; blk.transformed = true; blk.epb = 11;
      blk.dbits[0] = 4; blk.dbits[1] = 4; blk.dbits[2] = 5;
      r[0] = rd(10); g[0] = rd(10); b[0] = rd(10);
      r[1] = rd(4); r[0] |= rd(1) << 10; b[2] |= rd(1) << 4; g[2] |= rd(4);
      g[1] = rd(4); g[0] |= rd(1) << 10; b[3] |= rd(1); g[3] |= rd(4);
      b[1] = rd(5); b[0] |= rd(1) << 10; b[2] |= rd(4);
      r[2] = rd(4); b[3] |= rd(1) << 1; b[3] |= rd(1) << 2;
      r[3] = rd(4); b[3] |= rd(1) << 4; b[3] |= rd(1) << 3;
      break;
    case 14:  // 9.555
      blk.two = true; blk.transformed = true; blk.epb = 9;
      blk.dbits[0] = blk.dbits[1] = blk.dbits[2] = 5;
      r[0] = rd(9); b[2] |= rd(1) << 4;
      g[0] = rd(9); g[2] |= rd(1) << 4;
      b[0] = rd(9); b[3] |= rd(1) << 4;
      r[1] = rd(5); g[3] |= rd(1) << 4; g[2] |= rd(4);
      g[1] = rd(5); b[3] |= rd(1); g[3] |= rd(4);
      b[1] = rd(5); b[3] |= rd(1) << 1; b[2] |= rd(4);
      r[2] = rd(5); b[3] |= rd(1) << 2;
      r[3] = rd(5); b[3] |= rd(1) << 3;
      break;
    case 18:  // 8.666
      blk.two = true; blk.transformed = true; blk.epb = 8;
      blk.dbits[0] = 6; blk.dbits[1] = 5; blk.dbits[2] = 5;
      r[0] = rd(8); g[3] |= rd(1) << 4; b[2] |= rd(1) << 4;
      g[0] = rd(8); g[2] |= rd(1) << 4;
      b[0] = rd(8); b[3] |= rd(1) << 4;
      r[1] = rd(6); g[2] |= rd(4);
      g[1] = rd(5); b[3] |= rd(1); g[3] |= rd(4);
      b[1] = rd(5); b[3] |= rd(1) << 1; b[2] |= rd(4);
      r[2] = rd(6);
      r[3] = rd(6);
      break;
    case 22:  // 8.565
      blk.two = true; blk.transformed = true; blk.epb = 8;
      blk.dbits[0] = 5; blk.dbits[1] = 6; blk.dbits[2] = 5;
      r[0] = rd(8); b[3] |= rd(1); b[2] |= rd(1) << 4;
      g[0] = rd(8); g[2] |= rd(1) << 5; g[2] |= rd(1) << 4;
      b[0] = rd(8); g[3] |= rd(1) << 5; b[3] |= rd(1) << 4;
      r[1] = rd(5); g[3] |= rd(1) << 4; g[2] |= rd(4);
      g[1] = rd(6); g[3] |= rd(4);
      b[1] = rd(5); b[3] |= rd(1) << 1; b[2] |= rd(4);
      r[2] = rd(5); b[3] |= rd(1) << 2;
      r[3] = rd(5); b[3] |= rd(1) << 3;
      break;
    case 26:  // 8.556
      blk.two = true; blk.transformed = true; blk.epb = 8;
      blk.dbits[0] = 5; blk.dbits[1] = 5; blk.dbits[2] = 6;
      r[0] = rd(8); b[3] |= rd(1) << 1; b[2] |= rd(1) << 4;
      g[0] = rd(8); b[2] |= rd(1) << 5; g[2] |= rd(1) << 4;
      b[0] = rd(8); b[3] |= rd(1) << 5; b[3] |= rd(1) << 4;
      r[1] = rd(5); g[3] |= rd(1) << 4; g[2] |= rd(4);
      g[1] = rd(5); b[3] |= rd(1); g[3] |= rd(4);
      b[1] = rd(6); b[2] |= rd(4);
      r[2] = rd(5); b[3] |= rd(1) << 2;
      r[3] = rd(5); b[3] |= rd(1) << 3;
      break;
    case 30:  // 6.666, NOT transformed
      blk.two = true; blk.transformed = false; blk.epb = 6;
      blk.dbits[0] = blk.dbits[1] = blk.dbits[2] = 6;
      r[0] = rd(6); g[3] |= rd(1) << 4; b[3] |= rd(1); b[3] |= rd(1) << 1; b[2] |= rd(1) << 4;
      g[0] = rd(6); g[2] |= rd(1) << 5; b[2] |= rd(1) << 5; b[3] |= rd(1) << 2; g[2] |= rd(1) << 4;
      b[0] = rd(6); g[3] |= rd(1) << 5; b[3] |= rd(1) << 3; b[3] |= rd(1) << 5; b[3] |= rd(1) << 4;
      r[1] = rd(6); g[2] |= rd(4);
      g[1] = rd(6); g[3] |= rd(4);
      b[1] = rd(6); b[2] |= rd(4);
      r[2] = rd(6);
      r[3] = rd(6);
      break;
    case 3:  // one region, 10.10, not transformed
      blk.two = false; blk.transformed = false; blk.epb = 10;
      blk.dbits[0] = blk.dbits[1] = blk.dbits[2] = 10;
      r[0] = rd(10); g[0] = rd(10); b[0] = rd(10);
      r[1] = rd(10); g[1] = rd(10); b[1] = rd(10);
      break;
    case 7:  // one region, 11.9, transformed
      blk.two = false; blk.transformed = true; blk.epb = 11;
      blk.dbits[0] = blk.dbits[1] = blk.dbits[2] = 9;
      r[0] = rd(10); g[0] = rd(10); b[0] = rd(10);
      r[1] = rd(9); r[0] |= rd(1) << 10;
      g[1] = rd(9); g[0] |= rd(1) << 10;
      b[1] = rd(9); b[0] |= rd(1) << 10;
      break;
    case 11:  // one region, 12.8, transformed
      blk.two = false; blk.transformed = true; blk.epb = 12;
      blk.dbits[0] = blk.dbits[1] = blk.dbits[2] = 8;
      r[0] = rd(10); g[0] = rd(10); b[0] = rd(10);
      r[1] = rd(8); r[0] |= rd(1) << 11; r[0] |= rd(1) << 10;
      g[1] = rd(8); g[0] |= rd(1) << 11; g[0] |= rd(1) << 10;
      b[1] = rd(8); b[0] |= rd(1) << 11; b[0] |= rd(1) << 10;
      break;
    case 15:  // one region, 16.4, transformed
      blk.two = false; blk.transformed = true; blk.epb = 16;
      blk.dbits[0] = blk.dbits[1] = blk.dbits[2] = 4;
      r[0] = rd(10); g[0] = rd(10); b[0] = rd(10);
      r[1] = rd(4);
      { for (int i = 15; i >= 10; --i) r[0] |= rd(1) << i; }
      g[1] = rd(4);
      { for (int i = 15; i >= 10; --i) g[0] |= rd(1) << i; }
      b[1] = rd(4);
      { for (int i = 15; i >= 10; --i) b[0] |= rd(1) << i; }
      break;
    default:
      return false;  // reserved mode -> zero block
  }
  if (blk.two) blk.partition = static_cast<int>(br.Read(5));
  return true;
}

static inline int sign_extend(int v, int bits) {
  const int sign = 1 << (bits - 1);
  return (v ^ sign) - sign;
}

static int unquantize_bc6(int v, int bits, bool is_signed) {
  if (!is_signed) {
    if (bits >= 15) return v;
    if (v == 0) return 0;
    if (v == ((1 << bits) - 1)) return 0xFFFF;
    return ((v << 16) + 0x8000) >> bits;
  }
  if (bits >= 16) return v;
  int s = 0;
  if (v < 0) { s = 1; v = -v; }
  int unq;
  if (v == 0) unq = 0;
  else if (v >= ((1 << (bits - 1)) - 1)) unq = 0x7FFF;
  else unq = ((v << 15) + 0x4000) >> (bits - 1);
  return s ? -unq : unq;
}

static uint16_t finish_unquantize_bc6(int v, bool is_signed) {
  if (!is_signed) {
    return static_cast<uint16_t>((v * 31) >> 6);
  }
  v = (v < 0) ? -((-v * 31) >> 5) : (v * 31) >> 5;
  int s = 0;
  if (v < 0) { s = 0x8000; v = -v; }
  return static_cast<uint16_t>(s | v);
}

static float half_to_float(uint16_t h) {
  const uint32_t sign = (h & 0x8000u) << 16;
  uint32_t exp = (h >> 10) & 0x1F;
  uint32_t mant = h & 0x3FF;
  uint32_t f;
  if (exp == 0) {
    if (mant == 0) {
      f = sign;
    } else {
      exp = 127 - 15 + 1;
      while ((mant & 0x400) == 0) { mant <<= 1; --exp; }
      mant &= 0x3FF;
      f = sign | (exp << 23) | (mant << 13);
    }
  } else if (exp == 31) {
    f = sign | 0x7F800000u | (mant << 13);
  } else {
    f = sign | ((exp + 127 - 15) << 23) | (mant << 13);
  }
  float out;
  std::memcpy(&out, &f, 4);
  return out;
}

void decode_bc6_block(const uint8_t* block, float out[16][4], bool is_signed) {
  BitReader br(block);
  Bc6Block blk;
  if (!read_bc6_header(br, blk)) {
    for (int t = 0; t < 16; ++t) {
      out[t][0] = out[t][1] = out[t][2] = 0.0f;
      out[t][3] = 1.0f;
    }
    return;
  }

  int R[4] = {blk.r[0], blk.r[1], blk.r[2], blk.r[3]};
  int G[4] = {blk.g[0], blk.g[1], blk.g[2], blk.g[3]};
  int B[4] = {blk.b[0], blk.b[1], blk.b[2], blk.b[3]};
  const int n_ep = blk.two ? 4 : 2;

  if (is_signed) {
    R[0] = sign_extend(R[0], blk.epb);
    G[0] = sign_extend(G[0], blk.epb);
    B[0] = sign_extend(B[0], blk.epb);
  }
  for (int e = 1; e < n_ep; ++e) {
    if (blk.transformed) {
      R[e] = sign_extend(R[e], blk.dbits[0]);
      G[e] = sign_extend(G[e], blk.dbits[1]);
      B[e] = sign_extend(B[e], blk.dbits[2]);
      const int mask = (1 << blk.epb) - 1;
      R[e] = (R[e] + R[0]) & mask;
      G[e] = (G[e] + G[0]) & mask;
      B[e] = (B[e] + B[0]) & mask;
      if (is_signed) {
        R[e] = sign_extend(R[e], blk.epb);
        G[e] = sign_extend(G[e], blk.epb);
        B[e] = sign_extend(B[e], blk.epb);
      }
    } else if (is_signed) {
      R[e] = sign_extend(R[e], blk.epb);
      G[e] = sign_extend(G[e], blk.epb);
      B[e] = sign_extend(B[e], blk.epb);
    }
  }

  int uR[4], uG[4], uB[4];
  for (int e = 0; e < n_ep; ++e) {
    uR[e] = unquantize_bc6(R[e], blk.epb, is_signed);
    uG[e] = unquantize_bc6(G[e], blk.epb, is_signed);
    uB[e] = unquantize_bc6(B[e], blk.epb, is_signed);
  }

  const int index_bits = blk.two ? 3 : 4;
  const uint8_t* weights = blk.two ? kWeights3 : kWeights4;
  int idx[16];
  for (int t = 0; t < 16; ++t) {
    bool anchor = (t == 0) || (blk.two && t == kAnchor2[blk.partition]);
    idx[t] = static_cast<int>(br.Read(index_bits - (anchor ? 1 : 0)));
  }

  for (int t = 0; t < 16; ++t) {
    int subset = blk.two ? kPartition2[blk.partition][t] : 0;
    const int e0 = subset * 2, e1 = subset * 2 + 1;
    const int w = weights[idx[t]];
    const int r = interpolate(uR[e0], uR[e1], w);
    const int g = interpolate(uG[e0], uG[e1], w);
    const int b = interpolate(uB[e0], uB[e1], w);
    out[t][0] = half_to_float(finish_unquantize_bc6(r, is_signed));
    out[t][1] = half_to_float(finish_unquantize_bc6(g, is_signed));
    out[t][2] = half_to_float(finish_unquantize_bc6(b, is_signed));
    out[t][3] = 1.0f;
  }
}

}  // namespace bc67

extern "C" {

// kind 6 = BC6H_UF16, 7 = BC6H_SF16 (out f32), 8 = BC7 (out u8)
int bc67_decode(const uint8_t* in, void* out, int64_t width, int64_t height,
                int kind) {
  const int64_t bw = (width + 3) / 4, bh = (height + 3) / 4;
  if (kind == 8) {
    uint8_t* dst = static_cast<uint8_t*>(out);
    for (int64_t by = 0; by < bh; ++by) {
      for (int64_t bx = 0; bx < bw; ++bx) {
        uint8_t texels[16][4];
        bc67::decode_bc7_block(in + (by * bw + bx) * 16, texels);
        for (int py = 0; py < 4; ++py) {
          const int64_t y = by * 4 + py;
          if (y >= height) break;
          for (int px = 0; px < 4; ++px) {
            const int64_t x = bx * 4 + px;
            if (x >= width) break;
            std::memcpy(dst + (y * width + x) * 4, texels[py * 4 + px], 4);
          }
        }
      }
    }
    return 0;
  }
  if (kind == 6 || kind == 7) {
    float* dst = static_cast<float*>(out);
    const bool is_signed = (kind == 7);
    for (int64_t by = 0; by < bh; ++by) {
      for (int64_t bx = 0; bx < bw; ++bx) {
        float texels[16][4];
        bc67::decode_bc6_block(in + (by * bw + bx) * 16, texels, is_signed);
        for (int py = 0; py < 4; ++py) {
          const int64_t y = by * 4 + py;
          if (y >= height) break;
          for (int px = 0; px < 4; ++px) {
            const int64_t x = bx * 4 + px;
            if (x >= width) break;
            std::memcpy(dst + (y * width + x) * 4, texels[py * 4 + px], 16);
          }
        }
      }
    }
    return 0;
  }
  return 1;
}

}  // extern "C"
