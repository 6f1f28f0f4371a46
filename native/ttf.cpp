// TrueType font baker: parse a .ttf and rasterize an ASCII glyph range into
// a single-channel atlas with per-glyph metrics -- the native analog of the
// reference's stb_truetype DebugPrintFont bake
// (Source/Render/DebugPrintFont.cpp:37-90: stbtt_BakeFontBitmap of chars
// 32..127 into a 512x512 R8 atlas + {UvMin,UvMax,Size,Offset,Advance}).
// Own implementation from the OpenType spec (no stb code): cmap format 4,
// glyf simple + composite (offset/scale components), quadratic flattening,
// non-zero-winding scanline fill with 4x4 supersampled coverage.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>

namespace {

struct Reader {
  const uint8_t* p;
  int64_t len;
  bool ok(int64_t off, int64_t n) const { return off >= 0 && off + n <= len; }
  uint8_t u8(int64_t o) const { return p[o]; }
  uint16_t u16(int64_t o) const { return (uint16_t)((p[o] << 8) | p[o + 1]); }
  int16_t s16(int64_t o) const { return (int16_t)u16(o); }
  uint32_t u32(int64_t o) const {
    return ((uint32_t)p[o] << 24) | ((uint32_t)p[o + 1] << 16) |
           ((uint32_t)p[o + 2] << 8) | p[o + 3];
  }
};

struct Pt {
  float x, y;
  bool on;
};

struct Edge {
  float x0, y0, x1, y1;  // pixel space, y down
};

struct Font {
  Reader r;
  int64_t cmap = -1, glyf = -1, loca = -1, head = -1, hhea = -1, hmtx = -1,
          maxp = -1;
  int units_per_em = 1000;
  int loca_long = 0;
  int num_glyphs = 0;
  int num_hmetrics = 0;
  int ascent = 0, descent = 0;
  int64_t cmap_sub = -1;  // offset of the format-4 subtable

  bool parse() {
    if (!r.ok(0, 12)) return false;
    uint32_t ver = r.u32(0);
    if (ver != 0x00010000 && ver != 0x74727565 /*'true'*/) return false;
    int nt = r.u16(4);
    if (!r.ok(12, (int64_t)nt * 16)) return false;
    for (int i = 0; i < nt; ++i) {
      int64_t e = 12 + (int64_t)i * 16;
      uint32_t tag = r.u32(e), off = r.u32(e + 8), tlen = r.u32(e + 12);
      if (!r.ok(off, tlen)) continue;
      switch (tag) {
        case 0x636d6170: cmap = off; break;  // 'cmap'
        case 0x676c7966: glyf = off; break;  // 'glyf'
        case 0x6c6f6361: loca = off; break;  // 'loca'
        case 0x68656164: head = off; break;  // 'head'
        case 0x68686561: hhea = off; break;  // 'hhea'
        case 0x686d7478: hmtx = off; break;  // 'hmtx'
        case 0x6d617870: maxp = off; break;  // 'maxp'
      }
    }
    if (cmap < 0 || glyf < 0 || loca < 0 || head < 0 || hhea < 0 || hmtx < 0 ||
        maxp < 0)
      return false;
    if (!r.ok(head, 52) || !r.ok(hhea, 36) || !r.ok(maxp, 6) || !r.ok(cmap, 4))
      return false;
    units_per_em = r.u16(head + 18);
    loca_long = r.s16(head + 50) != 0;
    num_glyphs = r.u16(maxp + 4);
    ascent = r.s16(hhea + 4);
    descent = r.s16(hhea + 6);
    num_hmetrics = r.u16(hhea + 34);
    // pick a unicode BMP cmap subtable: prefer (3,1), else (0,*), else (3,0)
    int nsub = r.u16(cmap + 2);
    int64_t best = -1;
    int best_rank = -1;
    for (int i = 0; i < nsub; ++i) {
      int64_t e = cmap + 4 + (int64_t)i * 8;
      int plat = r.u16(e), enc = r.u16(e + 2);
      int64_t sub = cmap + r.u32(e + 4);
      if (!r.ok(sub, 4)) continue;
      int fmt = r.u16(sub);
      if (fmt != 4) continue;
      int rank = (plat == 3 && enc == 1) ? 3 : (plat == 0) ? 2
                 : (plat == 3 && enc == 0)                 ? 1
                                                           : 0;
      if (rank > best_rank) { best_rank = rank; best = sub; }
    }
    if (best < 0) return false;
    cmap_sub = best;
    return true;
  }

  int glyph_index(int code) const {
    const int64_t s = cmap_sub;
    if (!r.ok(s, 8)) return 0;
    int seg2 = r.u16(s + 6);
    // endCode[seg2/2] + reserved + startCode + idDelta + idRangeOffset
    if (!r.ok(s + 14, 4 * (int64_t)seg2 + 2)) return 0;
    int64_t end_codes = s + 14;
    int64_t start_codes = end_codes + seg2 + 2;
    int64_t deltas = start_codes + seg2;
    int64_t range_offs = deltas + seg2;
    for (int i = 0; i < seg2 / 2; ++i) {
      int end = r.u16(end_codes + 2 * i);
      if (code > end) continue;
      int start = r.u16(start_codes + 2 * i);
      if (code < start) return 0;
      int ro = r.u16(range_offs + 2 * i);
      if (ro == 0) return (code + r.s16(deltas + 2 * i)) & 0xFFFF;
      int64_t gi_off = range_offs + 2 * i + ro + 2 * (code - start);
      if (!r.ok(gi_off, 2)) return 0;
      int gi = r.u16(gi_off);
      if (gi == 0) return 0;
      return (gi + r.s16(deltas + 2 * i)) & 0xFFFF;
    }
    return 0;
  }

  bool glyph_range(int gid, int64_t* off, int64_t* glen) const {
    if (gid < 0 || gid >= num_glyphs) return false;
    if (!r.ok(loca + (loca_long ? 4 : 2) * (int64_t)(gid + 1),
              loca_long ? 4 : 2))
      return false;
    int64_t a, b;
    if (loca_long) {
      a = r.u32(loca + 4 * (int64_t)gid);
      b = r.u32(loca + 4 * (int64_t)(gid + 1));
    } else {
      a = 2 * (int64_t)r.u16(loca + 2 * (int64_t)gid);
      b = 2 * (int64_t)r.u16(loca + 2 * (int64_t)(gid + 1));
    }
    if (b < a) return false;
    *off = glyf + a;
    *glen = b - a;
    return r.ok(*off, *glen);
  }

  int advance(int gid) const {
    int i = gid < num_hmetrics ? gid : num_hmetrics - 1;
    if (i < 0 || !r.ok(hmtx + 4 * (int64_t)i, 2)) return 0;
    return r.u16(hmtx + 4 * (int64_t)i);
  }

  // Decode glyph outline points (font units) into contours; composites
  // recurse with an affine transform.  Returns false on malformed data.
  bool outline(int gid, float m[6], std::vector<std::vector<Pt>>& out,
               int depth) const {
    if (depth > 4) return false;
    int64_t off, glen;
    if (!glyph_range(gid, &off, &glen)) return false;
    if (glen == 0) return true;  // empty glyph (space)
    if (glen < 10) return false;
    int ncont = r.s16(off);
    if (ncont >= 0) {
      int64_t p = off + 10;
      if (!r.ok(p, 2 * (int64_t)ncont + 2)) return false;
      std::vector<int> ends(ncont);
      for (int i = 0; i < ncont; ++i) ends[i] = r.u16(p + 2 * i);
      p += 2 * ncont;
      int npts = ncont ? ends[ncont - 1] + 1 : 0;
      int ilen = r.u16(p);
      p += 2 + ilen;
      if (!r.ok(p, 0)) return false;
      // flags
      std::vector<uint8_t> flags;
      flags.reserve(npts);
      while ((int)flags.size() < npts) {
        if (!r.ok(p, 1)) return false;
        uint8_t f = r.u8(p++);
        flags.push_back(f);
        if (f & 8) {  // repeat
          if (!r.ok(p, 1)) return false;
          int rep = r.u8(p++);
          for (int k = 0; k < rep && (int)flags.size() < npts; ++k)
            flags.push_back(f);
        }
      }
      // x coords
      std::vector<int> xs(npts), ys(npts);
      int v = 0;
      for (int i = 0; i < npts; ++i) {
        uint8_t f = flags[i];
        if (f & 2) {
          if (!r.ok(p, 1)) return false;
          int d = r.u8(p++);
          v += (f & 16) ? d : -d;
        } else if (!(f & 16)) {
          if (!r.ok(p, 2)) return false;
          v += r.s16(p);
          p += 2;
        }
        xs[i] = v;
      }
      v = 0;
      for (int i = 0; i < npts; ++i) {
        uint8_t f = flags[i];
        if (f & 4) {
          if (!r.ok(p, 1)) return false;
          int d = r.u8(p++);
          v += (f & 32) ? d : -d;
        } else if (!(f & 32)) {
          if (!r.ok(p, 2)) return false;
          v += r.s16(p);
          p += 2;
        }
        ys[i] = v;
      }
      int start = 0;
      for (int c = 0; c < ncont; ++c) {
        std::vector<Pt> contour;
        for (int i = start; i <= ends[c]; ++i) {
          float gx = (float)xs[i], gy = (float)ys[i];
          contour.push_back({m[0] * gx + m[2] * gy + m[4],
                             m[1] * gx + m[3] * gy + m[5],
                             (flags[i] & 1) != 0});
        }
        if (!contour.empty()) out.push_back(std::move(contour));
        start = ends[c] + 1;
      }
      return true;
    }
    // composite glyph
    int64_t p = off + 10;
    bool more = true;
    while (more) {
      if (!r.ok(p, 4)) return false;
      int flags = r.u16(p), cgid = r.u16(p + 2);
      p += 4;
      float dx = 0, dy = 0;
      if (flags & 1) {  // words
        if (!r.ok(p, 4)) return false;
        if (flags & 2) { dx = r.s16(p); dy = r.s16(p + 2); }
        p += 4;
      } else {
        if (!r.ok(p, 2)) return false;
        if (flags & 2) { dx = (int8_t)r.u8(p); dy = (int8_t)r.u8(p + 1); }
        p += 2;
      }
      float a = 1, b = 0, c = 0, d = 1;
      if (flags & 8) {  // single scale (F2Dot14)
        if (!r.ok(p, 2)) return false;
        a = d = r.s16(p) / 16384.0f;
        p += 2;
      } else if (flags & 0x40) {  // x & y scale
        if (!r.ok(p, 4)) return false;
        a = r.s16(p) / 16384.0f;
        d = r.s16(p + 2) / 16384.0f;
        p += 4;
      } else if (flags & 0x80) {  // 2x2
        if (!r.ok(p, 8)) return false;
        a = r.s16(p) / 16384.0f;
        b = r.s16(p + 2) / 16384.0f;
        c = r.s16(p + 4) / 16384.0f;
        d = r.s16(p + 6) / 16384.0f;
        p += 8;
      }
      // child transform composed with parent (offsets in font units)
      float cm[6] = {
          m[0] * a + m[2] * b,          m[1] * a + m[3] * b,
          m[0] * c + m[2] * d,          m[1] * c + m[3] * d,
          m[0] * dx + m[2] * dy + m[4], m[1] * dx + m[3] * dy + m[5]};
      if (!outline(cgid, cm, out, depth + 1)) return false;
      more = (flags & 0x20) != 0;
    }
    return true;
  }
};

// flatten one contour (font outline already in pixel space, y-down) to edges
void flatten(const std::vector<Pt>& c, std::vector<Edge>& edges) {
  if (c.size() < 2) return;
  // build an on-curve point sequence with implied midpoints
  std::vector<Pt> pts;
  // rotate so we start on-curve if any point is
  size_t first_on = c.size();
  for (size_t i = 0; i < c.size(); ++i)
    if (c[i].on) { first_on = i; break; }
  if (first_on == c.size()) {
    // all off-curve: start at implied midpoint
    Pt mid{(c[0].x + c.back().x) * 0.5f, (c[0].y + c.back().y) * 0.5f, true};
    pts.push_back(mid);
    for (size_t i = 0; i < c.size(); ++i) pts.push_back(c[i]);
    pts.push_back(mid);
  } else {
    for (size_t k = 0; k <= c.size(); ++k)
      pts.push_back(c[(first_on + k) % c.size()]);
  }
  auto line = [&](float x0, float y0, float x1, float y1) {
    if (y0 != y1) edges.push_back({x0, y0, x1, y1});
  };
  auto quad = [&](float x0, float y0, float cx, float cy, float x1, float y1) {
    const int N = 8;
    float px = x0, py = y0;
    for (int i = 1; i <= N; ++i) {
      float t = (float)i / N, u = 1.0f - t;
      float qx = u * u * x0 + 2 * u * t * cx + t * t * x1;
      float qy = u * u * y0 + 2 * u * t * cy + t * t * y1;
      line(px, py, qx, qy);
      px = qx; py = qy;
    }
  };
  Pt prev = pts[0];
  size_t i = 1;
  while (i < pts.size()) {
    if (pts[i].on) {
      line(prev.x, prev.y, pts[i].x, pts[i].y);
      prev = pts[i];
      ++i;
    } else {
      Pt ctrl = pts[i];
      Pt next;
      if (i + 1 < pts.size()) {
        next = pts[i + 1];
        if (!next.on) {  // implied on-curve midpoint
          next = {(ctrl.x + next.x) * 0.5f, (ctrl.y + next.y) * 0.5f, true};
          quad(prev.x, prev.y, ctrl.x, ctrl.y, next.x, next.y);
          prev = next;
          ++i;
          continue;
        }
        quad(prev.x, prev.y, ctrl.x, ctrl.y, next.x, next.y);
        prev = next;
        i += 2;
      } else {
        quad(prev.x, prev.y, ctrl.x, ctrl.y, pts[0].x, pts[0].y);
        break;
      }
    }
  }
}

// non-zero winding fill, 4x4 supersampling, into w*h u8 (y-down pixel space)
void fill(const std::vector<Edge>& edges, uint8_t* out, int w, int h) {
  const int SS = 4;
  std::vector<uint16_t> acc((size_t)w * h, 0);
  std::vector<std::pair<float, int>> xs;
  for (int sy = 0; sy < h * SS; ++sy) {
    float y = (sy + 0.5f) / SS;
    xs.clear();
    for (const Edge& e : edges) {
      float y0 = e.y0, y1 = e.y1;
      int dir = 1;
      float x0 = e.x0, x1 = e.x1;
      if (y0 > y1) { std::swap(y0, y1); std::swap(x0, x1); dir = -1; }
      if (y < y0 || y >= y1) continue;
      float t = (y - y0) / (y1 - y0);
      xs.push_back({x0 + t * (x1 - x0), dir});
    }
    if (xs.empty()) continue;
    std::sort(xs.begin(), xs.end());
    int wind = 0;
    for (size_t k = 0; k < xs.size(); ++k) {
      int prev_w = wind;
      wind += xs[k].second;
      if (prev_w == 0 && wind != 0 && k + 1 < xs.size()) {
        // find span end: next crossing where winding returns to 0
        float xa = xs[k].first;
        int ww = wind;
        size_t j = k + 1;
        while (j < xs.size() && ww != 0) { ww += xs[j].second; ++j; }
        float xb = xs[j - 1].first;
        // accumulate horizontal subsample coverage on row sy/SS
        int row = sy / SS;
        float sxa = xa * SS, sxb = xb * SS;
        int ia = (int)std::floor(sxa + 0.5f), ib = (int)std::floor(sxb + 0.5f);
        ia = std::max(ia, 0);
        ib = std::min(ib, w * SS);
        for (int sx = ia; sx < ib; ++sx) acc[(size_t)row * w + sx / SS]++;
        wind = ww;
        k = j - 1;
      }
    }
  }
  for (size_t i = 0; i < acc.size(); ++i) {
    int v = acc[i] * 255 / (SS * SS);
    out[i] = (uint8_t)(v > 255 ? 255 : v);
  }
}

}  // namespace

extern "C" {

// Bake chars [first_char, first_char+count) at pixel_height into an aw x ah
// u8 atlas (cleared to 0).  out_glyphs: count * 9 floats per glyph =
// {u0, v0, u1, v1, size_x, size_y, xoff, yoff, advance} -- the reference's
// FDebugPrintGlyph record (DebugPrintFont.cpp:80-93).  Returns 0 on success,
// <0 on parse failure, >0 = number of glyphs that did not fit.
int ttf_bake(const uint8_t* font_data, int64_t font_len, float pixel_height,
             uint8_t* atlas, int aw, int ah, int first_char, int count,
             float* out_glyphs) {
  Font f;
  f.r = {font_data, font_len};
  if (!f.parse()) return -1;
  float scale = pixel_height / (float)(f.ascent - f.descent);
  std::memset(atlas, 0, (size_t)aw * ah);
  int pen_x = 1, pen_y = 1, row_h = 0, missed = 0;
  for (int ci = 0; ci < count; ++ci) {
    float* g = out_glyphs + (int64_t)ci * 9;
    std::memset(g, 0, 9 * sizeof(float));
    int gid = f.glyph_index(first_char + ci);
    g[8] = f.advance(gid) * scale;
    std::vector<std::vector<Pt>> contours;
    float m[6] = {scale, 0, 0, -scale, 0, 0};  // y-down pixel space
    if (!f.outline(gid, m, contours, 0) || contours.empty()) continue;
    // pixel bbox
    float fx0 = 1e9f, fy0 = 1e9f, fx1 = -1e9f, fy1 = -1e9f;
    for (auto& c : contours)
      for (auto& p : c) {
        fx0 = std::min(fx0, p.x); fy0 = std::min(fy0, p.y);
        fx1 = std::max(fx1, p.x); fy1 = std::max(fy1, p.y);
      }
    int ix0 = (int)std::floor(fx0), iy0 = (int)std::floor(fy0);
    int gw = (int)std::ceil(fx1) - ix0 + 1, gh = (int)std::ceil(fy1) - iy0 + 1;
    if (gw <= 0 || gh <= 0) continue;
    std::vector<Edge> edges;
    for (auto& c : contours) {
      std::vector<Pt> shifted = c;
      for (auto& p : shifted) { p.x -= ix0; p.y -= iy0; }
      flatten(shifted, edges);
    }
    std::vector<uint8_t> bmp((size_t)gw * gh, 0);
    fill(edges, bmp.data(), gw, gh);
    // row-pack into the atlas; a glyph wider than the whole row (malformed
    // font or huge pixel_height) can never fit -- skip it, don't overrun
    if (gw + 2 > aw) { ++missed; continue; }
    if (pen_x + gw + 1 > aw) { pen_x = 1; pen_y += row_h + 1; row_h = 0; }
    if (pen_y + gh + 1 > ah) { ++missed; continue; }
    for (int yy = 0; yy < gh; ++yy)
      std::memcpy(atlas + (size_t)(pen_y + yy) * aw + pen_x,
                  bmp.data() + (size_t)yy * gw, gw);
    row_h = std::max(row_h, gh);
    g[0] = pen_x / (float)aw;
    g[1] = pen_y / (float)ah;
    g[2] = (pen_x + gw) / (float)aw;
    g[3] = (pen_y + gh) / (float)ah;
    g[4] = (float)gw;
    g[5] = (float)gh;
    g[6] = (float)ix0;
    g[7] = (float)iy0;
    pen_x += gw + 1;
  }
  return missed;
}

}  // extern "C"
