// Native CPU engine for smolscale-tpu: planner + row engine + threaded
// batch executor.
//
// This is the framework's host-side production path (preprocessing, CPU
// fallback, oracle-grade reference), exposing the same one-shot / row-batch
// semantics as the TPU backends and producing byte-identical output.  It is
// a clean-room implementation of the per-channel semantic model specified
// in smolscale_tpu/backends/numpy_ref.py (itself validated bit-exact
// against the upstream C library's generic backend); the architecture is
// per-channel int32 planes with int64 accumulators -- not the upstream's
// packed-u64 SWAR rows.
//
// Behavior provenance is cited against the upstream where the numeric
// contract originates (smolscale.c / smolscale-generic.c line refs).
//
// Build: g++ -O3 -fPIC -shared smolscale_cpu.cpp -o libsmolscale_cpu.so
// (tables.inc is generated from the Python LUT module by gen_tables.py).

#include <cassert>
#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <algorithm>
#include <type_traits>
#include <thread>
#include <vector>

#if defined(__AVX2__)
#include <immintrin.h>
#endif

#include "tables.inc"

namespace {

enum Filter { F_COPY, F_ONE, F_BILIN, F_BOX };
enum Storage { S64, S128 };
enum Alpha { A_UNASSOC, A_PREMUL8, A_PREMUL16 };
enum Gamma { G_COMPRESSED, G_LINEAR };

// Byte-order channel layouts per public pixel type (0..9); channel ids:
// 0,1,2 = colors canonical, 3 = alpha.  Mirrors smolscale_tpu.formats.
static const int kLayout[10][4] = {
    {0, 1, 2, 3},  // RGBA premul
    {2, 1, 0, 3},  // BGRA premul
    {3, 0, 1, 2},  // ARGB premul
    {3, 2, 1, 0},  // ABGR premul
    {0, 1, 2, 3},  // RGBA unassoc
    {2, 1, 0, 3},  // BGRA unassoc
    {3, 0, 1, 2},  // ARGB unassoc
    {3, 2, 1, 0},  // ABGR unassoc
    {0, 1, 2, -1}, // RGB8
    {2, 1, 0, -1}, // BGR8
};
static inline int n_bytes_of(int t) { return t >= 8 ? 3 : 4; }
static inline Alpha alpha_of(int t) {
  return (t >= 4 && t < 8) ? A_UNASSOC : A_PREMUL8;
}

// ---- fixed-point primitives (contract: smolscale-generic.c:185-318) -------
static inline int64_t premul_p8(int64_t v, int64_t a) {
  return (((v + 1) * (a + 1) - 1) >> 8) & 0xff;
}
static inline int64_t unpremul_p8(int64_t v, int64_t a) {
  return ((v * kInvDivP8[a]) >> 13) & 0xff;
}
static inline int64_t premul_p8l(int64_t l, int64_t a) {
  return (((l + 1) * ((a << 3) + 1) - 1) >> 11) & 0x7ff;
}
static inline int64_t unpremul_p8l(int64_t v, int64_t a) {
  return ((v * kInvDivP8L[a]) >> 10) & 0x7ff;
}
static inline int64_t unpremul_p16(int64_t v, int64_t a) {
  return ((v * kInvDivP16[a]) >> 16) & 0xff;
}
static inline int64_t unpremul_p16l(int64_t v, int64_t a) {
  return ((v * kInvDivP16L[a]) >> 19) & 0x7ff;
}
template <typename T>
static inline T lerp256(T p, T q, T f, T mask) {
  // generic.c:1317; int32 is safe for 64bpp values (|p-q|*f < 2**24)
  return ((((p - q) * f) >> 8) + q) & mask;
}
template <typename T>
static inline T weight256(T v, T w, T mask) {
  return ((v * w) >> 8) & mask;  // generic.c:1177-1192
}
template <typename T>
static inline int64_t zext(T v) {
  // zero-extend: S128 accumulators run mod 2**32 in int32 lanes (true
  // values < 2**32, the reference's own lane bound: smolscale.c:760-770,
  // generic.c:2248), recovered exactly by unsigned reinterpretation
  return (int64_t)(uint64_t)(typename std::make_unsigned<T>::type)v;
}
static inline int64_t scale_span(int64_t acc, int64_t mul, Storage st) {
  // generic.c:1231-1261; the product needs up to 2**41 bits, so this takes
  // int64 even when the row pipeline runs in int32.
  int64_t v = (acc * mul + (1ll << 23)) >> 24;
  return v & (st == S64 ? 0xff : 0xffff);
}

#if defined(__AVX2__)
// i32-expanded LUT copies for vpgatherdd / vpbroadcastd (1 KB each,
// L1-resident; built once at load)
static const struct Tab32 {
  int32_t from_srgb[256];
  int32_t inv_p8[256];
  int32_t inv_p8l[256];
  int32_t to_srgb[2048];
  Tab32() {
    for (int i = 0; i < 256; i++) {
      from_srgb[i] = kFromSrgb[i];
      inv_p8[i] = (int32_t)kInvDivP8[i];
      inv_p8l[i] = (int32_t)kInvDivP8L[i];
    }
    for (int i = 0; i < 2048; i++) to_srgb[i] = kToSrgb[i];
  }
} kT32;
#endif

// ---- plan ------------------------------------------------------------------
struct AxisPlan {
  int dim_in = 0, dim_out = 0;
  Filter filter = F_COPY;
  int halvings = 0, dim_bilin = 0;
  std::vector<int32_t> off;    // bilinear: per-sample abs offset; box: span starts (dim_out+1)
  std::vector<int32_t> fac;    // bilinear factor / box right fraction
  std::vector<int32_t> stride; // box: whole pixels per span (relative walk)
  std::vector<uint16_t> fac16; // H bilinear: fac[s] repeated 8x (one u16
                               // SIMD lerp operand per sample, loaded not
                               // rebuilt per pixel); x-axis only
  std::vector<uint16_t> fac4;  // fac[s] repeated 4x: compact factor row for
                               // the stride-1 run fast path (4 samples per
                               // 256-bit lerp)
  std::vector<uint16_t> fac16q;  // quad-order factor row for the 4-sample
                                 // batch lerp: per quad k, [f(k),f(k+2),
                                 // f(k+1),f(k+3)] each repeated 4x -- the
                                 // lane order 64-bit unpacks produce, so
                                 // one permute4x64 after the lerp restores
                                 // output order
  std::vector<uint8_t> run4;   // run4[s]=1 iff off[s+i]==off[s]+i for
                               // i=1..3: samples s..s+3 read one contiguous
                               // 5-pixel window (near-1:1 scales and the
                               // d<2 stretches of non-integer ladders)
  bool run4_any = false;       // hoisted loop-variant select: integer-ratio
                               // ladders have no stride-1 runs and keep the
                               // branch-free pair loop
  std::vector<int32_t> fac4i;  // fac[s] repeated 4x at i32 width (S128 rows:
                               // 4 i32 lanes per pixel, 2 outputs per
                               // 256-bit lerp)
  std::vector<uint8_t> run2;   // run2[s]=1 iff off[s+1]==off[s]+1 (the S128
                               // stride-1 pair condition)
  bool run2_any = false;
  bool lerp_stride2 = false;   // every even/odd sample pair sits at
                               // off[k]+2 (integer-ratio ladders): one
                               // 256-bit load covers both endpoint pairs
  uint32_t span_mul = 0;
};

struct Plan {
  int w_in, h_in, w_out, h_out;
  int type_in, type_out;
  bool with_srgb;
  AxisPlan x, y;
  Storage storage;
  Alpha ialpha;
  Gamma gamma;
  bool pack24_direct = false;
  bool fuse_h = false;  // unpack fused into the H loads (S64
                        // premul-identity bilinear; see hfilter_row_fused_u16)
  bool narrow16 = false;  // S128 plan runs on u16 rows (lerp16_wide): every
                          // true intermediate fits u16, halving memory
                          // traffic and doubling SIMD density vs int32
  int nb_in, nb_out;
  const int *lin, *lout;
  int64_t mask() const { return storage == S64 ? 0xff : 0xffffff; }
};

// pick_filter_params contract (smolscale.c:427-478)
static void pick_filter(int64_t dim_in, int64_t dim_out, bool srgb, AxisPlan *ap,
                        Storage *st) {
  *st = srgb ? S128 : S64;
  ap->dim_in = (int)dim_in;
  ap->dim_out = (int)dim_out;
  ap->dim_bilin = (int)dim_out;
  if (dim_in > dim_out * 255) {
    ap->filter = F_BOX;
    *st = S128;
  } else if (dim_in > dim_out * 8) {
    ap->filter = F_BOX;
  } else if (dim_in == 1) {
    ap->filter = F_ONE;
  } else if (dim_in == dim_out) {
    ap->filter = F_COPY;
  } else {
    int n = 0;
    int64_t d = dim_out;
    for (;;) {
      d *= 2;
      if (d >= dim_in) break;
      n++;
    }
    ap->filter = F_BILIN;
    ap->halvings = n;
    ap->dim_bilin = (int)(dim_out << n);
  }
}

// precalc contracts (smolscale-generic.c:14-135)
static void precalc_bilinear(AxisPlan *ap) {
  const uint64_t BIG = 1ull << 32;
  int64_t dim_in = ap->dim_in, dim_out = ap->dim_bilin;
  uint64_t step, frac;
  if (dim_in > dim_out) {
    step = (uint64_t)dim_in * BIG / (uint64_t)dim_out;
    frac = (step - BIG) / 2;
  } else {
    step = (uint64_t)(dim_in - 1) * BIG / (uint64_t)(dim_out > 1 ? dim_out - 1 : 1);
    frac = 0;
  }
  ap->off.resize(dim_out);
  ap->fac.resize(dim_out);
  int64_t j = 0;
  while (j < dim_out) {
    uint64_t ofs = frac / BIG;
    if ((int64_t)ofs >= dim_in - 1) break;
    ap->off[j] = (int32_t)ofs;
    ap->fac[j] = (int32_t)(256 - ((frac / (BIG / 256)) % 256));
    frac += step;
    j++;
  }
  for (; j < dim_out; j++) {
    ap->off[j] = (int32_t)(dim_in - 2);
    ap->fac[j] = 0;
  }
}

static void precalc_boxes(AxisPlan *ap) {
  int64_t dim_in = ap->dim_in, dim_out = ap->dim_out;
  uint64_t step = (uint64_t)dim_in * 65536ull / (uint64_t)dim_out;
  uint64_t stride0 = step / 65536ull;
  uint64_t f0 = (step / 256ull) % 256ull;
  uint64_t a = (1ull << 24) * 255ull;
  uint64_t b = stride0 * 255ull + (f0 * 255ull) / 256ull;
  ap->span_mul = (uint32_t)((a + b / 2) / b);

  ap->off.assign(dim_out + 1, 0);
  ap->fac.assign(dim_out, 0);
  ap->stride.assign(dim_out, 0);
  uint64_t frac = 0;
  int64_t ofs = 0, j = 0;
  while (j < dim_out) {
    frac += step;
    int64_t next_ofs = (int64_t)(frac / 65536ull);
    if (ofs >= dim_in - 1) {
      ofs = dim_in - 1;
      break;
    }
    if (next_ofs > dim_in - 1) {
      next_ofs = dim_in - 1;
      if (next_ofs <= ofs) break;
    }
    ap->off[j] = (int32_t)ofs;
    ap->stride[j] = (int32_t)(next_ofs - ofs - 1);
    ap->fac[j] = (int32_t)((frac / 256ull) % 256ull);
    ofs = next_ofs;
    j++;
  }
  for (; j < dim_out; j++) {
    ap->off[j] = (int32_t)ofs;
    ap->fac[j] = 0;
    ap->stride[j] = 0;
  }
  ap->off[dim_out] = (int32_t)ofs;
}

static bool mid_colors_reversed(int type_in) {
  const int *l = kLayout[type_in];
  int colors[3];
  int k = 0;
  if (n_bytes_of(type_in) == 4) {
    for (int i = 3; i >= 0; i--)
      if (l[i] != 3) colors[k++] = l[i];
  } else {
    for (int i = 0; i < 3; i++) colors[k++] = l[i];
  }
  return colors[0] > colors[2];
}

}  // namespace

extern "C" {

struct sst_plan : public Plan {};

sst_plan *sst_plan_new(int w_in, int h_in, int w_out, int h_out, int type_in,
                       int type_out, int with_srgb) {
  if (w_in < 1 || h_in < 1 || w_out < 1 || h_out < 1 || w_in > 65535 ||
      h_in > 65535 || w_out > 65535 || h_out > 65535 || type_in < 0 ||
      type_in > 9 || type_out < 0 || type_out > 9)
    return nullptr;
  sst_plan *p = new sst_plan();
  p->w_in = w_in; p->h_in = h_in; p->w_out = w_out; p->h_out = h_out;
  p->type_in = type_in; p->type_out = type_out; p->with_srgb = with_srgb != 0;
  p->nb_in = n_bytes_of(type_in);
  p->nb_out = n_bytes_of(type_out);
  p->lin = kLayout[type_in];
  p->lout = kLayout[type_out];

  Storage sx, sy;
  pick_filter(w_in, w_out, p->with_srgb, &p->x, &sx);
  pick_filter(h_in, h_out, p->with_srgb, &p->y, &sy);
  p->storage = (sx == S128 || sy == S128) ? S128 : S64;

  p->ialpha = A_PREMUL8;
  if (alpha_of(type_in) == A_UNASSOC && alpha_of(type_out) == A_UNASSOC) {
    p->ialpha = A_PREMUL16;  // smolscale.c:751-758
    p->storage = S128;
  }
  p->gamma = p->with_srgb ? G_LINEAR : G_COMPRESSED;
  if ((int64_t)w_in > (int64_t)w_out * 8191 ||
      (int64_t)h_in > (int64_t)h_out * 8191)
    p->gamma = G_COMPRESSED;  // smolscale.c:760-770

  if (p->x.filter == F_BILIN) {
    precalc_bilinear(&p->x);
    p->x.fac16.resize(8 * p->x.fac.size());
    for (size_t s = 0; s < p->x.fac.size(); s++)
      for (int l = 0; l < 8; l++)
        p->x.fac16[8 * s + l] = (uint16_t)p->x.fac[s];
    p->x.lerp_stride2 = true;  // even-ratio plans, any halving count
    for (size_t k = 0; k + 2 <= p->x.off.size(); k += 2)
      if (p->x.off[k + 1] != p->x.off[k] + 2) {
        p->x.lerp_stride2 = false;
        break;
      }
    const size_t ns = p->x.off.size();
    p->x.fac4.resize(4 * ns);
    for (size_t s = 0; s < ns; s++)
      for (int l = 0; l < 4; l++)
        p->x.fac4[4 * s + l] = (uint16_t)p->x.fac[s];
    p->x.fac16q.resize(4 * (ns & ~size_t(3)));
    for (size_t k = 0; k + 4 <= ns; k += 4) {
      static const int ord[4] = {0, 2, 1, 3};
      for (int i = 0; i < 4; i++)
        for (int l = 0; l < 4; l++)
          p->x.fac16q[4 * k + 4 * i + l] = (uint16_t)p->x.fac[k + ord[i]];
    }
    p->x.run4.assign(ns, 0);
    for (size_t s = 0; s + 4 <= ns; s++) {
      p->x.run4[s] = p->x.off[s + 1] == p->x.off[s] + 1 &&
                     p->x.off[s + 2] == p->x.off[s] + 2 &&
                     p->x.off[s + 3] == p->x.off[s] + 3;
      p->x.run4_any |= p->x.run4[s] != 0;
    }
    if (p->storage == S128) {
      p->x.fac4i.resize(4 * ns);
      for (size_t s = 0; s < ns; s++)
        for (int l = 0; l < 4; l++) p->x.fac4i[4 * s + l] = p->x.fac[s];
      p->x.run2.assign(ns, 0);
      for (size_t s = 0; s + 2 <= ns; s++) {
        p->x.run2[s] = p->x.off[s + 1] == p->x.off[s] + 1;
        p->x.run2_any |= p->x.run2[s] != 0;
      }
    }
  }
  if (p->x.filter == F_BOX) precalc_boxes(&p->x);
  if (p->y.filter == F_BILIN) precalc_bilinear(&p->y);
  if (p->y.filter == F_BOX) precalc_boxes(&p->y);

  if (p->nb_out == 3 && p->gamma == G_LINEAR && p->ialpha == A_PREMUL8) {
    bool out_rev = p->lout[0] > p->lout[2];
    p->pack24_direct = mid_colors_reversed(type_in) == out_rev;
  }
  // unpack-into-H fusion: identity unpack (premul8 4B in, compressed
  // gamma, S64) + a 0h bilinear whose loads stay 256-bit-wide from the
  // u8 row (even-ratio single-load pairs or stride-1 runs covering most
  // outputs).  Measured: 1.25-1.36x on 2:1 and near-1:1 plans; ladders
  // and gap-heavy mixed-stride plans break even or regress (the px2
  // shuffle+widen cancels the saved unpack pass), so they keep the
  // separate unpack.
  if (p->storage == S64 && p->ialpha == A_PREMUL8 &&
      p->gamma == G_COMPRESSED && p->nb_in == 4 &&
      alpha_of(type_in) == A_PREMUL8) {
    if (p->x.filter == F_BILIN && p->x.halvings == 0) {
      size_t covered = 0;
      for (size_t s = 0; s < p->x.run4.size(); s++)
        if (p->x.run4[s]) covered += 4;
      p->fuse_h = p->x.lerp_stride2 ||
                  covered * 2 >= p->x.run4.size() ||  // >=50% run4 coverage
                  w_out < w_in;  // mixed-stride downscales: the 4-output
                                 // P/Q-quad batch made fusion win (8K rows
                                 // outgrow L1; the u16 round trip was the
                                 // loss vs the reference AVX2 at x0.75)
      // measured and NOT taken: fusing upscales (vpgatherqq pair gather OR
      // single-cvt pairs) -- they regress 13-23% (the once-per-input-pixel
      // unpack amortizes better than per-output widening when w_out > w_in)
    }
    if (p->x.filter == F_BILIN && p->x.halvings == 1 && p->x.lerp_stride2)
      p->fuse_h = true;  // fused even-ratio 1h ladder (4:1 class)
    if (p->x.filter == F_BOX)
      p->fuse_h = true;  // fused box span walk (direct source loads)
    // F_BOX fusion measured par-to-slower here (the span walk's serial
    // accumulate chain eats the DRAM load latency the separate unpack
    // sweep hides), so box plans keep unpack_row + hfilter_row.
  }
  // narrow16: S128 bilinear/copy/one plans whose true intermediates all fit
  // u16 run on uint16 rows with the borrow-corrected lerp16_wide.  Bounds:
  //  - PREMUL16 compressed: values <= 65408, so ladder sums overflow u16 ->
  //    0 halvings only (conv/near-1:1/upscale plans).
  //  - PREMUL8 linear-light: colors <= 2047, alpha <= 255; halvings <= 2 by
  //    pick_filter (>8:1 goes box), so ladder sums <= 4*2047 always fit.
  //  - PREMUL16 linear (unassoc<->unassoc with sRGB): colors c*a <= 521985
  //    exceed u16, stay on int32.
  // Box is excluded: span accumulators reach 24 bits (mask() = 0xffffff).
  if (p->storage == S128 && p->x.filter != F_BOX && p->y.filter != F_BOX) {
    if (p->ialpha == A_PREMUL16 && p->gamma == G_COMPRESSED)
      // 1-halving ladders fold with the carry-free floor average
      // (avg_floor_u16); >=2 halvings would need true 18-bit sums
      p->narrow16 = p->x.halvings <= 1 && p->y.halvings <= 1;
    else if (p->ialpha == A_PREMUL8 && p->gamma == G_LINEAR)
      p->narrow16 = true;
  }
  return p;
}

void sst_plan_free(sst_plan *p) { delete p; }

}  // extern "C"

namespace {

// Per-worker scratch: unpacked input row + h-scaled rows + accumulators.
// T = uint16_t for 64bpp storage: every S64 intermediate is exact mod
// 2**16 -- box accumulators reach at most 255 + 254*255 + 255 = 65280
// (spans past 255:1 switch to 128bpp, smolscale.c:437), ladder sums
// <= 64*255, and the lerp's masked low byte is sign-independent (bits
// 8..15 of (p-q)*F).  Halves row traffic and doubles SIMD width vs the
// int32 rows used through round 1.  T = int64_t for 128bpp.
template <typename T>
struct Worker {
  const Plan *p;
  std::vector<T> unp;      // 4 * w_in
  std::vector<T> hrow[2];  // 4 * w_out, bilinear cache / box edges
  int hrow_idx[2] = {-1, -1};
  std::vector<T> tmp;      // 4 * w_out
  std::vector<T> acc;      // 4 * w_out

  explicit Worker(const Plan *plan) : p(plan) {
    unp.resize(4 * (size_t)p->w_in);
    hrow[0].resize(4 * (size_t)p->w_out);
    hrow[1].resize(4 * (size_t)p->w_out);
    tmp.resize(4 * (size_t)p->w_out);
    acc.resize(4 * (size_t)p->w_out);
  }
};

// ---- elementwise row helpers (the V stage's hot loops) --------------------
// uint16_t arithmetic in C promotes to int, so the plain loops vectorize at
// 32-bit lane width at best; these AVX2 forms keep 16 u16 lanes per op.
// Exactness: identical to the reference arithmetic mod 2**16 -- lerp's low
// 8 bits live in bits 8..15 of (p-q)*F regardless of sign (same argument as
// the H kernel above), weight products are <= 255*256 < 2**16, and ladder /
// box accumulators stay <= 65280.
#if defined(__AVX2__)
static inline void row_lerp_u16(const uint16_t *top, const uint16_t *bot,
                                uint16_t f, uint16_t *dst, int n) {
  const __m256i vf = _mm256_set1_epi16((short)f);
  const __m256i m8 = _mm256_set1_epi16(0xff);
  int x = 0;
  for (; x + 16 <= n; x += 16) {
    const __m256i p = _mm256_loadu_si256((const __m256i *)(top + x));
    const __m256i q = _mm256_loadu_si256((const __m256i *)(bot + x));
    const __m256i r = _mm256_add_epi16(
        _mm256_srli_epi16(_mm256_mullo_epi16(_mm256_sub_epi16(p, q), vf), 8),
        q);
    _mm256_storeu_si256((__m256i *)(dst + x), _mm256_and_si256(r, m8));
  }
  for (; x < n; x++)
    dst[x] = (uint16_t)((((int32_t)(uint16_t)(top[x] - bot[x]) * f) >> 8) +
                        bot[x]) & 0xff;
}
// Wide-mask (S128 narrow16 mode) u16 lerp: computes
//   (((p - q) * f) >> 8) + q  (mod 2**16)
// exactly for TRUE values p, q in [0, 65535], f in [0, 256].  The mod-2**16
// diff dm = p - q relates to the true diff d by d = dm - 2**16 * borrow
// (borrow = q > p), so
//   floor(d*f / 256) = ((dm*f) >> 8) - borrow * (f << 8)   (mod 2**16),
// where (dm*f) >> 8 is bits 8..23 of the u24 product, i.e.
// (mullo >> 8) | (mulhi << 8).  All narrow16-eligible values are <= 65408
// (premul16: c*a <= 65025, alpha (a<<8)|0x80 <= 65408; linear-light
// premul8: <= 2047), and the lerp is convex, so results never leave u16 and
// the reference's & 0xffffff mask is a no-op.
static inline __m256i lerp16_wide(__m256i p, __m256i q, __m256i f) {
  const __m256i dm = _mm256_sub_epi16(p, q);
  const __m256i pr = _mm256_or_si256(
      _mm256_srli_epi16(_mm256_mullo_epi16(dm, f), 8),
      _mm256_slli_epi16(_mm256_mulhi_epu16(dm, f), 8));
  const __m256i nb = _mm256_cmpeq_epi16(_mm256_max_epu16(p, q), p);
  const __m256i corr = _mm256_andnot_si256(nb, _mm256_slli_epi16(f, 8));
  return _mm256_add_epi16(_mm256_sub_epi16(pr, corr), q);
}
// exact (a + b) >> 1 for u16 lanes WITHOUT the 17-bit sum: avg_epu16 rounds
// up ((a+b+1)>>1), so subtracting the carry bit (a^b)&1 restores the floor.
// Lets narrow16 PREMUL16 plans (values <= 65408) run 1-halving ladders.
static inline __m256i avg_floor_u16(__m256i a, __m256i b) {
  return _mm256_sub_epi16(
      _mm256_avg_epu16(a, b),
      _mm256_and_si256(_mm256_xor_si256(a, b), _mm256_set1_epi16(1)));
}
static inline __m128i avg_floor_u16_128(__m128i a, __m128i b) {
  return _mm_sub_epi16(
      _mm_avg_epu16(a, b),
      _mm_and_si128(_mm_xor_si128(a, b), _mm_set1_epi16(1)));
}
static inline __m128i lerp16_wide128(__m128i p, __m128i q, __m128i f) {
  const __m128i dm = _mm_sub_epi16(p, q);
  const __m128i pr = _mm_or_si128(
      _mm_srli_epi16(_mm_mullo_epi16(dm, f), 8),
      _mm_slli_epi16(_mm_mulhi_epu16(dm, f), 8));
  const __m128i nb = _mm_cmpeq_epi16(_mm_max_epu16(p, q), p);
  const __m128i corr = _mm_andnot_si128(nb, _mm_slli_epi16(f, 8));
  return _mm_add_epi16(_mm_sub_epi16(pr, corr), q);
}
static inline void row_lerp_u16w(const uint16_t *top, const uint16_t *bot,
                                 uint16_t f, uint16_t *dst, int n) {
  const __m256i vf = _mm256_set1_epi16((short)f);
  int x = 0;
  for (; x + 16 <= n; x += 16) {
    const __m256i p = _mm256_loadu_si256((const __m256i *)(top + x));
    const __m256i q = _mm256_loadu_si256((const __m256i *)(bot + x));
    _mm256_storeu_si256((__m256i *)(dst + x), lerp16_wide(p, q, vf));
  }
  for (; x < n; x++)
    dst[x] = (uint16_t)(((((int32_t)top[x] - bot[x]) * f) >> 8) + bot[x]);
}
static inline void row_lerp_acc_u16w(const uint16_t *top, const uint16_t *bot,
                                     uint16_t f, uint16_t *acc, int n) {
  const __m256i vf = _mm256_set1_epi16((short)f);
  int x = 0;
  for (; x + 16 <= n; x += 16) {
    const __m256i p = _mm256_loadu_si256((const __m256i *)(top + x));
    const __m256i q = _mm256_loadu_si256((const __m256i *)(bot + x));
    const __m256i a = _mm256_loadu_si256((const __m256i *)(acc + x));
    _mm256_storeu_si256((__m256i *)(acc + x),
                        _mm256_add_epi16(a, lerp16_wide(p, q, vf)));
  }
  for (; x < n; x++)
    acc[x] += (uint16_t)(((((int32_t)top[x] - bot[x]) * f) >> 8) + bot[x]);
}
// narrow16 1h V ladder, second sample: dst = floor((dst + lerp(top,bot,f))/2)
// -- avg_floor keeps the 17-bit sum out of the lanes (PREMUL16 values)
static inline void row_lerp_avg_u16w(const uint16_t *top, const uint16_t *bot,
                                     uint16_t f, uint16_t *dst, int n) {
  const __m256i vf = _mm256_set1_epi16((short)f);
  int x = 0;
  for (; x + 16 <= n; x += 16) {
    const __m256i p = _mm256_loadu_si256((const __m256i *)(top + x));
    const __m256i q = _mm256_loadu_si256((const __m256i *)(bot + x));
    const __m256i d0 = _mm256_loadu_si256((const __m256i *)(dst + x));
    _mm256_storeu_si256((__m256i *)(dst + x),
                        avg_floor_u16(d0, lerp16_wide(p, q, vf)));
  }
  for (; x < n; x++) {
    const uint32_t r =
        (uint16_t)(((((int32_t)top[x] - bot[x]) * f) >> 8) + bot[x]);
    dst[x] = (uint16_t)(((uint32_t)dst[x] + r) >> 1);
  }
}
static inline void row_shift_u16w(const uint16_t *acc, int sh, uint16_t *dst,
                                  int n) {
  int x = 0;
  for (; x + 16 <= n; x += 16)
    _mm256_storeu_si256(
        (__m256i *)(dst + x),
        _mm256_srli_epi16(_mm256_loadu_si256((const __m256i *)(acc + x)), sh));
  for (; x < n; x++) dst[x] = (uint16_t)(acc[x] >> sh);
}
// fused V lerp + premul pack (S64 n==0 bilinear V, compressed premul8 out,
// 4 bytes/px): lerps 4 px per iteration and narrows straight to output
// bytes -- skips the tmp u16 row round trip (60 KB of L2 traffic per row)
static inline void row_lerp_pack_u16(const uint16_t *top, const uint16_t *bot,
                                     uint16_t f, const int *lout,
                                     uint8_t *dst, int w) {
  const int l0 = lout[0], l1 = lout[1], l2 = lout[2], l3 = lout[3];
  const __m128i shuf = _mm_setr_epi8(
      (char)l0, (char)l1, (char)l2, (char)l3,
      (char)(4 + l0), (char)(4 + l1), (char)(4 + l2), (char)(4 + l3),
      (char)(8 + l0), (char)(8 + l1), (char)(8 + l2), (char)(8 + l3),
      (char)(12 + l0), (char)(12 + l1), (char)(12 + l2), (char)(12 + l3));
  const __m256i vf = _mm256_set1_epi16((short)f);
  const __m256i m8 = _mm256_set1_epi16(0xff);
  int j = 0;
  for (; j + 4 <= w; j += 4) {
    const __m256i p = _mm256_loadu_si256((const __m256i *)(top + 4 * j));
    const __m256i q = _mm256_loadu_si256((const __m256i *)(bot + 4 * j));
    const __m256i r = _mm256_and_si256(
        _mm256_add_epi16(
            _mm256_srli_epi16(_mm256_mullo_epi16(_mm256_sub_epi16(p, q), vf),
                              8),
            q),
        m8);
    const __m128i bytes = _mm_packus_epi16(_mm256_castsi256_si128(r),
                                           _mm256_extracti128_si256(r, 1));
    _mm_storeu_si128((__m128i *)(dst + 4 * j), _mm_shuffle_epi8(bytes, shuf));
  }
  for (; j < w; j++) {
    uint8_t px[4];
    for (int c = 0; c < 4; c++) {
      const int x = 4 * j + c;
      px[c] = (uint8_t)(((((int32_t)(uint16_t)(top[x] - bot[x]) * f) >> 8) +
                         bot[x]) & 0xff);
    }
    dst[4 * j + 0] = px[l0]; dst[4 * j + 1] = px[l1];
    dst[4 * j + 2] = px[l2]; dst[4 * j + 3] = px[l3];
  }
}
// fused ladder finale + premul pack: (acc >> n) & 0xff straight to bytes
static inline void row_shift_pack_u16(const uint16_t *acc, int sh,
                                      const int *lout, uint8_t *dst, int w) {
  const int l0 = lout[0], l1 = lout[1], l2 = lout[2], l3 = lout[3];
  const __m128i shuf = _mm_setr_epi8(
      (char)l0, (char)l1, (char)l2, (char)l3,
      (char)(4 + l0), (char)(4 + l1), (char)(4 + l2), (char)(4 + l3),
      (char)(8 + l0), (char)(8 + l1), (char)(8 + l2), (char)(8 + l3),
      (char)(12 + l0), (char)(12 + l1), (char)(12 + l2), (char)(12 + l3));
  const __m256i m8 = _mm256_set1_epi16(0xff);
  int j = 0;
  for (; j + 4 <= w; j += 4) {
    const __m256i r = _mm256_and_si256(
        _mm256_srli_epi16(
            _mm256_loadu_si256((const __m256i *)(acc + 4 * j)), sh),
        m8);
    const __m128i bytes = _mm_packus_epi16(_mm256_castsi256_si128(r),
                                           _mm256_extracti128_si256(r, 1));
    _mm_storeu_si128((__m128i *)(dst + 4 * j), _mm_shuffle_epi8(bytes, shuf));
  }
  for (; j < w; j++) {
    uint8_t px[4];
    for (int c = 0; c < 4; c++)
      px[c] = (uint8_t)((acc[4 * j + c] >> sh) & 0xff);
    dst[4 * j + 0] = px[l0]; dst[4 * j + 1] = px[l1];
    dst[4 * j + 2] = px[l2]; dst[4 * j + 3] = px[l3];
  }
}
static inline void row_lerp_acc_u16(const uint16_t *top, const uint16_t *bot,
                                    uint16_t f, uint16_t *acc, int n) {
  const __m256i vf = _mm256_set1_epi16((short)f);
  const __m256i m8 = _mm256_set1_epi16(0xff);
  int x = 0;
  for (; x + 16 <= n; x += 16) {
    const __m256i p = _mm256_loadu_si256((const __m256i *)(top + x));
    const __m256i q = _mm256_loadu_si256((const __m256i *)(bot + x));
    const __m256i r = _mm256_add_epi16(
        _mm256_srli_epi16(_mm256_mullo_epi16(_mm256_sub_epi16(p, q), vf), 8),
        q);
    const __m256i a = _mm256_loadu_si256((const __m256i *)(acc + x));
    _mm256_storeu_si256((__m256i *)(acc + x),
                        _mm256_add_epi16(a, _mm256_and_si256(r, m8)));
  }
  for (; x < n; x++)
    acc[x] += (uint16_t)((((int32_t)(uint16_t)(top[x] - bot[x]) * f) >> 8) +
                         bot[x]) & 0xff;
}
static inline void row_weight_u16(const uint16_t *src, uint16_t wgt,
                                  uint16_t *dst, int n) {
  const __m256i vw = _mm256_set1_epi16((short)wgt);
  const __m256i m8 = _mm256_set1_epi16(0xff);
  int x = 0;
  for (; x + 16 <= n; x += 16) {
    const __m256i v = _mm256_loadu_si256((const __m256i *)(src + x));
    _mm256_storeu_si256(
        (__m256i *)(dst + x),
        _mm256_and_si256(_mm256_srli_epi16(_mm256_mullo_epi16(v, vw), 8), m8));
  }
  for (; x < n; x++) dst[x] = (uint16_t)((src[x] * wgt) >> 8) & 0xff;
}
static inline void row_weight_acc_u16(const uint16_t *src, uint16_t wgt,
                                      uint16_t *acc, int n) {
  const __m256i vw = _mm256_set1_epi16((short)wgt);
  const __m256i m8 = _mm256_set1_epi16(0xff);
  int x = 0;
  for (; x + 16 <= n; x += 16) {
    const __m256i v = _mm256_loadu_si256((const __m256i *)(src + x));
    const __m256i a = _mm256_loadu_si256((const __m256i *)(acc + x));
    _mm256_storeu_si256(
        (__m256i *)(acc + x),
        _mm256_add_epi16(a, _mm256_and_si256(
            _mm256_srli_epi16(_mm256_mullo_epi16(v, vw), 8), m8)));
  }
  for (; x < n; x++) acc[x] += (uint16_t)((src[x] * wgt) >> 8) & 0xff;
}
static inline void row_add_u16(const uint16_t *src, uint16_t *acc, int n) {
  int x = 0;
  for (; x + 16 <= n; x += 16)
    _mm256_storeu_si256(
        (__m256i *)(acc + x),
        _mm256_add_epi16(_mm256_loadu_si256((const __m256i *)(acc + x)),
                         _mm256_loadu_si256((const __m256i *)(src + x))));
  for (; x < n; x++) acc[x] += src[x];
}
static inline void row_shift_mask_u16(const uint16_t *acc, int sh,
                                      uint16_t *dst, int n) {
  const __m256i m8 = _mm256_set1_epi16(0xff);
  int x = 0;
  for (; x + 16 <= n; x += 16)
    _mm256_storeu_si256(
        (__m256i *)(dst + x),
        _mm256_and_si256(
            _mm256_srli_epi16(
                _mm256_loadu_si256((const __m256i *)(acc + x)), sh),
            m8));
  for (; x < n; x++) dst[x] = (uint16_t)(acc[x] >> sh) & 0xff;
}

// 4-lane scale_span: ((acc * mul + 2**23) >> 24) & mask with the exact
// int64 product (acc < 2**32 via unsigned reinterpretation, mul < 2**24,
// product < 2**56 -- mul_epu32's u32*u32->u64 covers it).
static inline __m128i scale_span_vec4(__m128i acc_u32, uint32_t mul,
                                      uint32_t mask) {
  const __m128i vm = _mm_set1_epi32((int)mul);
  const __m128i bias = _mm_set1_epi64x(1ll << 23);
  __m128i lo = _mm_mul_epu32(acc_u32, vm);                     // lanes 0,2
  __m128i hi = _mm_mul_epu32(_mm_srli_si128(acc_u32, 4), vm);  // lanes 1,3
  lo = _mm_srli_epi64(_mm_add_epi64(lo, bias), 24);
  hi = _mm_srli_epi64(_mm_add_epi64(hi, bias), 24);
  const __m128i r = _mm_unpacklo_epi32(
      _mm_shuffle_epi32(lo, _MM_SHUFFLE(3, 1, 2, 0)),
      _mm_shuffle_epi32(hi, _MM_SHUFFLE(3, 1, 2, 0)));
  return _mm_and_si128(r, _mm_set1_epi32((int)mask));
}

// fused box finale + premul pack: scale_span straight to bytes
static inline void row_scale_span_pack_u16(const uint16_t *acc, uint32_t mul,
                                           const int *lout, uint8_t *dst,
                                           int w) {
  const int l0 = lout[0], l1 = lout[1], l2 = lout[2], l3 = lout[3];
  const __m128i shuf = _mm_setr_epi8(
      (char)l0, (char)l1, (char)l2, (char)l3,
      (char)(4 + l0), (char)(4 + l1), (char)(4 + l2), (char)(4 + l3),
      (char)(8 + l0), (char)(8 + l1), (char)(8 + l2), (char)(8 + l3),
      (char)(12 + l0), (char)(12 + l1), (char)(12 + l2), (char)(12 + l3));
  int j = 0;
  for (; j + 4 <= w; j += 4) {
    const __m128i a0 = _mm_loadu_si128((const __m128i *)(acc + 4 * j));
    const __m128i a1 = _mm_loadu_si128((const __m128i *)(acc + 4 * j + 8));
    const __m128i r0 = scale_span_vec4(_mm_cvtepu16_epi32(a0), mul, 0xff);
    const __m128i r1 = scale_span_vec4(
        _mm_cvtepu16_epi32(_mm_srli_si128(a0, 8)), mul, 0xff);
    const __m128i r2 = scale_span_vec4(_mm_cvtepu16_epi32(a1), mul, 0xff);
    const __m128i r3 = scale_span_vec4(
        _mm_cvtepu16_epi32(_mm_srli_si128(a1, 8)), mul, 0xff);
    const __m128i bytes = _mm_packus_epi16(_mm_packus_epi32(r0, r1),
                                           _mm_packus_epi32(r2, r3));
    _mm_storeu_si128((__m128i *)(dst + 4 * j), _mm_shuffle_epi8(bytes, shuf));
  }
  for (; j < w; j++) {
    uint8_t px[4];
    for (int c = 0; c < 4; c++)
      px[c] = (uint8_t)scale_span((int64_t)acc[4 * j + c], mul, S64);
    dst[4 * j + 0] = px[l0]; dst[4 * j + 1] = px[l1];
    dst[4 * j + 2] = px[l2]; dst[4 * j + 3] = px[l3];
  }
}
// 8-lane scale_span on a 256-bit i32 vector (two box spans at once):
// same exact u64-product arithmetic as scale_span_vec4
static inline __m256i scale_span_vec8(__m256i acc_u32, uint32_t mul,
                                      uint32_t mask) {
  const __m256i vm = _mm256_set1_epi32((int)mul);
  const __m256i bias = _mm256_set1_epi64x(1ll << 23);
  __m256i lo = _mm256_mul_epu32(acc_u32, vm);                     // 0,2,4,6
  __m256i hi = _mm256_mul_epu32(_mm256_srli_si256(acc_u32, 4), vm);
  lo = _mm256_srli_epi64(_mm256_add_epi64(lo, bias), 24);
  hi = _mm256_srli_epi64(_mm256_add_epi64(hi, bias), 24);
  const __m256i r = _mm256_unpacklo_epi32(
      _mm256_shuffle_epi32(lo, _MM_SHUFFLE(3, 1, 2, 0)),
      _mm256_shuffle_epi32(hi, _MM_SHUFFLE(3, 1, 2, 0)));
  return _mm256_and_si256(r, _mm256_set1_epi32((int)mask));
}

// whole-row scale_span finales (box V stage)
static inline void row_scale_span_u16(const uint16_t *acc, uint32_t mul,
                                      uint16_t *dst, int n) {
  int x = 0;
  for (; x + 8 <= n; x += 8) {
    const __m128i a = _mm_loadu_si128((const __m128i *)(acc + x));
    const __m128i r0 = scale_span_vec4(_mm_cvtepu16_epi32(a), mul, 0xff);
    const __m128i r1 = scale_span_vec4(
        _mm_cvtepu16_epi32(_mm_srli_si128(a, 8)), mul, 0xff);
    _mm_storeu_si128((__m128i *)(dst + x), _mm_packus_epi32(r0, r1));
  }
  for (; x < n; x++)
    dst[x] = (uint16_t)scale_span((int64_t)acc[x], mul, S64);
}
static inline void row_scale_span_i32(const int32_t *acc, uint32_t mul,
                                      int32_t *dst, int n) {
  int x = 0;
  for (; x + 4 <= n; x += 4)
    _mm_storeu_si128(
        (__m128i *)(dst + x),
        scale_span_vec4(_mm_loadu_si128((const __m128i *)(acc + x)), mul,
                        0xffff));
  for (; x < n; x++)
    dst[x] = (int32_t)scale_span(zext(acc[x]), mul, S128);
}

// int32 (S128) V-stage forms.  Same arithmetic as the scalar int32 loops:
// mullo wraps mod 2**32 exactly like the (documented-exact) int32 scalar
// products, shifts are arithmetic, masks applied per element.
static inline void row_lerp_i32(const int32_t *top, const int32_t *bot,
                                int32_t f, int32_t mask, int32_t *dst,
                                int n) {
  const __m256i vf = _mm256_set1_epi32(f);
  const __m256i mm = _mm256_set1_epi32(mask);
  int x = 0;
  for (; x + 8 <= n; x += 8) {
    const __m256i p = _mm256_loadu_si256((const __m256i *)(top + x));
    const __m256i q = _mm256_loadu_si256((const __m256i *)(bot + x));
    const __m256i r = _mm256_add_epi32(
        _mm256_srai_epi32(_mm256_mullo_epi32(_mm256_sub_epi32(p, q), vf), 8),
        q);
    _mm256_storeu_si256((__m256i *)(dst + x), _mm256_and_si256(r, mm));
  }
  for (; x < n; x++)
    dst[x] = ((((top[x] - bot[x]) * f) >> 8) + bot[x]) & mask;
}
static inline void row_lerp_acc_i32(const int32_t *top, const int32_t *bot,
                                    int32_t f, int32_t mask, int32_t *acc,
                                    int n) {
  const __m256i vf = _mm256_set1_epi32(f);
  const __m256i mm = _mm256_set1_epi32(mask);
  int x = 0;
  for (; x + 8 <= n; x += 8) {
    const __m256i p = _mm256_loadu_si256((const __m256i *)(top + x));
    const __m256i q = _mm256_loadu_si256((const __m256i *)(bot + x));
    const __m256i r = _mm256_add_epi32(
        _mm256_srai_epi32(_mm256_mullo_epi32(_mm256_sub_epi32(p, q), vf), 8),
        q);
    const __m256i a = _mm256_loadu_si256((const __m256i *)(acc + x));
    _mm256_storeu_si256((__m256i *)(acc + x),
                        _mm256_add_epi32(a, _mm256_and_si256(r, mm)));
  }
  for (; x < n; x++)
    acc[x] += ((((top[x] - bot[x]) * f) >> 8) + bot[x]) & mask;
}
static inline void row_weight_i32(const int32_t *src, int32_t wgt,
                                  int32_t mask, int32_t *dst, int n) {
  const __m256i vw = _mm256_set1_epi32(wgt);
  const __m256i mm = _mm256_set1_epi32(mask);
  int x = 0;
  for (; x + 8 <= n; x += 8) {
    const __m256i v = _mm256_loadu_si256((const __m256i *)(src + x));
    _mm256_storeu_si256(
        (__m256i *)(dst + x),
        _mm256_and_si256(
            _mm256_srai_epi32(_mm256_mullo_epi32(v, vw), 8), mm));
  }
  for (; x < n; x++) dst[x] = ((src[x] * wgt) >> 8) & mask;
}
static inline void row_weight_acc_i32(const int32_t *src, int32_t wgt,
                                      int32_t mask, int32_t *acc, int n) {
  const __m256i vw = _mm256_set1_epi32(wgt);
  const __m256i mm = _mm256_set1_epi32(mask);
  int x = 0;
  for (; x + 8 <= n; x += 8) {
    const __m256i v = _mm256_loadu_si256((const __m256i *)(src + x));
    const __m256i a = _mm256_loadu_si256((const __m256i *)(acc + x));
    _mm256_storeu_si256(
        (__m256i *)(acc + x),
        _mm256_add_epi32(a, _mm256_and_si256(
            _mm256_srai_epi32(_mm256_mullo_epi32(v, vw), 8), mm)));
  }
  for (; x < n; x++) acc[x] += ((src[x] * wgt) >> 8) & mask;
}
static inline void row_add_i32(const int32_t *src, int32_t *acc, int n) {
  int x = 0;
  for (; x + 8 <= n; x += 8)
    _mm256_storeu_si256(
        (__m256i *)(acc + x),
        _mm256_add_epi32(_mm256_loadu_si256((const __m256i *)(acc + x)),
                         _mm256_loadu_si256((const __m256i *)(src + x))));
  for (; x < n; x++) acc[x] += src[x];
}
static inline void row_shift_mask_i32(const int32_t *acc, int sh,
                                      int32_t mask, int32_t *dst, int n) {
  const __m256i mm = _mm256_set1_epi32(mask);
  int x = 0;
  for (; x + 8 <= n; x += 8)
    _mm256_storeu_si256(
        (__m256i *)(dst + x),
        _mm256_and_si256(
            _mm256_srai_epi32(
                _mm256_loadu_si256((const __m256i *)(acc + x)), sh),
            mm));
  for (; x < n; x++) dst[x] = (acc[x] >> sh) & mask;
}
#endif  // __AVX2__

// Row layout: pixel-major, 4 contiguous lanes per position (the CPU-native
// analogue of the upstream's packed u64; fixed 4-wide inner ops vectorize).
template <typename T>
static void unpack_row(const Plan *p, const uint8_t *src, T *dst) {
  const int w = p->w_in;
  const int nb = p->nb_in;

  if (p->ialpha == A_PREMUL8 && p->gamma == G_COMPRESSED && nb == 4) {
    const int l0 = p->lin[0], l1 = p->lin[1], l2 = p->lin[2], l3 = p->lin[3];
    if (alpha_of(p->type_in) == A_PREMUL8) {
#if defined(__AVX2__)
      if (sizeof(T) == 2) {
        // 4 px/iter: one 16-byte channel-order shuffle, one vpmovzxbw
        // widen to 8 u16 lanes, one 256-bit store
        uint16_t *d = (uint16_t *)dst;
        // inverse permutation: output channel c comes from byte inv[c]
        char inv[4];
        inv[l0] = 0; inv[l1] = 1; inv[l2] = 2; inv[l3] = 3;
        const __m128i shuf = _mm_setr_epi8(
            inv[0], inv[1], inv[2], inv[3],
            (char)(4 + inv[0]), (char)(4 + inv[1]), (char)(4 + inv[2]),
            (char)(4 + inv[3]),
            (char)(8 + inv[0]), (char)(8 + inv[1]), (char)(8 + inv[2]),
            (char)(8 + inv[3]),
            (char)(12 + inv[0]), (char)(12 + inv[1]), (char)(12 + inv[2]),
            (char)(12 + inv[3]));
        int i = 0;
        for (; i + 4 <= w; i += 4) {
          _mm_prefetch((const char *)(src + 4 * i) + 1536, _MM_HINT_T0);
          const __m128i v = _mm_loadu_si128((const __m128i *)(src + 4 * i));
          _mm256_storeu_si256(
              (__m256i *)(d + 4 * i),
              _mm256_cvtepu8_epi16(_mm_shuffle_epi8(v, shuf)));
        }
        for (; i < w; i++) {
          d[4 * i + l0] = src[4 * i + 0];
          d[4 * i + l1] = src[4 * i + 1];
          d[4 * i + l2] = src[4 * i + 2];
          d[4 * i + l3] = src[4 * i + 3];
        }
        return;
      }
#endif
      for (int i = 0; i < w; i++) {
        dst[4 * i + l0] = src[4 * i + 0];
        dst[4 * i + l1] = src[4 * i + 1];
        dst[4 * i + l2] = src[4 * i + 2];
        dst[4 * i + l3] = src[4 * i + 3];
      }
    } else {
      const int apos = 0 * (l0 == 3) + 1 * (l1 == 3) + 2 * (l2 == 3) +
                       3 * (l3 == 3);
#if defined(__AVX2__)
      if (sizeof(T) == 2) {
        // unassoc -> premul8, 4 px/iter.  ((c+1)*(a+1)-1)>>8 is exact in
        // mod-2**16 u16 lanes: the only overflow is c=a=255 where
        // 256*256 = 0 mod 2**16, and (0-1)&0xffff = 0xffff >>8 = 255,
        // which equals the true ((65536-1)>>8).  All other products
        // fit u16.  Alpha lane keeps raw a (blend, not multiplied).
        uint16_t *d = (uint16_t *)dst;
        char inv[4];
        inv[l0] = 0; inv[l1] = 1; inv[l2] = 2; inv[l3] = 3;
        const __m128i lshuf = _mm_setr_epi8(
            inv[0], inv[1], inv[2], inv[3],
            (char)(4 + inv[0]), (char)(4 + inv[1]), (char)(4 + inv[2]),
            (char)(4 + inv[3]),
            (char)(8 + inv[0]), (char)(8 + inv[1]), (char)(8 + inv[2]),
            (char)(8 + inv[3]),
            (char)(12 + inv[0]), (char)(12 + inv[1]), (char)(12 + inv[2]),
            (char)(12 + inv[3]));
        const __m256i amask256 = _mm256_setr_epi16(
            0, 0, 0, -1, 0, 0, 0, -1, 0, 0, 0, -1, 0, 0, 0, -1);
        const __m256i one = _mm256_set1_epi16(1);
        int i = 0;
        for (; i + 4 <= w; i += 4) {
          const __m128i raw = _mm_loadu_si128((const __m128i *)(src + 4 * i));
          const __m256i v16 =
              _mm256_cvtepu8_epi16(_mm_shuffle_epi8(raw, lshuf));
          const __m256i av = _mm256_shufflehi_epi16(
              _mm256_shufflelo_epi16(v16, _MM_SHUFFLE(3, 3, 3, 3)),
              _MM_SHUFFLE(3, 3, 3, 3));
          const __m256i pm = _mm256_srli_epi16(
              _mm256_sub_epi16(
                  _mm256_mullo_epi16(_mm256_add_epi16(v16, one),
                                     _mm256_add_epi16(av, one)),
                  one),
              8);
          _mm256_storeu_si256((__m256i *)(d + 4 * i),
                              _mm256_blendv_epi8(pm, av, amask256));
        }
        for (; i < w; i++) {
          const int32_t a = src[4 * i + apos];
          d[4 * i + l0] = (((int32_t)src[4 * i + 0] + 1) * (a + 1) - 1) >> 8;
          d[4 * i + l1] = (((int32_t)src[4 * i + 1] + 1) * (a + 1) - 1) >> 8;
          d[4 * i + l2] = (((int32_t)src[4 * i + 2] + 1) * (a + 1) - 1) >> 8;
          d[4 * i + l3] = (((int32_t)src[4 * i + 3] + 1) * (a + 1) - 1) >> 8;
          d[4 * i + 3] = a;  // alpha lane holds a, not premul(a, a)
        }
        return;
      }
#endif
      for (int i = 0; i < w; i++) {
        const int32_t a = src[4 * i + apos];
        dst[4 * i + l0] = (((int32_t)src[4 * i + 0] + 1) * (a + 1) - 1) >> 8;
        dst[4 * i + l1] = (((int32_t)src[4 * i + 1] + 1) * (a + 1) - 1) >> 8;
        dst[4 * i + l2] = (((int32_t)src[4 * i + 2] + 1) * (a + 1) - 1) >> 8;
        dst[4 * i + l3] = (((int32_t)src[4 * i + 3] + 1) * (a + 1) - 1) >> 8;
        dst[4 * i + 3] = a;  // alpha lane holds a, not premul(a, a)
      }
    }
    return;
  }
#if defined(__AVX2__)
  if (p->ialpha == A_PREMUL8 && p->gamma == G_COMPRESSED && nb == 3 &&
      sizeof(T) == 2) {
    // 24bpp input (rgb/bgr, no alpha -> premul8 with a=255): 4 px per
    // iteration, one 16-byte load covers 12 input bytes; shuffle expands
    // to u16 lanes in channel order, alpha lanes OR'd to 255
    uint16_t *d = (uint16_t *)dst;
    const int l0 = p->lin[0], l1 = p->lin[1], l2 = p->lin[2];
    char inv[4];
    inv[l0] = 0; inv[l1] = 1; inv[l2] = 2;
    inv[3] = -1;
    const __m128i s_lo = _mm_setr_epi8(
        inv[0], -1, inv[1], -1, inv[2], -1, -1, -1,
        (char)(3 + inv[0]), -1, (char)(3 + inv[1]), -1,
        (char)(3 + inv[2]), -1, -1, -1);
    const __m128i s_hi = _mm_setr_epi8(
        (char)(6 + inv[0]), -1, (char)(6 + inv[1]), -1,
        (char)(6 + inv[2]), -1, -1, -1,
        (char)(9 + inv[0]), -1, (char)(9 + inv[1]), -1,
        (char)(9 + inv[2]), -1, -1, -1);
    const __m128i amask = _mm_setr_epi16(0, 0, 0, 0xff, 0, 0, 0, 0xff);
    int i = 0;
    for (; i + 4 <= w && 3 * i + 16 <= 3 * w; i += 4) {
      const __m128i v = _mm_loadu_si128((const __m128i *)(src + 3 * i));
      _mm_storeu_si128((__m128i *)(d + 4 * i),
                       _mm_or_si128(_mm_shuffle_epi8(v, s_lo), amask));
      _mm_storeu_si128((__m128i *)(d + 4 * i + 8),
                       _mm_or_si128(_mm_shuffle_epi8(v, s_hi), amask));
    }
    for (; i < w; i++) {
      d[4 * i + l0] = src[3 * i + 0];
      d[4 * i + l1] = src[3 * i + 1];
      d[4 * i + l2] = src[3 * i + 2];
      d[4 * i + 3] = 255;
    }
    return;
  }
  if (p->ialpha == A_PREMUL16 && p->gamma == G_COMPRESSED && nb == 4 &&
      (sizeof(T) == 4 || sizeof(T) == 2)) {
    // u16-lane premultiply: c*a <= 65025 and (a<<8)|0x80 <= 65408 are both
    // u16-exact; widen to the int32 planes afterwards (narrow16 plans store
    // the u16 lanes directly -- no widen).
    const int l0 = p->lin[0], l1 = p->lin[1], l2 = p->lin[2], l3 = p->lin[3];
    char inv[4];
    inv[l0] = 0; inv[l1] = 1; inv[l2] = 2; inv[l3] = 3;
    const int apos = (int)inv[3];
    const __m128i shuf = _mm_setr_epi8(
        inv[0], -1, inv[1], -1, inv[2], -1, inv[3], -1,
        (char)(4 + inv[0]), -1, (char)(4 + inv[1]), -1,
        (char)(4 + inv[2]), -1, (char)(4 + inv[3]), -1);
    // broadcast the alpha u16 within each 64-bit pixel half
    const int ai = 3;  // channel-ordered: alpha is lane 3
    // 4 px per iteration: one 16-byte load, a byte shuffle applies the
    // channel layout in place, cvtepu8_epi16 widens all 16 lanes, and
    // shufflelo+shufflehi broadcast each pixel's alpha across its 4
    // lanes (they act per 64-bit quarter = per pixel at u16 width).
    const __m128i lshuf = _mm_setr_epi8(
        inv[0], inv[1], inv[2], inv[3],
        (char)(4 + inv[0]), (char)(4 + inv[1]), (char)(4 + inv[2]),
        (char)(4 + inv[3]),
        (char)(8 + inv[0]), (char)(8 + inv[1]), (char)(8 + inv[2]),
        (char)(8 + inv[3]),
        (char)(12 + inv[0]), (char)(12 + inv[1]), (char)(12 + inv[2]),
        (char)(12 + inv[3]));
    const __m256i amask256 = _mm256_setr_epi16(
        0, 0, 0, -1, 0, 0, 0, -1, 0, 0, 0, -1, 0, 0, 0, -1);
    int i = 0;
    for (; i + 4 <= w; i += 4) {
      const __m128i raw = _mm_loadu_si128((const __m128i *)(src + 4 * i));
      const __m256i v16 =
          _mm256_cvtepu8_epi16(_mm_shuffle_epi8(raw, lshuf));
      const __m256i av = _mm256_shufflehi_epi16(
          _mm256_shufflelo_epi16(v16, _MM_SHUFFLE(3, 3, 3, 3)),
          _MM_SHUFFLE(3, 3, 3, 3));
      const __m256i aenc = _mm256_or_si256(_mm256_slli_epi16(av, 8),
                                           _mm256_set1_epi16(0x80));
      const __m256i r = _mm256_blendv_epi8(
          _mm256_mullo_epi16(v16, av), aenc, amask256);
      if (sizeof(T) == 2) {
        _mm256_storeu_si256((__m256i *)((uint16_t *)dst + 4 * i), r);
      } else {
        int32_t *d = (int32_t *)dst;
        _mm256_storeu_si256((__m256i *)(d + 4 * i),
                            _mm256_cvtepu16_epi32(_mm256_castsi256_si128(r)));
        _mm256_storeu_si256(
            (__m256i *)(d + 4 * i + 8),
            _mm256_cvtepu16_epi32(_mm256_extracti128_si256(r, 1)));
      }
    }
    for (; i < w; i++) {
      int64_t c[4] = {0, 0, 0, 255};
      for (int b = 0; b < 4; b++) c[p->lin[b]] = src[i * 4 + b];
      const int64_t a = c[3];
      dst[4 * i + 0] = (T)(c[0] * a);
      dst[4 * i + 1] = (T)(c[1] * a);
      dst[4 * i + 2] = (T)(c[2] * a);
      dst[4 * i + 3] = (T)((a << 8) | 0x80);
    }
    (void)apos; (void)shuf; (void)ai;
    return;
  }
  if (p->ialpha == A_PREMUL8 && p->gamma == G_LINEAR && nb == 4 &&
      (sizeof(T) == 2 || sizeof(T) == 4)) {
    // Linear-light unpack, 4 px/iter: the sRGB LUT and the inverse-division
    // LUT become vpgatherdd on i32-expanded copies (1 KB each, L1-resident).
    // premul-in:   c = premul_p8l(kFromSrgb[unpremul_p8(c, a)], a)
    // unassoc-in:  c = premul_p8l(kFromSrgb[c], a)
    // Bounds: unpremul products <= 255 * 0x181fff < 2**31; premul_p8l
    // products <= 2048 * 2041 < 2**22 -- all exact in i32 lanes.
    const bool unassoc_in = alpha_of(p->type_in) == A_UNASSOC;
    const int l0 = p->lin[0], l1 = p->lin[1], l2 = p->lin[2], l3 = p->lin[3];
    char inv[4];
    inv[l0] = 0; inv[l1] = 1; inv[l2] = 2; inv[l3] = 3;
    const __m128i lshuf = _mm_setr_epi8(
        inv[0], inv[1], inv[2], inv[3],
        (char)(4 + inv[0]), (char)(4 + inv[1]), (char)(4 + inv[2]),
        (char)(4 + inv[3]),
        (char)(8 + inv[0]), (char)(8 + inv[1]), (char)(8 + inv[2]),
        (char)(8 + inv[3]),
        (char)(12 + inv[0]), (char)(12 + inv[1]), (char)(12 + inv[2]),
        (char)(12 + inv[3]));
    const __m256i one = _mm256_set1_epi32(1);
    const __m256i m255 = _mm256_set1_epi32(0xff);
    const __m256i m7ff = _mm256_set1_epi32(0x7ff);
    // the inverse-division factor is one value per pixel: two vmovd+
    // vpbroadcastd from the i32 table (indexed by scalar alpha bytes read
    // straight off the source row) beat a redundant 8-lane vpgatherdd --
    // only the per-lane sRGB lookup keeps the gather
    auto half = [&](__m256i x, __m256i iv) {
      const __m256i av = _mm256_shuffle_epi32(x, 0xFF);  // per-px alpha
      __m256i un = x;
      if (!unassoc_in)
        un = _mm256_and_si256(
            _mm256_srli_epi32(_mm256_mullo_epi32(x, iv), 13), m255);
      const __m256i s = _mm256_i32gather_epi32(kT32.from_srgb, un, 4);
      const __m256i f = _mm256_add_epi32(_mm256_slli_epi32(av, 3), one);
      const __m256i lin = _mm256_and_si256(
          _mm256_srli_epi32(
              _mm256_sub_epi32(
                  _mm256_mullo_epi32(_mm256_add_epi32(s, one), f), one),
              11),
          m7ff);
      return _mm256_blend_epi32(lin, av, 0x88);  // alpha lane rides raw
    };
    const int apos = (int)inv[3];
    const __m256i zero = _mm256_setzero_si256();
    int i = 0;
    for (; i + 4 <= w; i += 4) {
      const __m128i raw = _mm_loadu_si128((const __m128i *)(src + 4 * i));
      const __m128i sh = _mm_shuffle_epi8(raw, lshuf);
      __m256i iv01 = zero, iv23 = zero;
      if (!unassoc_in) {
        iv01 = _mm256_set_m128i(
            _mm_set1_epi32(kT32.inv_p8[src[4 * i + 4 + apos]]),
            _mm_set1_epi32(kT32.inv_p8[src[4 * i + apos]]));
        iv23 = _mm256_set_m128i(
            _mm_set1_epi32(kT32.inv_p8[src[4 * i + 12 + apos]]),
            _mm_set1_epi32(kT32.inv_p8[src[4 * i + 8 + apos]]));
      }
      const __m256i r01 = half(_mm256_cvtepu8_epi32(sh), iv01);
      const __m256i r23 =
          half(_mm256_cvtepu8_epi32(_mm_srli_si128(sh, 8)), iv23);
      if (sizeof(T) == 2) {
        const __m256i pk = _mm256_permute4x64_epi64(
            _mm256_packus_epi32(r01, r23), 0xD8);
        _mm256_storeu_si256((__m256i *)((uint16_t *)dst + 4 * i), pk);
      } else {
        _mm256_storeu_si256((__m256i *)((int32_t *)dst + 4 * i), r01);
        _mm256_storeu_si256((__m256i *)((int32_t *)dst + 4 * i + 8), r23);
      }
    }
    for (; i < w; i++) {
      int64_t c[4] = {0, 0, 0, 255};
      for (int b = 0; b < 4; b++) c[p->lin[b]] = src[i * 4 + b];
      const int64_t a = c[3];
      for (int k = 0; k < 3; k++)
        c[k] = unassoc_in ? premul_p8l(kFromSrgb[c[k]], a)
                          : premul_p8l(kFromSrgb[unpremul_p8(c[k], a)], a);
      dst[4 * i + 0] = (T)c[0]; dst[4 * i + 1] = (T)c[1];
      dst[4 * i + 2] = (T)c[2]; dst[4 * i + 3] = (T)a;
    }
    return;
  }
  if (p->ialpha == A_PREMUL16 && p->gamma == G_LINEAR && nb == 4 &&
      sizeof(T) == 4) {
    // linear PREMUL16 (unassoc<->unassoc with sRGB): c = kFromSrgb[c] * a
    // (<= 2047*255 < 2**19, i32-exact), alpha (a<<8)|0x80.  One sRGB
    // gather per half; the alpha lane's wasted lookup rides along.
    const int l0 = p->lin[0], l1 = p->lin[1], l2 = p->lin[2], l3 = p->lin[3];
    char inv[4];
    inv[l0] = 0; inv[l1] = 1; inv[l2] = 2; inv[l3] = 3;
    const __m128i lshuf = _mm_setr_epi8(
        inv[0], inv[1], inv[2], inv[3],
        (char)(4 + inv[0]), (char)(4 + inv[1]), (char)(4 + inv[2]),
        (char)(4 + inv[3]),
        (char)(8 + inv[0]), (char)(8 + inv[1]), (char)(8 + inv[2]),
        (char)(8 + inv[3]),
        (char)(12 + inv[0]), (char)(12 + inv[1]), (char)(12 + inv[2]),
        (char)(12 + inv[3]));
    const __m256i v80 = _mm256_set1_epi32(0x80);
    auto half = [&](__m256i x) {
      const __m256i av = _mm256_shuffle_epi32(x, 0xFF);
      const __m256i s = _mm256_i32gather_epi32(kT32.from_srgb, x, 4);
      const __m256i aenc =
          _mm256_or_si256(_mm256_slli_epi32(av, 8), v80);
      return _mm256_blend_epi32(_mm256_mullo_epi32(s, av), aenc, 0x88);
    };
    int32_t *d = (int32_t *)dst;
    int i = 0;
    for (; i + 4 <= w; i += 4) {
      const __m128i raw = _mm_loadu_si128((const __m128i *)(src + 4 * i));
      const __m128i sh = _mm_shuffle_epi8(raw, lshuf);
      _mm256_storeu_si256((__m256i *)(d + 4 * i),
                          half(_mm256_cvtepu8_epi32(sh)));
      _mm256_storeu_si256(
          (__m256i *)(d + 4 * i + 8),
          half(_mm256_cvtepu8_epi32(_mm_srli_si128(sh, 8))));
    }
    for (; i < w; i++) {
      int64_t c[4] = {0, 0, 0, 255};
      for (int b = 0; b < 4; b++) c[p->lin[b]] = src[i * 4 + b];
      const int64_t a = c[3];
      dst[4 * i + 0] = (T)((int64_t)kFromSrgb[c[0]] * a);
      dst[4 * i + 1] = (T)((int64_t)kFromSrgb[c[1]] * a);
      dst[4 * i + 2] = (T)((int64_t)kFromSrgb[c[2]] * a);
      dst[4 * i + 3] = (T)((a << 8) | 0x80);
    }
    return;
  }
#endif
  for (int i = 0; i < w; i++) {
    int64_t c[4] = {0, 0, 0, 255};
    for (int b = 0; b < nb; b++) {
      int lane = p->lin[b];
      if (lane >= 0) c[lane] = src[i * nb + b];
    }
    int64_t a = c[3];
    switch (p->ialpha) {
      case A_PREMUL8:
        if (p->gamma == G_COMPRESSED) {
          if (alpha_of(p->type_in) == A_UNASSOC)
            for (int k = 0; k < 3; k++) c[k] = premul_p8(c[k], a);
        } else {
          if (alpha_of(p->type_in) == A_UNASSOC)
            for (int k = 0; k < 3; k++) c[k] = premul_p8l(kFromSrgb[c[k]], a);
          else
            for (int k = 0; k < 3; k++)
              c[k] = premul_p8l(kFromSrgb[unpremul_p8(c[k], a)], a);
        }
        break;
      case A_PREMUL16:
        if (p->gamma == G_COMPRESSED)
          for (int k = 0; k < 3; k++) c[k] = c[k] * a;
        else
          for (int k = 0; k < 3; k++) c[k] = (int64_t)kFromSrgb[c[k]] * a;
        c[3] = (a << 8) | 0x80;
        break;
      default:
        break;
    }
    dst[4 * i + 0] = c[0]; dst[4 * i + 1] = c[1];
    dst[4 * i + 2] = c[2]; dst[4 * i + 3] = c[3];
  }
}

#if defined(__AVX2__)
// u16-row H bilinear lerp primitive.  WIDE=false is the S64 form: mullo +
// logical >>8 is exact mod 2**16, and the true lerp's low 8 bits live in
// bits 8..15 of (p-q)*F regardless of sign, so the final & 0xff matches the
// reference arithmetic.  WIDE=true is the narrow16 S128 form (lerp16_wide,
// mod-2**16 exact for true u16 endpoints).
template <bool WIDE>
static inline __m256i hlerp16(__m256i p, __m256i q, __m256i f) {
  if (WIDE) return lerp16_wide(p, q, f);
  return _mm256_and_si256(
      _mm256_add_epi16(
          _mm256_srli_epi16(_mm256_mullo_epi16(_mm256_sub_epi16(p, q), f), 8),
          q),
      _mm256_set1_epi16(0xff));
}
template <bool WIDE>
static inline __m128i hlerp16_128(__m128i p, __m128i q, __m128i f) {
  if (WIDE) return lerp16_wide128(p, q, f);
  return _mm_and_si128(
      _mm_add_epi16(
          _mm_srli_epi16(_mm_mullo_epi16(_mm_sub_epi16(p, q), f), 8), q),
      _mm_set1_epi16(0xff));
}

// H bilinear on AoS uint16 rows, shared by S64 storage and the narrow16
// S128 mode: one unaligned 128-bit load per sample covers BOTH bilinear
// endpoints (pixels o and o+1 are adjacent).  This is the engine's own AoS
// design, not the upstream's SWAR mid-order batches (avx2.c:1394-1525).
// WIDE ladder sums stay exact: narrow16 restricts PREMUL16-compressed plans
// to 0 halvings and linear-light values are <= 2047 with halvings <= 2.
template <bool WIDE>
static void hbilin_u16(const AxisPlan &ax, const uint16_t *u, uint16_t *d,
                       int w_out) {
  const int n = ax.halvings;
  const __m256i m8w = _mm256_set1_epi16(0xff);
  const __m128i m8 = _mm_set1_epi16(0xff);
  (void)m8w; (void)m8;
  if (n == 0) {
    // 2 output px per iteration in one 256-bit lerp (each 128-bit half
    // holds one sample's endpoint pair); the factor operand is one 256-bit
    // load from the precomputed fac16 row, and the two 64-bit results are
    // compacted by one vpermq into one store.  Even-ratio 0h plans (e.g.
    // 2:1, lerp_stride2) read both endpoint pairs from ONE 256-bit load.
    const uint8_t *r4 = ax.run4.data();
    int j = 0;
    if (ax.lerp_stride2) {
      for (; j + 2 <= w_out; j += 2) {
        const __m256i v =
            _mm256_loadu_si256((const __m256i *)(u + 4 * ax.off[j]));
        const __m256i q = _mm256_unpackhi_epi64(v, v);
        const __m256i f =
            _mm256_loadu_si256((const __m256i *)(ax.fac16.data() + 8 * j));
        const __m256i r =
            _mm256_permute4x64_epi64(hlerp16<WIDE>(v, q, f), 0xD8);
        _mm_storeu_si128((__m128i *)(d + 4 * j), _mm256_castsi256_si128(r));
      }
    }
    while (ax.run4_any && j + 2 <= w_out) {
      if (r4[j]) {
        // stride-1 run: outputs j..j+3 read the contiguous pixel window
        // off[j]..off[j]+4, so p and q are two overlapping 256-bit loads
        // and the lerp result IS the output layout -- no per-sample loads,
        // no permutes (near-1:1 scales)
        const uint16_t *base = u + 4 * ax.off[j];
        const __m256i pv = _mm256_loadu_si256((const __m256i *)base);
        const __m256i qv = _mm256_loadu_si256((const __m256i *)(base + 4));
        const __m256i f =
            _mm256_loadu_si256((const __m256i *)(ax.fac4.data() + 4 * j));
        _mm256_storeu_si256((__m256i *)(d + 4 * j), hlerp16<WIDE>(pv, qv, f));
        j += 4;
        continue;
      }
      const __m256i v = _mm256_set_m128i(
          _mm_loadu_si128((const __m128i *)(u + 4 * ax.off[j + 1])),
          _mm_loadu_si128((const __m128i *)(u + 4 * ax.off[j])));
      const __m256i q = _mm256_unpackhi_epi64(v, v);
      const __m256i f =
          _mm256_loadu_si256((const __m256i *)(ax.fac16.data() + 8 * j));
      const __m256i r =
          _mm256_permute4x64_epi64(hlerp16<WIDE>(v, q, f), 0xD8);
      _mm_storeu_si128((__m128i *)(d + 4 * j), _mm256_castsi256_si128(r));
      j += 2;
    }
    for (; j + 4 <= w_out; j += 4) {
      // 4-sample batch (no stride-1 runs in this plan): two pair registers
      // [p,q|p,q], 64-bit unpacks split them into a P quad and a Q quad, so
      // the 256-bit lerp produces 4 useful pixels instead of 2 and the
      // store goes out at full width (the reference AVX2 batch gets its
      // density the same way, avx2.c:1470-1505)
      const __m256i v0 = _mm256_set_m128i(
          _mm_loadu_si128((const __m128i *)(u + 4 * ax.off[j + 1])),
          _mm_loadu_si128((const __m128i *)(u + 4 * ax.off[j])));
      const __m256i v1 = _mm256_set_m128i(
          _mm_loadu_si128((const __m128i *)(u + 4 * ax.off[j + 3])),
          _mm_loadu_si128((const __m128i *)(u + 4 * ax.off[j + 2])));
      const __m256i P = _mm256_unpacklo_epi64(v0, v1);
      const __m256i Q = _mm256_unpackhi_epi64(v0, v1);
      const __m256i f =
          _mm256_loadu_si256((const __m256i *)(ax.fac16q.data() + 4 * j));
      const __m256i r =
          _mm256_permute4x64_epi64(hlerp16<WIDE>(P, Q, f), 0xD8);
      _mm256_storeu_si256((__m256i *)(d + 4 * j), r);
    }
    for (; j + 2 <= w_out; j += 2) {
      // pair tail
      const __m256i v = _mm256_set_m128i(
          _mm_loadu_si128((const __m128i *)(u + 4 * ax.off[j + 1])),
          _mm_loadu_si128((const __m128i *)(u + 4 * ax.off[j])));
      const __m256i q = _mm256_unpackhi_epi64(v, v);
      const __m256i f =
          _mm256_loadu_si256((const __m256i *)(ax.fac16.data() + 8 * j));
      const __m256i r =
          _mm256_permute4x64_epi64(hlerp16<WIDE>(v, q, f), 0xD8);
      _mm_storeu_si128((__m128i *)(d + 4 * j), _mm256_castsi256_si128(r));
    }
    for (; j < w_out; j++) {
      const __m128i v = _mm_loadu_si128((const __m128i *)(u + 4 * ax.off[j]));
      const __m128i q = _mm_unpackhi_epi64(v, v);
      const __m128i f = _mm_set1_epi16((short)ax.fac[j]);
      _mm_storel_epi64((__m128i *)(d + 4 * j), hlerp16_128<WIDE>(v, q, f));
    }
    return;
  }
  // ladder, two passes: (1) lerp ALL 2**n * w_out samples with the same
  // 2-per-iteration loop as n==0 (no per-pixel fold) into a thread-local
  // scratch row; (2) n pairwise-add passes over adjacent 4-lane quads,
  // final pass fused with >>n (and the S64 mask) and written to dst.
  // Summing before any shift matches the scalar semantics exactly.
  if (n == 1 && ax.lerp_stride2) {
    // fused 1h even-ratio ladder (e.g. 4:1): one 256-bit load per output
    // covers both samples' endpoint pairs; the pairwise ladder fold
    // happens in-register (no scratch round trip)
    int j = 0;
    for (; j + 2 <= w_out; j += 2) {
      const __m256i v0 =
          _mm256_loadu_si256((const __m256i *)(u + 4 * ax.off[2 * j]));
      const __m256i q0 = _mm256_unpackhi_epi64(v0, v0);
      const __m256i f0 =
          _mm256_loadu_si256((const __m256i *)(ax.fac16.data() + 16 * j));
      const __m256i r0 = hlerp16<WIDE>(v0, q0, f0);
      const __m256i v1 =
          _mm256_loadu_si256((const __m256i *)(u + 4 * ax.off[2 * j + 2]));
      const __m256i q1 = _mm256_unpackhi_epi64(v1, v1);
      const __m256i f1 = _mm256_loadu_si256(
          (const __m256i *)(ax.fac16.data() + 16 * j + 16));
      const __m256i r1 = hlerp16<WIDE>(v1, q1, f1);
      const __m256i sa = _mm256_permute2x128_si256(r0, r1, 0x20);
      const __m256i sb = _mm256_permute2x128_si256(r0, r1, 0x31);
      __m256i s;
      if (WIDE) {  // PREMUL16 sums exceed u16: carry-free floor average
        s = avg_floor_u16(sa, sb);
      } else {
        s = _mm256_and_si256(_mm256_srli_epi16(_mm256_add_epi16(sa, sb), 1),
                             m8w);
      }
      s = _mm256_permute4x64_epi64(s, 0xD8);
      _mm_storeu_si128((__m128i *)(d + 4 * j), _mm256_castsi256_si128(s));
    }
    for (; j < w_out; j++) {
      const __m256i v0 =
          _mm256_loadu_si256((const __m256i *)(u + 4 * ax.off[2 * j]));
      const __m256i q0 = _mm256_unpackhi_epi64(v0, v0);
      const __m256i f0 =
          _mm256_loadu_si256((const __m256i *)(ax.fac16.data() + 16 * j));
      const __m256i r0 = hlerp16<WIDE>(v0, q0, f0);
      __m128i s;
      if (WIDE) {
        s = avg_floor_u16_128(_mm256_castsi256_si128(r0),
                              _mm256_extracti128_si256(r0, 1));
      } else {
        s = _mm_and_si128(
            _mm_srli_epi16(
                _mm_add_epi16(_mm256_castsi256_si128(r0),
                              _mm256_extracti128_si256(r0, 1)),
                1),
            m8);
      }
      _mm_storel_epi64((__m128i *)(d + 4 * j), s);
    }
    return;
  }
  const int ns = w_out << n;
  static thread_local std::vector<uint16_t> scratch;
  if ((int)scratch.size() < 4 * ns) scratch.resize(4 * ns);
  uint16_t *t = scratch.data();
  const uint8_t *r4 = ax.run4.data();
  int k = 0;
  while (ax.run4_any && k + 2 <= ns) {
    if (r4[k]) {
      // stride-1 sample run (d<2 stretches of non-integer ladders): same
      // contiguous-window lerp as the n==0 path
      const uint16_t *base = u + 4 * ax.off[k];
      const __m256i pv = _mm256_loadu_si256((const __m256i *)base);
      const __m256i qv = _mm256_loadu_si256((const __m256i *)(base + 4));
      const __m256i f =
          _mm256_loadu_si256((const __m256i *)(ax.fac4.data() + 4 * k));
      _mm256_storeu_si256((__m256i *)(t + 4 * k), hlerp16<WIDE>(pv, qv, f));
      k += 4;
      continue;
    }
    const __m256i v =
        ax.lerp_stride2
            ? _mm256_loadu_si256((const __m256i *)(u + 4 * ax.off[k]))
            : _mm256_set_m128i(
                  _mm_loadu_si128((const __m128i *)(u + 4 * ax.off[k + 1])),
                  _mm_loadu_si128((const __m128i *)(u + 4 * ax.off[k])));
    const __m256i q = _mm256_unpackhi_epi64(v, v);
    const __m256i f =
        _mm256_loadu_si256((const __m256i *)(ax.fac16.data() + 8 * k));
    const __m256i r = _mm256_permute4x64_epi64(hlerp16<WIDE>(v, q, f), 0xD8);
    _mm_storeu_si128((__m128i *)(t + 4 * k), _mm256_castsi256_si128(r));
    k += 2;
  }
  for (; k + 4 <= ns; k += 4) {
    // 4-sample batch (integer-ratio and mixed-stride ladders): P/Q quads
    // via 64-bit unpacks -> full-density 256-bit lerp + full-width store
    // (see the n==0 quad loop)
    const __m256i v0 =
        ax.lerp_stride2
            ? _mm256_loadu_si256((const __m256i *)(u + 4 * ax.off[k]))
            : _mm256_set_m128i(
                  _mm_loadu_si128((const __m128i *)(u + 4 * ax.off[k + 1])),
                  _mm_loadu_si128((const __m128i *)(u + 4 * ax.off[k])));
    const __m256i v1 =
        ax.lerp_stride2
            ? _mm256_loadu_si256((const __m256i *)(u + 4 * ax.off[k + 2]))
            : _mm256_set_m128i(
                  _mm_loadu_si128((const __m128i *)(u + 4 * ax.off[k + 3])),
                  _mm_loadu_si128((const __m128i *)(u + 4 * ax.off[k + 2])));
    const __m256i P = _mm256_unpacklo_epi64(v0, v1);
    const __m256i Q = _mm256_unpackhi_epi64(v0, v1);
    const __m256i f =
        _mm256_loadu_si256((const __m256i *)(ax.fac16q.data() + 4 * k));
    const __m256i r = _mm256_permute4x64_epi64(hlerp16<WIDE>(P, Q, f), 0xD8);
    _mm256_storeu_si256((__m256i *)(t + 4 * k), r);
  }
  for (; k + 2 <= ns; k += 2) {
    // pair tail
    const __m256i v =
        ax.lerp_stride2
            ? _mm256_loadu_si256((const __m256i *)(u + 4 * ax.off[k]))
            : _mm256_set_m128i(
                  _mm_loadu_si128((const __m128i *)(u + 4 * ax.off[k + 1])),
                  _mm_loadu_si128((const __m128i *)(u + 4 * ax.off[k])));
    const __m256i q = _mm256_unpackhi_epi64(v, v);
    const __m256i f =
        _mm256_loadu_si256((const __m256i *)(ax.fac16.data() + 8 * k));
    const __m256i r = _mm256_permute4x64_epi64(hlerp16<WIDE>(v, q, f), 0xD8);
    _mm_storeu_si128((__m128i *)(t + 4 * k), _mm256_castsi256_si128(r));
  }
  for (int lvl = 1; lvl <= n; lvl++) {
    const int mo = ns >> lvl;           // output quads this pass
    const bool last = lvl == n;
    uint16_t *o16 = last ? d : t;
    int o = 0;
    for (; o + 4 <= mo; o += 4) {
      const __m256i v0 = _mm256_loadu_si256((const __m256i *)(t + 8 * o));
      const __m256i v1 =
          _mm256_loadu_si256((const __m256i *)(t + 8 * o + 16));
      const __m256i fa = _mm256_unpacklo_epi64(v0, v1);
      const __m256i fb = _mm256_unpackhi_epi64(v0, v1);
      __m256i s;
      if (WIDE && last && n == 1) {
        s = avg_floor_u16(fa, fb);  // PREMUL16 1h: sum would carry out
      } else {
        s = _mm256_add_epi16(fa, fb);
        if (last) {
          s = _mm256_srli_epi16(s, n);
          if (!WIDE) s = _mm256_and_si256(s, m8w);
        }
      }
      s = _mm256_permute4x64_epi64(s, 0xD8);  // [o0,o2|o1,o3]->[0..3]
      _mm256_storeu_si256((__m256i *)(o16 + 4 * o), s);
    }
    for (; o < mo; o++)
      for (int c = 0; c < 4; c++) {
        const uint32_t s =
            (uint32_t)t[8 * o + c] + t[8 * o + 4 + c];  // 17-bit safe
        o16[4 * o + c] = last ? (uint16_t)((s >> n) & (WIDE ? 0xffff : 0xff))
                              : (uint16_t)s;
      }
  }
}
#endif  // __AVX2__


template <typename T>
static void hfilter_row(const Plan *p, const T *unp, T *dst) {
  const int w_in = p->w_in, w_out = p->w_out;
  const T mask = (T)p->mask();
  const AxisPlan &ax = p->x;
  switch (ax.filter) {
    case F_COPY:
      std::memcpy(dst, unp, sizeof(T) * 4 * w_in);
      break;
    case F_ONE:
      for (int j = 0; j < w_out; j++)
        for (int c = 0; c < 4; c++) dst[4 * j + c] = unp[c];
      break;
    case F_BILIN: {
      const int n = ax.halvings;
#if defined(__AVX2__)
      if (sizeof(T) == 2) {
        // u16 AoS rows: S64 storage (mask 0xff) or the narrow16 S128 mode
        // (mask 0xffff; lerp16_wide).  Shared body in hbilin_u16.
        if (mask == 0xff)
          hbilin_u16<false>(ax, (const uint16_t *)unp, (uint16_t *)dst,
                            w_out);
        else
          hbilin_u16<true>(ax, (const uint16_t *)unp, (uint16_t *)dst,
                           w_out);
        break;
      }
      if (sizeof(T) == 4) {
        // S128 rows: lerp products fit int32 (<= 2**27, see Worker note);
        // arithmetic >>8 + mask matches the scalar int32 semantics exactly
        const int32_t *u = (const int32_t *)unp;
        int32_t *d = (int32_t *)dst;
        const __m256i m8 = _mm256_set1_epi32((int32_t)mask);
        if (n == 0) {
          const uint8_t *r2 = ax.run2.data();
          int j = 0;
          while (ax.run2_any && j + 2 <= w_out) {
            if (r2[j]) {
              // stride-1 pair: outputs j,j+1 read pixels off..off+2, so p
              // and q are two overlapping 256-bit loads (one pixel apart)
              // and the masked lerp IS the output layout
              const int32_t *base = u + 4 * ax.off[j];
              const __m256i pv = _mm256_loadu_si256((const __m256i *)base);
              const __m256i qv =
                  _mm256_loadu_si256((const __m256i *)(base + 4));
              const __m256i f = _mm256_loadu_si256(
                  (const __m256i *)(ax.fac4i.data() + 4 * j));
              const __m256i r = _mm256_add_epi32(
                  _mm256_srai_epi32(
                      _mm256_mullo_epi32(_mm256_sub_epi32(pv, qv), f), 8),
                  qv);
              _mm256_storeu_si256((__m256i *)(d + 4 * j),
                                  _mm256_and_si256(r, m8));
              j += 2;
              continue;
            }
            const __m256i v =
                _mm256_loadu_si256((const __m256i *)(u + 4 * ax.off[j]));
            const __m256i q = _mm256_permute2x128_si256(v, v, 0x11);
            const __m256i f = _mm256_set1_epi32(ax.fac[j]);
            __m256i r = _mm256_add_epi32(
                _mm256_srai_epi32(
                    _mm256_mullo_epi32(_mm256_sub_epi32(v, q), f), 8),
                q);
            r = _mm256_and_si256(r, m8);
            _mm_storeu_si128((__m128i *)(d + 4 * j),
                             _mm256_castsi256_si128(r));
            j += 1;
          }
          for (; j < w_out; j++) {
            const __m256i v =
                _mm256_loadu_si256((const __m256i *)(u + 4 * ax.off[j]));
            const __m256i q = _mm256_permute2x128_si256(v, v, 0x11);
            const __m256i f = _mm256_set1_epi32(ax.fac[j]);
            __m256i r = _mm256_add_epi32(
                _mm256_srai_epi32(
                    _mm256_mullo_epi32(_mm256_sub_epi32(v, q), f), 8),
                q);
            r = _mm256_and_si256(r, m8);
            _mm_storeu_si128((__m128i *)(d + 4 * j),
                             _mm256_castsi256_si128(r));
          }
        } else if (ax.lerp_stride2) {
          // even-ratio i32 ladder (e.g. 4:1): samples k,k+1 of one output
          // read 4 consecutive pixels; two loads + two permutes pair both
          // samples into one 256-bit lerp with a fac4i factor row
          int k = 0;
          for (int j = 0; j < w_out; j++) {
            __m128i acc = _mm_setzero_si128();
            for (int s = 0; s < (1 << n); s += 2, k += 2) {
              const int32_t *base = u + 4 * ax.off[k];
              const __m256i vlo =
                  _mm256_loadu_si256((const __m256i *)base);
              const __m256i vhi =
                  _mm256_loadu_si256((const __m256i *)(base + 8));
              const __m256i pv = _mm256_permute2x128_si256(vlo, vhi, 0x20);
              const __m256i qv = _mm256_permute2x128_si256(vlo, vhi, 0x31);
              const __m256i f = _mm256_loadu_si256(
                  (const __m256i *)(ax.fac4i.data() + 4 * k));
              const __m256i r = _mm256_and_si256(
                  _mm256_add_epi32(
                      _mm256_srai_epi32(
                          _mm256_mullo_epi32(_mm256_sub_epi32(pv, qv), f),
                          8),
                      qv),
                  m8);
              acc = _mm_add_epi32(
                  _mm_add_epi32(acc, _mm256_castsi256_si128(r)),
                  _mm256_extracti128_si256(r, 1));
            }
            acc = _mm_srai_epi32(acc, n);
            acc = _mm_and_si128(acc, _mm256_castsi256_si128(m8));
            _mm_storeu_si128((__m128i *)(d + 4 * j), acc);
          }
        } else {
          int k = 0;
          for (int j = 0; j < w_out; j++) {
            __m128i acc = _mm_setzero_si128();
            for (int s = 0; s < (1 << n); s++, k++) {
              const __m256i v =
                  _mm256_loadu_si256((const __m256i *)(u + 4 * ax.off[k]));
              const __m256i q = _mm256_permute2x128_si256(v, v, 0x11);
              const __m256i f = _mm256_set1_epi32(ax.fac[k]);
              __m256i r = _mm256_add_epi32(
                  _mm256_srai_epi32(
                      _mm256_mullo_epi32(_mm256_sub_epi32(v, q), f), 8),
                  q);
              r = _mm256_and_si256(r, m8);
              acc = _mm_add_epi32(acc, _mm256_castsi256_si128(r));
            }
            acc = _mm_srai_epi32(acc, n);
            acc = _mm_and_si128(acc, _mm256_castsi256_si128(m8));
            _mm_storeu_si128((__m128i *)(d + 4 * j), acc);
          }
        }
        break;
      }
#endif
      if (n == 0) {
        for (int j = 0; j < w_out; j++) {
          const int o = ax.off[j];
          const T f = (T)ax.fac[j];
          const T *pp = unp + 4 * o;
          for (int c = 0; c < 4; c++)
            dst[4 * j + c] = lerp256<T>(pp[c], pp[4 + c], f, mask);
        }
      } else {
        int k = 0;
        for (int j = 0; j < w_out; j++) {
          T accum[4] = {0, 0, 0, 0};
          for (int s = 0; s < (1 << n); s++, k++) {
            const T *pp = unp + 4 * ax.off[k];
            const T f = (T)ax.fac[k];
            for (int c = 0; c < 4; c++)
              accum[c] += lerp256<T>(pp[c], pp[4 + c], f, mask);
          }
          // accum <= 255*64 (64bpp) / 0xffffff*64 needs care: 128bpp runs
          // with T = int64 so the sum never overflows
          for (int c = 0; c < 4; c++) dst[4 * j + c] = (accum[c] >> n) & mask;
        }
      }
      break;
    }
    case F_BOX: {
#if defined(__AVX2__)
      // u16 span walk: whole pixels accumulate 2-at-a-time in 8 u16 lanes,
      // folded to one pixel's 4 lanes; fractional edges stay scalar-width
      // vectors.  Exact: per-lane sums <= 65280 (64bpp spans <= 255).
      if (sizeof(T) == 2 && mask == 0xff) {
        const uint16_t *u = (const uint16_t *)unp;
        uint16_t *d = (uint16_t *)dst;
        const __m128i m8 = _mm_set1_epi16(0xff);
        int pos = 1;
        __m128i left = _mm_and_si128(
            _mm_loadl_epi64((const __m128i *)u), m8);  // weight 256 = identity
        for (int j = 0; j < w_out; j++) {
          const bool last = j == w_out - 1;
          int nspan = ax.stride[j];
          int sp = 0;
          __m128i acc2 = _mm_setzero_si128();  // 2 pixels wide
          if (nspan >= 4) {
            // 4 whole pixels per 256-bit add (wide spans, e.g. 10:1);
            // folded to the 2-wide accumulator afterwards
            __m256i acc4 = _mm256_setzero_si256();
            for (; sp + 4 <= nspan; sp += 4, pos += 4)
              acc4 = _mm256_add_epi16(
                  acc4, _mm256_loadu_si256((const __m256i *)(u + 4 * pos)));
            acc2 = _mm_add_epi16(_mm256_castsi256_si128(acc4),
                                 _mm256_extracti128_si256(acc4, 1));
          }
          for (; sp + 2 <= nspan; sp += 2, pos += 2)
            acc2 = _mm_add_epi16(
                acc2, _mm_loadu_si128((const __m128i *)(u + 4 * pos)));
          __m128i acc = _mm_add_epi16(acc2, _mm_unpackhi_epi64(acc2, acc2));
          if (sp < nspan) {
            acc = _mm_add_epi16(
                acc, _mm_loadl_epi64((const __m128i *)(u + 4 * pos)));
            pos++;
            sp++;
          }
          acc = _mm_add_epi16(acc, left);
          const __m128i f = _mm_set1_epi16((short)ax.fac[j]);
          if (!last) {
            const __m128i r =
                _mm_loadl_epi64((const __m128i *)(u + 4 * pos));
            pos++;
            acc = _mm_add_epi16(
                acc,
                _mm_and_si128(_mm_srli_epi16(_mm_mullo_epi16(r, f), 8), m8));
            // left = (r*255 - r*f) >> 8 & 0xff
            const __m128i r255 = _mm_mullo_epi16(r, _mm_set1_epi16(255));
            left = _mm_and_si128(
                _mm_srli_epi16(_mm_sub_epi16(r255, _mm_mullo_epi16(r, f)), 8),
                m8);
          } else if (ax.fac[j] > 0) {
            const __m128i r =
                _mm_loadl_epi64((const __m128i *)(u + 4 * pos));
            acc = _mm_add_epi16(
                acc,
                _mm_and_si128(_mm_srli_epi16(_mm_mullo_epi16(r, f), 8), m8));
          }
          const __m128i r = scale_span_vec4(_mm_cvtepu16_epi32(acc),
                                            (uint32_t)ax.span_mul, 0xff);
          _mm_storel_epi64((__m128i *)(d + 4 * j), _mm_packus_epi32(r, r));
        }
        break;
      }
      if (sizeof(T) == 4) {
        // S128 span walk: same structure on int32 lanes (exact mod 2**32;
        // weight products use mullo + arithmetic shift like the scalar
        // int32 forms), per-span normalization via the u64-product vector
        const int32_t *u = (const int32_t *)unp;
        int32_t *d = (int32_t *)dst;
        const __m128i mm = _mm_set1_epi32((int32_t)mask);
        int pos = 1;
        __m128i left = _mm_and_si128(
            _mm_loadu_si128((const __m128i *)u), mm);  // weight 256 identity
        for (int j = 0; j < w_out; j++) {
          const bool last = j == w_out - 1;
          __m128i acc = left;
          int nspan = ax.stride[j];
          int sp = 0;
          for (; sp + 2 <= nspan; sp += 2, pos += 2) {
            const __m256i two =
                _mm256_loadu_si256((const __m256i *)(u + 4 * pos));
            acc = _mm_add_epi32(
                acc, _mm_add_epi32(_mm256_castsi256_si128(two),
                                   _mm256_extracti128_si256(two, 1)));
          }
          if (sp < nspan) {
            acc = _mm_add_epi32(
                acc, _mm_loadu_si128((const __m128i *)(u + 4 * pos)));
            pos++;
          }
          const __m128i f = _mm_set1_epi32(ax.fac[j]);
          if (!last) {
            const __m128i r =
                _mm_loadu_si128((const __m128i *)(u + 4 * pos));
            pos++;
            acc = _mm_add_epi32(
                acc, _mm_and_si128(
                    _mm_srai_epi32(_mm_mullo_epi32(r, f), 8), mm));
            // left = (r*255 - r*f) >> 8 & mask
            const __m128i r255 = _mm_mullo_epi32(r, _mm_set1_epi32(255));
            left = _mm_and_si128(
                _mm_srai_epi32(
                    _mm_sub_epi32(r255, _mm_mullo_epi32(r, f)), 8),
                mm);
          } else if (ax.fac[j] > 0) {
            const __m128i r =
                _mm_loadu_si128((const __m128i *)(u + 4 * pos));
            acc = _mm_add_epi32(
                acc, _mm_and_si128(
                    _mm_srai_epi32(_mm_mullo_epi32(r, f), 8), mm));
          }
          _mm_storeu_si128(
              (__m128i *)(d + 4 * j),
              scale_span_vec4(acc, (uint32_t)ax.span_mul, 0xffff));
        }
        break;
      }
#endif
      // Sequential span walk (interp_horizontal_boxes, generic.c:1427-1556).
      // Accumulation is T-typed so the 4-wide channel loops vectorize
      // (S64: T=int32, sums <= 255*256 + 2*255 < 2**17; S128: T=int64).
      int pos = 1;
      T left[4], accum[4];
      for (int c = 0; c < 4; c++)
        left[c] = weight256<T>(unp[c], (T)256, (T)mask);
      for (int j = 0; j < w_out; j++) {
        const bool last = j == w_out - 1;
        for (int c = 0; c < 4; c++) accum[c] = left[c];
        for (int s = 0; s < ax.stride[j]; s++, pos++)
          for (int c = 0; c < 4; c++) accum[c] += unp[4 * pos + c];
        const T f = (T)ax.fac[j];
        if (!last) {
          const T *r = unp + 4 * pos;
          pos++;
          for (int c = 0; c < 4; c++) {
            accum[c] += (r[c] * f >> 8) & mask;
            left[c] = ((r[c] * 255 - r[c] * f) >> 8) & mask;
          }
        } else if (f > 0) {
          for (int c = 0; c < 4; c++)
            accum[c] += (unp[4 * pos + c] * f >> 8) & mask;
        }
        for (int c = 0; c < 4; c++)
          dst[4 * j + c] =
              (T)scale_span(zext(accum[c]), ax.span_mul, p->storage);
      }
      break;
    }
  }
}

#if defined(__AVX2__)
// Fused unpack+H for S64 premul-identity bilinear plans whose sample
// offsets are even-ratio (lerp_stride2) or stride-1-run heavy (run4_any):
// the H loops read pixel windows straight from the source row through one
// byte-shuffle + vpmovzxbw, skipping the unp buffer round trip entirely.
// Bit-identical to unpack_row + hfilter_row by construction (same lerp
// ops on the same lanes; the shuffle applies the same channel layout).
static void hfilter_row_fused_u16(const Plan *p, const uint8_t *src,
                                  uint16_t *d) {
  const AxisPlan &ax = p->x;
  const int w_out = p->w_out;
  const int n = ax.halvings;
  char inv[4];
  inv[p->lin[0]] = 0; inv[p->lin[1]] = 1;
  inv[p->lin[2]] = 2; inv[p->lin[3]] = 3;
  const __m128i shuf = _mm_setr_epi8(
      inv[0], inv[1], inv[2], inv[3],
      (char)(4 + inv[0]), (char)(4 + inv[1]), (char)(4 + inv[2]),
      (char)(4 + inv[3]),
      (char)(8 + inv[0]), (char)(8 + inv[1]), (char)(8 + inv[2]),
      (char)(8 + inv[3]),
      (char)(12 + inv[0]), (char)(12 + inv[1]), (char)(12 + inv[2]),
      (char)(12 + inv[3]));
  // 4 pixels (o..o+3) as 16 u16 lanes in channel order
  const auto px4 = [&](int o) {
    return _mm256_cvtepu8_epi16(_mm_shuffle_epi8(
        _mm_loadu_si128((const __m128i *)(src + 4 * o)), shuf));
  };
  // 2 pixels (o..o+1) as 8 u16 lanes
  const auto px2 = [&](int o) {
    return _mm_cvtepu8_epi16(_mm_shuffle_epi8(
        _mm_loadl_epi64((const __m128i *)(src + 4 * o)), shuf));
  };
  const __m128i m8 = _mm_set1_epi16(0xff);
  const __m256i m8w = _mm256_set1_epi16(0xff);
  // 1 pixel (o) as 4 u16 lanes -- exact 4-byte load, no row overread
  const auto px1 = [&](int o) {
    return _mm_cvtepu8_epi16(_mm_shuffle_epi8(
        _mm_cvtsi32_si128(*(const int32_t *)(src + 4 * o)), shuf));
  };
  if (ax.filter == F_BOX) {
    // fused box span walk: whole pixels accumulate straight from the
    // source bytes (load+shuffle+widen) -- the separate unpack pass and
    // its row round trip disappear.  Same arithmetic as the unp-based
    // walk in hfilter_row: 4 px per 256-bit add on wide spans, px pairs
    // at 128 bits, single pixels and fractional edges at 4-byte width.
    int pos = 1;
    __m128i left = _mm_and_si128(px1(0), m8);  // weight 256 = identity
    // whole-pixel accumulate for one span (shared by the pair loop and
    // the tail): 4 px per 256-bit add, pairs at 128, one single
    const auto span_acc = [&](int nspan) {
      int sp = 0;
      __m128i acc2 = _mm_setzero_si128();
      if (nspan >= 4) {
        __m256i acc4 = _mm256_setzero_si256();
        for (; sp + 4 <= nspan; sp += 4, pos += 4) {
          _mm_prefetch((const char *)(src + 4 * pos) + 1536, _MM_HINT_T0);
          acc4 = _mm256_add_epi16(acc4, px4(pos));
        }
        acc2 = _mm_add_epi16(_mm256_castsi256_si128(acc4),
                             _mm256_extracti128_si256(acc4, 1));
      }
      for (; sp + 2 <= nspan; sp += 2, pos += 2)
        acc2 = _mm_add_epi16(acc2, px2(pos));  // 2 px in 8 lanes
      __m128i acc = _mm_add_epi16(acc2, _mm_unpackhi_epi64(acc2, acc2));
      if (sp < nspan) {
        acc = _mm_add_epi16(acc, px1(pos));
        pos++;
      }
      return acc;
    };
    int j = 0;
    // span PAIRS: both spans' fractional edges, left-edge carries and
    // scale_span normalizations run side by side in 8 u16 / 8 i32 lanes
    // -- per-span bookkeeping is the box walk's cost at 10:1 spans.
    // w_out-1 excludes the last output (its fac>0 edge rule differs).
    for (; j + 2 <= w_out - 1; j += 2) {
      const __m128i acc_a = span_acc(ax.stride[j]);
      const __m128i r_a = px1(pos);
      pos++;
      const __m128i acc_b = span_acc(ax.stride[j + 1]);
      const __m128i r_b = px1(pos);
      pos++;
      const __m128i A0 = _mm_unpacklo_epi64(acc_a, acc_b);
      const __m128i R = _mm_unpacklo_epi64(r_a, r_b);
      const __m128i F = _mm_unpacklo_epi64(
          _mm_set1_epi16((short)ax.fac[j]),
          _mm_set1_epi16((short)ax.fac[j + 1]));
      const __m128i RF = _mm_mullo_epi16(R, F);
      const __m128i E = _mm_and_si128(_mm_srli_epi16(RF, 8), m8);
      // next-lefts for spans j+1 and j+2: (r*255 - r*f) >> 8 & 0xff
      const __m128i Lnext = _mm_and_si128(
          _mm_srli_epi16(
              _mm_sub_epi16(_mm_mullo_epi16(R, _mm_set1_epi16(255)), RF), 8),
          m8);
      const __m128i L = _mm_unpacklo_epi64(left, Lnext);
      left = _mm_unpackhi_epi64(Lnext, Lnext);
      const __m128i A = _mm_add_epi16(_mm_add_epi16(A0, E), L);
      const __m256i r8 = scale_span_vec8(_mm256_cvtepu16_epi32(A),
                                         (uint32_t)ax.span_mul, 0xff);
      const __m128i packed = _mm_packus_epi32(
          _mm256_castsi256_si128(r8), _mm256_extracti128_si256(r8, 1));
      _mm_storeu_si128((__m128i *)(d + 4 * j), packed);
    }
    for (; j < w_out; j++) {
      const bool last = j == w_out - 1;
      __m128i acc = _mm_add_epi16(span_acc(ax.stride[j]), left);
      const __m128i f = _mm_set1_epi16((short)ax.fac[j]);
      if (!last) {
        const __m128i r = px1(pos);
        pos++;
        acc = _mm_add_epi16(
            acc,
            _mm_and_si128(_mm_srli_epi16(_mm_mullo_epi16(r, f), 8), m8));
        const __m128i r255 = _mm_mullo_epi16(r, _mm_set1_epi16(255));
        left = _mm_and_si128(
            _mm_srli_epi16(_mm_sub_epi16(r255, _mm_mullo_epi16(r, f)), 8),
            m8);
      } else if (ax.fac[j] > 0) {
        const __m128i r = px1(pos);
        acc = _mm_add_epi16(
            acc,
            _mm_and_si128(_mm_srli_epi16(_mm_mullo_epi16(r, f), 8), m8));
      }
      const __m128i r = scale_span_vec4(_mm_cvtepu16_epi32(acc),
                                        (uint32_t)ax.span_mul, 0xff);
      _mm_storel_epi64((__m128i *)(d + 4 * j), _mm_packus_epi32(r, r));
    }
    return;
  }
  if (n == 1 && ax.lerp_stride2) {
    // fused even-ratio 1h ladder (e.g. 4:1): one 16-byte source load +
    // shuffle + widen covers both samples' endpoint pairs per output --
    // the separate unpack pass disappears entirely
    int j = 0;
    for (; j + 2 <= w_out; j += 2) {
      // DRAM-resident inputs (UHD+) need the stream prefetched ~8
      // iterations ahead -- without it the per-output load+shuffle+widen
      // chain exposes full memory latency and fusion loses to the
      // separate unpack sweep
      _mm_prefetch((const char *)(src + 4 * ax.off[2 * j]) + 1536,
                   _MM_HINT_T0);
      const __m256i v0 = px4(ax.off[2 * j]);
      const __m256i q0 = _mm256_unpackhi_epi64(v0, v0);
      const __m256i f0 = _mm256_loadu_si256(
          (const __m256i *)(ax.fac16.data() + 16 * j));
      const __m256i r0 = _mm256_and_si256(
          _mm256_add_epi16(
              _mm256_srli_epi16(
                  _mm256_mullo_epi16(_mm256_sub_epi16(v0, q0), f0), 8),
              q0),
          m8w);
      const __m256i v1 = px4(ax.off[2 * j + 2]);
      const __m256i q1 = _mm256_unpackhi_epi64(v1, v1);
      const __m256i f1 = _mm256_loadu_si256(
          (const __m256i *)(ax.fac16.data() + 16 * j + 16));
      const __m256i r1 = _mm256_and_si256(
          _mm256_add_epi16(
              _mm256_srli_epi16(
                  _mm256_mullo_epi16(_mm256_sub_epi16(v1, q1), f1), 8),
              q1),
          m8w);
      __m256i s = _mm256_add_epi16(
          _mm256_permute2x128_si256(r0, r1, 0x20),
          _mm256_permute2x128_si256(r0, r1, 0x31));
      s = _mm256_and_si256(_mm256_srli_epi16(s, 1), m8w);
      s = _mm256_permute4x64_epi64(s, 0xD8);
      _mm_storeu_si128((__m128i *)(d + 4 * j), _mm256_castsi256_si128(s));
    }
    for (; j < w_out; j++) {
      const __m256i v0 = px4(ax.off[2 * j]);
      const __m256i q0 = _mm256_unpackhi_epi64(v0, v0);
      const __m256i f0 = _mm256_loadu_si256(
          (const __m256i *)(ax.fac16.data() + 16 * j));
      const __m256i r0 = _mm256_and_si256(
          _mm256_add_epi16(
              _mm256_srli_epi16(
                  _mm256_mullo_epi16(_mm256_sub_epi16(v0, q0), f0), 8),
              q0),
          m8w);
      __m128i s = _mm_add_epi16(_mm256_castsi256_si128(r0),
                                _mm256_extracti128_si256(r0, 1));
      s = _mm_and_si128(_mm_srli_epi16(s, 1), m8);
      _mm_storel_epi64((__m128i *)(d + 4 * j), s);
    }
    return;
  }
  assert(n == 0);  // fuse_h selects 0h plans and even-ratio 1h ladders
  {
    int j = 0;
    if (ax.lerp_stride2) {
      for (; j + 2 <= w_out; j += 2) {
        _mm_prefetch((const char *)(src + 4 * ax.off[j]) + 1536,
                     _MM_HINT_T0);
        const __m256i v = px4(ax.off[j]);
        const __m256i q = _mm256_unpackhi_epi64(v, v);
        const __m256i f = _mm256_loadu_si256(
            (const __m256i *)(ax.fac16.data() + 8 * j));
        __m256i r = _mm256_add_epi16(
            _mm256_srli_epi16(
                _mm256_mullo_epi16(_mm256_sub_epi16(v, q), f), 8),
            q);
        r = _mm256_permute4x64_epi64(_mm256_and_si256(r, m8w), 0xD8);
        _mm_storeu_si128((__m128i *)(d + 4 * j), _mm256_castsi256_si128(r));
      }
    }
    const uint8_t *r4 = ax.run4.data();
    while (ax.run4_any && j + 2 <= w_out) {
      if (r4[j]) {
        _mm_prefetch((const char *)(src + 4 * ax.off[j]) + 1536,
                     _MM_HINT_T0);
        const __m256i pv = px4(ax.off[j]);
        const __m256i qv = px4(ax.off[j] + 1);
        const __m256i f = _mm256_loadu_si256(
            (const __m256i *)(ax.fac4.data() + 4 * j));
        const __m256i r = _mm256_add_epi16(
            _mm256_srli_epi16(
                _mm256_mullo_epi16(_mm256_sub_epi16(pv, qv), f), 8),
            qv);
        _mm256_storeu_si256((__m256i *)(d + 4 * j),
                            _mm256_and_si256(r, m8w));
        j += 4;
        continue;
      }
      // arbitrary-stride pair: both outputs' endpoint pairs in one 128-bit
      // register (two 64-bit loads), ONE byte shuffle + ONE widen (the px2
      // form paid 2 shuffles + 2 widens + an insert)
      _mm_prefetch((const char *)(src + 4 * ax.off[j]) + 1536, _MM_HINT_T0);
      const __m128i pairs = _mm_unpacklo_epi64(
          _mm_loadl_epi64((const __m128i *)(src + 4 * ax.off[j])),
          _mm_loadl_epi64((const __m128i *)(src + 4 * ax.off[j + 1])));
      const __m256i v =
          _mm256_cvtepu8_epi16(_mm_shuffle_epi8(pairs, shuf));
      const __m256i q = _mm256_unpackhi_epi64(v, v);
      const __m256i f = _mm256_loadu_si256(
          (const __m256i *)(ax.fac16.data() + 8 * j));
      __m256i r = _mm256_add_epi16(
          _mm256_srli_epi16(
              _mm256_mullo_epi16(_mm256_sub_epi16(v, q), f), 8),
          q);
      r = _mm256_permute4x64_epi64(_mm256_and_si256(r, m8w), 0xD8);
      _mm_storeu_si128((__m128i *)(d + 4 * j), _mm256_castsi256_si128(r));
      j += 2;
    }
    for (; j + 4 <= w_out; j += 4) {
      // 4-output fused batch (mixed-stride downscales, no stride-1 runs):
      // four 4-byte-pixel pair loads straight from the source bytes, two
      // shuffle+widen ops, then the same P/Q-quad full-density lerp as
      // hbilin_u16 -- the separate unpack pass and its u16 row round trip
      // disappear (the win that matters once rows outgrow L1)
      _mm_prefetch((const char *)(src + 4 * ax.off[j]) + 1536, _MM_HINT_T0);
      const __m128i pa = _mm_unpacklo_epi64(
          _mm_loadl_epi64((const __m128i *)(src + 4 * ax.off[j])),
          _mm_loadl_epi64((const __m128i *)(src + 4 * ax.off[j + 1])));
      const __m128i pb = _mm_unpacklo_epi64(
          _mm_loadl_epi64((const __m128i *)(src + 4 * ax.off[j + 2])),
          _mm_loadl_epi64((const __m128i *)(src + 4 * ax.off[j + 3])));
      const __m256i v0 = _mm256_cvtepu8_epi16(_mm_shuffle_epi8(pa, shuf));
      const __m256i v1 = _mm256_cvtepu8_epi16(_mm_shuffle_epi8(pb, shuf));
      const __m256i P = _mm256_unpacklo_epi64(v0, v1);
      const __m256i Q = _mm256_unpackhi_epi64(v0, v1);
      const __m256i f = _mm256_loadu_si256(
          (const __m256i *)(ax.fac16q.data() + 4 * j));
      __m256i r = _mm256_add_epi16(
          _mm256_srli_epi16(
              _mm256_mullo_epi16(_mm256_sub_epi16(P, Q), f), 8),
          Q);
      r = _mm256_permute4x64_epi64(_mm256_and_si256(r, m8w), 0xD8);
      _mm256_storeu_si256((__m256i *)(d + 4 * j), r);
    }
    while (j + 2 <= w_out) {
      // fused pair tail
      const __m128i pairs = _mm_unpacklo_epi64(
          _mm_loadl_epi64((const __m128i *)(src + 4 * ax.off[j])),
          _mm_loadl_epi64((const __m128i *)(src + 4 * ax.off[j + 1])));
      const __m256i v =
          _mm256_cvtepu8_epi16(_mm_shuffle_epi8(pairs, shuf));
      const __m256i q = _mm256_unpackhi_epi64(v, v);
      const __m256i f = _mm256_loadu_si256(
          (const __m256i *)(ax.fac16.data() + 8 * j));
      __m256i r = _mm256_add_epi16(
          _mm256_srli_epi16(
              _mm256_mullo_epi16(_mm256_sub_epi16(v, q), f), 8),
          q);
      r = _mm256_permute4x64_epi64(_mm256_and_si256(r, m8w), 0xD8);
      _mm_storeu_si128((__m128i *)(d + 4 * j), _mm256_castsi256_si128(r));
      j += 2;
    }
    for (; j < w_out; j++) {
      const __m128i v = px2(ax.off[j]);
      const __m128i q = _mm_unpackhi_epi64(v, v);
      const __m128i f = _mm_set1_epi16((short)ax.fac[j]);
      __m128i r = _mm_add_epi16(
          _mm_srli_epi16(_mm_mullo_epi16(_mm_sub_epi16(v, q), f), 8), q);
      r = _mm_and_si128(r, m8);
      _mm_storel_epi64((__m128i *)(d + 4 * j), r);
    }
    return;
  }
}
#endif

// h-scaled row provider with a tiny 2-slot cache (bilinear reuses the
// shared row between consecutive sample pairs; the analogue of the
// reference's SmolVerticalCtx row reuse, generic.c:1648-1682).
template <typename T>
static const T *get_hrow(Worker<T> *w, const uint8_t *pixels,
                         int64_t rowstride, int row) {
  for (int s = 0; s < 2; s++)
    if (w->hrow_idx[s] == row) return w->hrow[s].data();
  int slot = (w->hrow_idx[0] <= w->hrow_idx[1]) ? 0 : 1;
#if defined(__AVX2__)
  if constexpr (sizeof(T) == 2) {
    if (w->p->fuse_h) {
      hfilter_row_fused_u16(w->p, pixels + rowstride * row,
                            (uint16_t *)w->hrow[slot].data());
      w->hrow_idx[slot] = row;
      return w->hrow[slot].data();
    }
  }
#endif
  unpack_row(w->p, pixels + rowstride * row, w->unp.data());
  hfilter_row(w->p, w->unp.data(), w->hrow[slot].data());
  w->hrow_idx[slot] = row;
  return w->hrow[slot].data();
}

template <typename T>
static void pack_row(const Plan *p, const T *planes, uint8_t *dst) {
  const int w = p->w_out;
  const int nb = p->nb_out;
  const bool out_premul = alpha_of(p->type_out) == A_PREMUL8;

  if (p->ialpha == A_PREMUL8 && p->gamma == G_COMPRESSED && out_premul &&
      nb == 4) {
    const int l0 = p->lout[0], l1 = p->lout[1], l2 = p->lout[2],
              l3 = p->lout[3];
#if defined(__AVX2__)
    if (sizeof(T) == 2) {
      // 4 px/iter: narrow 16 u16 lanes (values <= 255) to bytes, then one
      // shuffle applies the output channel permutation
      const uint16_t *u = (const uint16_t *)planes;
      const __m128i shuf = _mm_setr_epi8(
          (char)l0, (char)l1, (char)l2, (char)l3,
          (char)(4 + l0), (char)(4 + l1), (char)(4 + l2), (char)(4 + l3),
          (char)(8 + l0), (char)(8 + l1), (char)(8 + l2), (char)(8 + l3),
          (char)(12 + l0), (char)(12 + l1), (char)(12 + l2), (char)(12 + l3));
      int i = 0;
      for (; i + 4 <= w; i += 4) {
        const __m128i a = _mm_loadu_si128((const __m128i *)(u + 4 * i));
        const __m128i b = _mm_loadu_si128((const __m128i *)(u + 4 * i + 8));
        const __m128i bytes = _mm_packus_epi16(a, b);
        _mm_storeu_si128((__m128i *)(dst + 4 * i),
                         _mm_shuffle_epi8(bytes, shuf));
      }
      for (; i < w; i++) {
        dst[4 * i + 0] = (uint8_t)(u[4 * i + l0] & 0xff);
        dst[4 * i + 1] = (uint8_t)(u[4 * i + l1] & 0xff);
        dst[4 * i + 2] = (uint8_t)(u[4 * i + l2] & 0xff);
        dst[4 * i + 3] = (uint8_t)(u[4 * i + l3] & 0xff);
      }
      return;
    }
#endif
    for (int i = 0; i < w; i++) {
      dst[4 * i + 0] = (uint8_t)(planes[4 * i + l0] & 0xff);
      dst[4 * i + 1] = (uint8_t)(planes[4 * i + l1] & 0xff);
      dst[4 * i + 2] = (uint8_t)(planes[4 * i + l2] & 0xff);
      dst[4 * i + 3] = (uint8_t)(planes[4 * i + l3] & 0xff);
    }
    return;
  }
#if defined(__AVX2__)
  if (p->gamma == G_COMPRESSED && nb == 4 &&
      ((sizeof(T) == 2 && p->ialpha == A_PREMUL8 && !out_premul) ||
       ((sizeof(T) == 4 || sizeof(T) == 2) && p->ialpha == A_PREMUL16))) {
    // unpremultiply on 8 i32 lanes, 4 px per iteration.  PREMUL8:
    // (v * kInvDivP8[a]) >> 13, products <= 255 * 0x181fff < 2**31.
    // PREMUL16: (v * kInvDivP16[a]) >> 16 with v <= 65408 and entries
    // <= 2**16, products < 2**32 exactly (the table was sized for this,
    // generic.c's inverted_div_lut contract), so a 32-bit mullo + logical
    // shift is exact; alpha rides in lane 3 as a (P8) / (a<<8)|0x80 (P16).
    const bool p16 = p->ialpha == A_PREMUL16;
    const uint32_t *invtab = p16 ? kInvDivP16 : kInvDivP8;
    const int sh = p16 ? 16 : 13;
    const int l0 = p->lout[0], l1 = p->lout[1], l2 = p->lout[2],
              l3 = p->lout[3];
    // combined pixel order after the two packs: [px0, px2, px1, px3]
    static const char kPos[4] = {0, 8, 4, 12};
    const __m128i shuf = _mm_setr_epi8(
        (char)(kPos[0] + l0), (char)(kPos[0] + l1), (char)(kPos[0] + l2),
        (char)(kPos[0] + l3),
        (char)(kPos[1] + l0), (char)(kPos[1] + l1), (char)(kPos[1] + l2),
        (char)(kPos[1] + l3),
        (char)(kPos[2] + l0), (char)(kPos[2] + l1), (char)(kPos[2] + l2),
        (char)(kPos[2] + l3),
        (char)(kPos[3] + l0), (char)(kPos[3] + l1), (char)(kPos[3] + l2),
        (char)(kPos[3] + l3));
    const __m256i m8 = _mm256_set1_epi32(0xff);
    int i = 0;
    for (; i + 4 <= w; i += 4) {
      __m256i v01, v23;
      int a[4];
      if (sizeof(T) == 2) {
        const uint16_t *u = (const uint16_t *)planes;
        v01 = _mm256_cvtepu16_epi32(
            _mm_loadu_si128((const __m128i *)(u + 4 * i)));
        v23 = _mm256_cvtepu16_epi32(
            _mm_loadu_si128((const __m128i *)(u + 4 * i + 8)));
        // PREMUL8 alpha rides raw; narrow16 PREMUL16 alpha is (a<<8)|0x80
        const int ash = p16 ? 8 : 0;
        a[0] = (u[4 * i + 3] >> ash) & 0xff;
        a[1] = (u[4 * i + 7] >> ash) & 0xff;
        a[2] = (u[4 * i + 11] >> ash) & 0xff;
        a[3] = (u[4 * i + 15] >> ash) & 0xff;
      } else {
        const int32_t *u = (const int32_t *)planes;
        v01 = _mm256_loadu_si256((const __m256i *)(u + 4 * i));
        v23 = _mm256_loadu_si256((const __m256i *)(u + 4 * i + 8));
        a[0] = (u[4 * i + 3] >> 8) & 0xff;  a[1] = (u[4 * i + 7] >> 8) & 0xff;
        a[2] = (u[4 * i + 11] >> 8) & 0xff; a[3] = (u[4 * i + 15] >> 8) & 0xff;
      }
      // per-pixel vmovd+vpbroadcastd of the inv-div factor and the raw
      // alpha (2x faster than 8-scalar _mm256_setr builds and than a
      // vpgatherdd on this class of core); the alpha lane multiplies by
      // the factor too and is re-inserted by the 0x88 blend.
      const __m256i inv01 = _mm256_set_m128i(
          _mm_set1_epi32((int)invtab[a[1]]), _mm_set1_epi32((int)invtab[a[0]]));
      const __m256i inv23 = _mm256_set_m128i(
          _mm_set1_epi32((int)invtab[a[3]]), _mm_set1_epi32((int)invtab[a[2]]));
      const __m256i a01 = _mm256_set_m128i(_mm_set1_epi32(a[1]),
                                           _mm_set1_epi32(a[0]));
      const __m256i a23 = _mm256_set_m128i(_mm_set1_epi32(a[3]),
                                           _mm_set1_epi32(a[2]));
      __m256i r01 = _mm256_blend_epi32(
          _mm256_and_si256(
              _mm256_srli_epi32(_mm256_mullo_epi32(v01, inv01), sh), m8),
          a01, 0x88);
      __m256i r23 = _mm256_blend_epi32(
          _mm256_and_si256(
              _mm256_srli_epi32(_mm256_mullo_epi32(v23, inv23), sh), m8),
          a23, 0x88);
      // i32 -> u16 -> u8 (values <= 255, no saturation), then one shuffle
      // applies pixel reorder + output channel layout
      const __m256i y = _mm256_packus_epi32(r01, r23);   // [px0,px2|px1,px3]
      const __m256i b = _mm256_packus_epi16(y, y);
      const __m128i combined = _mm_unpacklo_epi64(
          _mm256_castsi256_si128(b), _mm256_extracti128_si256(b, 1));
      _mm_storeu_si128((__m128i *)(dst + 4 * i),
                       _mm_shuffle_epi8(combined, shuf));
    }
    for (; i < w; i++) {
      const T *px = planes + 4 * i;
      int64_t c[4];
      if (p16) {
        const int64_t av = (px[3] >> 8) & 0xff;
        for (int k = 0; k < 3; k++) c[k] = unpremul_p16(px[k], av);
        c[3] = av;
      } else {
        const int64_t av = px[3] & 0xff;
        for (int k = 0; k < 3; k++) c[k] = unpremul_p8(px[k], av);
        c[3] = av;
      }
      for (int bq = 0; bq < 4; bq++)
        dst[i * 4 + bq] = (uint8_t)(c[p->lout[bq]] & 0xff);
    }
    return;
  }
  if (sizeof(T) == 2 && p->ialpha == A_PREMUL8 && p->gamma == G_LINEAR &&
      nb == 4) {
    // linear-light pack, 4 px/iter (narrow16 u16 planes): unpremultiply in
    // linear space ((v * kInvDivP8L[a]) >> 10 & 0x7ff -- products <=
    // 2047 * 258779 < 2**31, i32-exact), sRGB-encode via one vpgatherdd on
    // the i32 kToSrgb copy per half, re-premultiply for premul outputs
    // (premul_p8 products fit i32), alpha byte rides raw via 0x88 blend.
    const int l0 = p->lout[0], l1 = p->lout[1], l2 = p->lout[2],
              l3 = p->lout[3];
    static const char kPos[4] = {0, 8, 4, 12};
    const __m128i shuf = _mm_setr_epi8(
        (char)(kPos[0] + l0), (char)(kPos[0] + l1), (char)(kPos[0] + l2),
        (char)(kPos[0] + l3),
        (char)(kPos[1] + l0), (char)(kPos[1] + l1), (char)(kPos[1] + l2),
        (char)(kPos[1] + l3),
        (char)(kPos[2] + l0), (char)(kPos[2] + l1), (char)(kPos[2] + l2),
        (char)(kPos[2] + l3),
        (char)(kPos[3] + l0), (char)(kPos[3] + l1), (char)(kPos[3] + l2),
        (char)(kPos[3] + l3));
    const __m256i one = _mm256_set1_epi32(1);
    const __m256i m7ff = _mm256_set1_epi32(0x7ff);
    const __m256i m255 = _mm256_set1_epi32(0xff);
    const uint16_t *u = (const uint16_t *)planes;
    auto half = [&](__m256i v, int aa, int ab) {
      const __m256i iv = _mm256_set_m128i(
          _mm_set1_epi32(kT32.inv_p8l[ab]), _mm_set1_epi32(kT32.inv_p8l[aa]));
      const __m256i un = _mm256_and_si256(
          _mm256_srli_epi32(_mm256_mullo_epi32(v, iv), 10), m7ff);
      const __m256i s = _mm256_i32gather_epi32(kT32.to_srgb, un, 4);
      const __m256i av = _mm256_set_m128i(_mm_set1_epi32(ab),
                                          _mm_set1_epi32(aa));
      __m256i r = s;
      if (out_premul)
        r = _mm256_and_si256(
            _mm256_srli_epi32(
                _mm256_sub_epi32(
                    _mm256_mullo_epi32(_mm256_add_epi32(s, one),
                                       _mm256_add_epi32(av, one)),
                    one),
                8),
            m255);
      return _mm256_blend_epi32(r, av, 0x88);
    };
    int i = 0;
    for (; i + 4 <= w; i += 4) {
      const __m256i row = _mm256_loadu_si256((const __m256i *)(u + 4 * i));
      const int a0 = u[4 * i + 3] & 0xff, a1 = u[4 * i + 7] & 0xff;
      const int a2 = u[4 * i + 11] & 0xff, a3 = u[4 * i + 15] & 0xff;
      const __m256i r01 = half(
          _mm256_cvtepu16_epi32(_mm256_castsi256_si128(row)), a0, a1);
      const __m256i r23 = half(
          _mm256_cvtepu16_epi32(_mm256_extracti128_si256(row, 1)), a2, a3);
      const __m256i y = _mm256_packus_epi32(r01, r23);  // [px0,px2|px1,px3]
      const __m256i b = _mm256_packus_epi16(y, y);
      const __m128i combined = _mm_unpacklo_epi64(
          _mm256_castsi256_si128(b), _mm256_extracti128_si256(b, 1));
      _mm_storeu_si128((__m128i *)(dst + 4 * i),
                       _mm_shuffle_epi8(combined, shuf));
    }
    for (; i < w; i++) {
      const uint16_t *px = u + 4 * i;
      const int64_t a = px[3] & 0xff;
      int64_t c[4];
      for (int k = 0; k < 3; k++) {
        const int64_t t = kToSrgb[unpremul_p8l(px[k], a)];
        c[k] = out_premul ? premul_p8(t, a) : t;
      }
      c[3] = a;
      for (int bq = 0; bq < 4; bq++)
        dst[i * 4 + bq] = (uint8_t)(c[p->lout[bq]] & 0xff);
    }
    return;
  }
  if (sizeof(T) == 2 && p->ialpha == A_PREMUL8 && p->gamma == G_LINEAR &&
      nb == 3) {
    // 24bpp linear-light pack: pack24_direct plans (the reference's
    // to-sRGB-of-premul asymmetry, generic.c:922-935) skip the
    // unpremultiply -- one gather per half; the non-direct form shares
    // the unpremul+gather pipeline of the 4-byte branch.  12 bytes per
    // 4 px; the 4 garbage bytes past each store are overwritten by the
    // next iteration (tail is scalar).
    const bool direct = p->pack24_direct;
    const int l0 = p->lout[0], l1 = p->lout[1], l2 = p->lout[2];
    static const char kPos[4] = {0, 8, 4, 12};
    const __m128i shuf = _mm_setr_epi8(
        (char)(kPos[0] + l0), (char)(kPos[0] + l1), (char)(kPos[0] + l2),
        (char)(kPos[1] + l0), (char)(kPos[1] + l1), (char)(kPos[1] + l2),
        (char)(kPos[2] + l0), (char)(kPos[2] + l1), (char)(kPos[2] + l2),
        (char)(kPos[3] + l0), (char)(kPos[3] + l1), (char)(kPos[3] + l2),
        -1, -1, -1, -1);
    const __m256i m7ff = _mm256_set1_epi32(0x7ff);
    const uint16_t *u = (const uint16_t *)planes;
    auto half = [&](__m256i v, int aa, int ab) {
      __m256i un;
      if (direct) {
        un = _mm256_and_si256(v, m7ff);
      } else {
        const __m256i iv = _mm256_set_m128i(
            _mm_set1_epi32(kT32.inv_p8l[ab]),
            _mm_set1_epi32(kT32.inv_p8l[aa]));
        un = _mm256_and_si256(
            _mm256_srli_epi32(_mm256_mullo_epi32(v, iv), 10), m7ff);
      }
      return _mm256_i32gather_epi32(kT32.to_srgb, un, 4);
    };
    int i = 0;
    for (; i + 4 <= w && 3 * i + 16 <= 3 * w; i += 4) {
      const __m256i row = _mm256_loadu_si256((const __m256i *)(u + 4 * i));
      const int a0 = u[4 * i + 3] & 0xff, a1 = u[4 * i + 7] & 0xff;
      const int a2 = u[4 * i + 11] & 0xff, a3 = u[4 * i + 15] & 0xff;
      const __m256i r01 = half(
          _mm256_cvtepu16_epi32(_mm256_castsi256_si128(row)), a0, a1);
      const __m256i r23 = half(
          _mm256_cvtepu16_epi32(_mm256_extracti128_si256(row, 1)), a2, a3);
      const __m256i y = _mm256_packus_epi32(r01, r23);  // [px0,px2|px1,px3]
      const __m256i b = _mm256_packus_epi16(y, y);
      const __m128i combined = _mm_unpacklo_epi64(
          _mm256_castsi256_si128(b), _mm256_extracti128_si256(b, 1));
      _mm_storeu_si128((__m128i *)(dst + 3 * i),
                       _mm_shuffle_epi8(combined, shuf));
    }
    for (; i < w; i++) {
      const uint16_t *px = u + 4 * i;
      const int64_t a = px[3] & 0xff;
      int64_t c[4];
      for (int k = 0; k < 3; k++)
        c[k] = direct ? kToSrgb[px[k] & 0x7ff]
                      : kToSrgb[unpremul_p8l(px[k], a)];
      c[3] = a;
      for (int bq = 0; bq < 3; bq++)
        dst[i * 3 + bq] = (uint8_t)(c[p->lout[bq]] & 0xff);
    }
    return;
  }
  if (sizeof(T) == 2 && p->ialpha == A_PREMUL8 && p->gamma == G_COMPRESSED &&
      out_premul && nb == 3) {
    // 24bpp output of premul values: bytes through the same packus +
    // permutation shuffle, 12 bytes per 4 px; the 4 garbage bytes beyond
    // each store are overwritten by the next iteration (tail is scalar)
    const uint16_t *u = (const uint16_t *)planes;
    const int l0 = p->lout[0], l1 = p->lout[1], l2 = p->lout[2];
    const __m128i shuf = _mm_setr_epi8(
        (char)l0, (char)l1, (char)l2,
        (char)(4 + l0), (char)(4 + l1), (char)(4 + l2),
        (char)(8 + l0), (char)(8 + l1), (char)(8 + l2),
        (char)(12 + l0), (char)(12 + l1), (char)(12 + l2), -1, -1, -1, -1);
    int i = 0;
    for (; i + 4 <= w && 3 * i + 16 <= 3 * w; i += 4) {
      const __m128i a = _mm_loadu_si128((const __m128i *)(u + 4 * i));
      const __m128i b = _mm_loadu_si128((const __m128i *)(u + 4 * i + 8));
      const __m128i bytes = _mm_packus_epi16(a, b);
      _mm_storeu_si128((__m128i *)(dst + 3 * i),
                       _mm_shuffle_epi8(bytes, shuf));
    }
    for (; i < w; i++) {
      dst[3 * i + 0] = (uint8_t)(u[4 * i + l0] & 0xff);
      dst[3 * i + 1] = (uint8_t)(u[4 * i + l1] & 0xff);
      dst[3 * i + 2] = (uint8_t)(u[4 * i + l2] & 0xff);
    }
    return;
  }
#endif
  for (int i = 0; i < w; i++) {
    const T *px = planes + 4 * i;
    int64_t c[4], a;
    if (p->ialpha == A_PREMUL8) {
      a = px[3] & 0xff;
      if (p->gamma == G_COMPRESSED) {
        for (int k = 0; k < 3; k++)
          c[k] = out_premul ? px[k] : unpremul_p8(px[k], a);
      } else if (out_premul) {
        if (nb == 3 && p->pack24_direct) {
          // reference asymmetry: to_srgb of premul-linear (generic.c:922-935)
          for (int k = 0; k < 3; k++) c[k] = kToSrgb[px[k] & 0x7ff];
        } else if (nb == 3) {
          for (int k = 0; k < 3; k++) c[k] = kToSrgb[unpremul_p8l(px[k], a)];
        } else {
          for (int k = 0; k < 3; k++)
            c[k] = premul_p8(kToSrgb[unpremul_p8l(px[k], a)], a);
        }
      } else {
        for (int k = 0; k < 3; k++) c[k] = kToSrgb[unpremul_p8l(px[k], a)];
      }
    } else {  // PREMUL16, output always unassociated
      a = (px[3] >> 8) & 0xff;
      if (p->gamma == G_COMPRESSED)
        for (int k = 0; k < 3; k++) c[k] = unpremul_p16(px[k], a);
      else
        for (int k = 0; k < 3; k++) c[k] = kToSrgb[unpremul_p16l(px[k], a)];
    }
    c[3] = a;
    for (int b = 0; b < nb; b++) dst[i * nb + b] = (uint8_t)(c[p->lout[b]] & 0xff);
  }
}

template <typename T>
static void scale_outrow(Worker<T> *w, const uint8_t *pixels_in,
                         int64_t rowstride_in, int i, uint8_t *row_out) {
  const Plan *p = w->p;
  const AxisPlan &ay = p->y;
  const int64_t mask = p->mask();
  const int n4 = 4 * p->w_out;
  T *tmp = w->tmp.data();
  switch (ay.filter) {
    case F_COPY: {
      const T *r = get_hrow(w, pixels_in, rowstride_in, i);
      pack_row(p, r, row_out);
      return;
    }
    case F_ONE: {
      const T *r = get_hrow(w, pixels_in, rowstride_in, 0);
      pack_row(p, r, row_out);
      return;
    }
    case F_BILIN: {
      const int n = ay.halvings;
      T *accum = w->acc.data();
#if defined(__AVX2__)
      if constexpr (sizeof(T) == 2) {
        const bool wide = p->storage != S64;  // narrow16 S128 mode
        if (n == 0) {  // single sample: lerp straight into tmp
          const int o = ay.off[i];
          const T *top = get_hrow(w, pixels_in, rowstride_in, o);
          const T *bot = get_hrow(w, pixels_in, rowstride_in, o + 1);
          if (!wide && p->ialpha == A_PREMUL8 && p->gamma == G_COMPRESSED &&
              alpha_of(p->type_out) == A_PREMUL8 && p->nb_out == 4) {
            // simple premul pack fuses into the lerp: no tmp row round trip
            row_lerp_pack_u16((const uint16_t *)top, (const uint16_t *)bot,
                              (uint16_t)ay.fac[i], p->lout, row_out,
                              p->w_out);
            return;
          }
          if (wide)
            row_lerp_u16w((const uint16_t *)top, (const uint16_t *)bot,
                          (uint16_t)ay.fac[i], (uint16_t *)tmp, n4);
          else
            row_lerp_u16((const uint16_t *)top, (const uint16_t *)bot,
                         (uint16_t)ay.fac[i], (uint16_t *)tmp, n4);
        } else if (wide && n == 1) {
          // PREMUL16 1h: two-sample sums exceed u16, so lerp sample 0 into
          // tmp and fold sample 1 with the carry-free floor average (the
          // 2-slot hrow cache allows only two live rows per pass)
          const int k = i << 1;
          {
            const int o = ay.off[k];
            const T *top = get_hrow(w, pixels_in, rowstride_in, o);
            const T *bot = get_hrow(w, pixels_in, rowstride_in, o + 1);
            row_lerp_u16w((const uint16_t *)top, (const uint16_t *)bot,
                          (uint16_t)ay.fac[k], (uint16_t *)tmp, n4);
          }
          {
            const int o = ay.off[k + 1];
            const T *top = get_hrow(w, pixels_in, rowstride_in, o);
            const T *bot = get_hrow(w, pixels_in, rowstride_in, o + 1);
            row_lerp_avg_u16w((const uint16_t *)top, (const uint16_t *)bot,
                              (uint16_t)ay.fac[k + 1], (uint16_t *)tmp, n4);
          }
          pack_row(p, tmp, row_out);
          return;
        } else {
          std::memset(accum, 0, sizeof(T) * n4);
          for (int s = 0; s < (1 << n); s++) {
            const int k = (i << n) + s;
            const int o = ay.off[k];
            const T *top = get_hrow(w, pixels_in, rowstride_in, o);
            const T *bot = get_hrow(w, pixels_in, rowstride_in, o + 1);
            if (wide)
              row_lerp_acc_u16w((const uint16_t *)top, (const uint16_t *)bot,
                                (uint16_t)ay.fac[k], (uint16_t *)accum, n4);
            else
              row_lerp_acc_u16((const uint16_t *)top, (const uint16_t *)bot,
                               (uint16_t)ay.fac[k], (uint16_t *)accum, n4);
          }
          if (!wide && p->ialpha == A_PREMUL8 && p->gamma == G_COMPRESSED &&
              alpha_of(p->type_out) == A_PREMUL8 && p->nb_out == 4) {
            row_shift_pack_u16((const uint16_t *)accum, n, p->lout, row_out,
                               p->w_out);
            return;
          }
          if (wide)
            row_shift_u16w((const uint16_t *)accum, n, (uint16_t *)tmp, n4);
          else
            row_shift_mask_u16((const uint16_t *)accum, n, (uint16_t *)tmp,
                               n4);
        }
        pack_row(p, tmp, row_out);
        return;
      }
      if constexpr (sizeof(T) == 4) {
        if (n == 0) {
          const int o = ay.off[i];
          const T *top = get_hrow(w, pixels_in, rowstride_in, o);
          const T *bot = get_hrow(w, pixels_in, rowstride_in, o + 1);
          row_lerp_i32((const int32_t *)top, (const int32_t *)bot,
                       (int32_t)ay.fac[i], (int32_t)mask, (int32_t *)tmp,
                       n4);
        } else {
          std::memset(accum, 0, sizeof(T) * n4);
          for (int s = 0; s < (1 << n); s++) {
            const int k = (i << n) + s;
            const int o = ay.off[k];
            const T *top = get_hrow(w, pixels_in, rowstride_in, o);
            const T *bot = get_hrow(w, pixels_in, rowstride_in, o + 1);
            row_lerp_acc_i32((const int32_t *)top, (const int32_t *)bot,
                             (int32_t)ay.fac[k], (int32_t)mask,
                             (int32_t *)accum, n4);
          }
          row_shift_mask_i32((const int32_t *)accum, n, (int32_t)mask,
                             (int32_t *)tmp, n4);
        }
        pack_row(p, tmp, row_out);
        return;
      }
#endif
      std::memset(accum, 0, sizeof(T) * n4);
      for (int s = 0; s < (1 << n); s++) {
        int k = (i << n) + s;
        int o = ay.off[k];
        int64_t f = ay.fac[k];
        const T *top = get_hrow(w, pixels_in, rowstride_in, o);
        const T *bot = get_hrow(w, pixels_in, rowstride_in, o + 1);
        for (int x = 0; x < n4; x++)
          accum[x] += lerp256<T>(top[x], bot[x], (T)f, (T)mask);
      }
      for (int x = 0; x < n4; x++) tmp[x] = (accum[x] >> n) & mask;
      pack_row(p, tmp, row_out);
      return;
    }
    case F_BOX: {
      int y0 = ay.off[i], y1 = ay.off[i + 1];
      int64_t w1 = (i == 0) ? 256 : 255 - ay.fac[i - 1];
      int64_t w2 = ay.fac[i];
      T *accum = w->acc.data();
#if defined(__AVX2__)
      if constexpr (sizeof(T) == 2) {
        // S64 box: u16-exact (spans <= 255 keep sums <= 65280)
        const T *first = get_hrow(w, pixels_in, rowstride_in, y0);
        row_weight_u16((const uint16_t *)first, (uint16_t)w1,
                       (uint16_t *)accum, n4);
        if (w2 || y1 < p->h_in) {
          const T *last = get_hrow(w, pixels_in, rowstride_in, y1);
          row_weight_acc_u16((const uint16_t *)last, (uint16_t)w2,
                             (uint16_t *)accum, n4);
        }
        for (int yy = y0 + 1; yy < y1; yy++) {
          const T *mid = get_hrow(w, pixels_in, rowstride_in, yy);
          row_add_u16((const uint16_t *)mid, (uint16_t *)accum, n4);
        }
        if (p->ialpha == A_PREMUL8 && p->gamma == G_COMPRESSED &&
            alpha_of(p->type_out) == A_PREMUL8 && p->nb_out == 4) {
          row_scale_span_pack_u16((const uint16_t *)accum,
                                  (uint32_t)ay.span_mul, p->lout, row_out,
                                  p->w_out);
          return;
        }
        row_scale_span_u16((const uint16_t *)accum, (uint32_t)ay.span_mul,
                           (uint16_t *)tmp, n4);
        pack_row(p, tmp, row_out);
        return;
      }
      if constexpr (sizeof(T) == 4) {
        // S128 box: all intermediates exact mod 2**32 (Worker note)
        const T *first = get_hrow(w, pixels_in, rowstride_in, y0);
        row_weight_i32((const int32_t *)first, (int32_t)w1, (int32_t)mask,
                       (int32_t *)accum, n4);
        for (int yy = y0 + 1; yy < y1; yy++) {
          const T *mid = get_hrow(w, pixels_in, rowstride_in, yy);
          row_add_i32((const int32_t *)mid, (int32_t *)accum, n4);
        }
        if (w2 > 0) {
          // last row weighted w2-1 (generic.c:2240-2253)
          const T *last = get_hrow(w, pixels_in, rowstride_in, y1);
          row_weight_acc_i32((const int32_t *)last, (int32_t)(w2 - 1),
                             (int32_t)mask, (int32_t *)accum, n4);
        }
        row_scale_span_i32((const int32_t *)accum, (uint32_t)ay.span_mul,
                           (int32_t *)tmp, n4);
        pack_row(p, tmp, row_out);
        return;
      }
#endif
      {
        const T *first = get_hrow(w, pixels_in, rowstride_in, y0);
        // T-typed weights vectorize (S64: values <= 255, products < 2**16;
        // S128 runs with T = int64 so this is the same arithmetic)
        for (int x = 0; x < n4; x++)
          accum[x] = weight256<T>(first[x], (T)w1, (T)mask);
      }
      if (p->storage == S64) {
        // q = (r*w2)>>8 even when w2==0 (generic.c:2042-2068)
        if (w2 || y1 < p->h_in) {
          const T *last = get_hrow(w, pixels_in, rowstride_in, y1);
          for (int x = 0; x < n4; x++)
            accum[x] += weight256<T>(last[x], (T)w2, (T)mask);
        }
        for (int yy = y0 + 1; yy < y1; yy++) {
          const T *mid = get_hrow(w, pixels_in, rowstride_in, yy);
          for (int x = 0; x < n4; x++) accum[x] += mid[x];
        }
      } else {
        for (int yy = y0 + 1; yy < y1; yy++) {
          const T *mid = get_hrow(w, pixels_in, rowstride_in, yy);
          for (int x = 0; x < n4; x++) accum[x] += mid[x];
        }
        if (w2 > 0) {
          // last row weighted w2-1 (generic.c:2240-2253)
          const T *last = get_hrow(w, pixels_in, rowstride_in, y1);
          for (int x = 0; x < n4; x++)
            accum[x] += weight256<T>(last[x], (T)(w2 - 1), (T)mask);
        }
      }
      for (int x = 0; x < n4; x++)
        tmp[x] = (T)scale_span(zext(accum[x]), ay.span_mul, p->storage);
      pack_row(p, tmp, row_out);
      return;
    }
  }
}

}  // namespace

extern "C" {

// Row-batch API: compute output rows [first, first+n) into dst (contract of
// smol_scale_batch_full, smolscale.c:998-1008: safe to call concurrently
// from multiple threads on the same const plan with disjoint ranges).
void sst_scale_rows(const sst_plan *p, const uint8_t *pixels_in,
                    int64_t rowstride_in, uint8_t *rows_out,
                    int64_t rowstride_out, int first, int n) {
  if (p->storage == S64 || p->narrow16) {
    // u16 lanes: S64 natively, or the narrow16 S128 mode (every true
    // intermediate <= 65408 fits u16; lerp16_wide keeps mod-2**16 exactness)
    Worker<uint16_t> w(p);
    for (int i = first; i < first + n; i++)
      scale_outrow(&w, pixels_in, rowstride_in, i,
                   rows_out + rowstride_out * (i - first));
  } else {
    // int32 lanes: every 128bpp intermediate is exact mod 2**32 (lerp
    // products <= 2**27, box accumulators < 2**32 by the sRGB span cutoff
    // and the w2-1 rule); scale_span zero-extends the wrapped bit pattern.
    Worker<int32_t> w(p);
    for (int i = first; i < first + n; i++)
      scale_outrow(&w, pixels_in, rowstride_in, i,
                   rows_out + rowstride_out * (i - first));
  }
}

// One-shot (smol_scale_simple contract, smolscale.c:957-985).
void sst_scale(const sst_plan *p, const uint8_t *pixels_in,
               int64_t rowstride_in, uint8_t *pixels_out,
               int64_t rowstride_out) {
  sst_scale_rows(p, pixels_in, rowstride_in, pixels_out, rowstride_out, 0,
                 p->h_out);
}

// Threaded batch executor: contiguous output-row chunks per thread (the
// smol-mt harness design, test.c:839-883, as a library feature).
void sst_scale_threaded(const sst_plan *p, const uint8_t *pixels_in,
                        int64_t rowstride_in, uint8_t *pixels_out,
                        int64_t rowstride_out, int n_threads) {
  if (n_threads < 1) n_threads = (int)std::thread::hardware_concurrency();
  n_threads = std::max(1, std::min(n_threads, p->h_out));
  int chunk = (p->h_out + n_threads - 1) / n_threads;
  std::vector<std::thread> ts;
  for (int t = 0; t < n_threads; t++) {
    int first = t * chunk;
    int n = std::min(chunk, p->h_out - first);
    if (n <= 0) break;
    ts.emplace_back([=] {
      sst_scale_rows(p, pixels_in, rowstride_in,
                     pixels_out + rowstride_out * first, rowstride_out, first,
                     n);
    });
  }
  for (auto &t : ts) t.join();
}

int sst_plan_info(const sst_plan *p, int *filter_h, int *filter_v,
                  int *storage, int *ialpha, int *gamma) {
  if (!p) return -1;
  *filter_h = p->x.filter == F_BILIN ? 2 + p->x.halvings
                                     : (p->x.filter == F_BOX ? 9 : p->x.filter);
  *filter_v = p->y.filter == F_BILIN ? 2 + p->y.halvings
                                     : (p->y.filter == F_BOX ? 9 : p->y.filter);
  *storage = p->storage == S64 ? 2 : 3;
  *ialpha = p->ialpha;
  *gamma = p->gamma;
  return 0;
}

}  // extern "C"
