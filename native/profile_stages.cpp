// Stage profiler for the native engine: times unpack/H/V+pack separately
// on one conversion cell (default: BGRA premul -> ARGB premul, the worst
// native-vs-avx2 cell) plus the whole-pipeline sst_scale.  Build:
//   g++ -O3 -mavx2 -std=c++17 native/profile_stages.cpp -o build/profile_stages -lpthread
// The engine's internals are static, so this includes the source directly.
#include "smolscale_cpu.cpp"

#include <chrono>
#include <cstdio>
#include <random>
#include <vector>

static double now_ms() {
  using namespace std::chrono;
  return duration<double, std::milli>(steady_clock::now().time_since_epoch())
      .count();
}

template <typename F>
static double best_ms(F &&f, int reps) {
  double best = 1e30;
  for (int r = 0; r < reps; r++) {
    double t0 = now_ms();
    f();
    double t1 = now_ms();
    if (t1 - t0 < best) best = t1 - t0;
  }
  return best;
}

int main(int argc, char **argv) {
  int type_in = argc > 1 ? atoi(argv[1]) : 1;   // BGRA8_PREMULTIPLIED
  int type_out = argc > 2 ? atoi(argv[2]) : 7;  // ARGB8_PREMULTIPLIED
  int w_in = argc > 3 ? atoi(argv[3]) : 1024, h_in = w_in;
  int w_out = argc > 4 ? atoi(argv[4]) : 1023, h_out = w_out;
  int reps = argc > 5 ? atoi(argv[5]) : 30;

  sst_plan *p = sst_plan_new(w_in, h_in, w_out, h_out, type_in, type_out, 0);
  std::vector<uint8_t> src((size_t)h_in * w_in * n_bytes_of(type_in));
  std::vector<uint8_t> dst((size_t)h_out * w_out * n_bytes_of(type_out));
  std::mt19937 rng(7);
  for (auto &b : src) b = (uint8_t)rng();

  const bool s64 = p->storage == S64 || p->narrow16;  // u16 worker rows
  printf("plan: storage=%s%s filt_h=%d filt_v=%d halv=(%d,%d)\n",
         p->storage == S64 ? "S64" : "S128", p->narrow16 ? "/narrow16" : "",
         p->x.filter, p->y.filter, p->x.halvings, p->y.halvings);

  const long long nb_in = n_bytes_of(type_in), nb_out = n_bytes_of(type_out);
  double t_all = best_ms(
      [&] {
        sst_scale(p, src.data(), nb_in * w_in, dst.data(), nb_out * w_out);
      },
      reps);

  // stage timings on u16 or i32 workers
  auto run_stages = [&](auto tag) {
    using T = decltype(tag);
    Worker<T> w(p);
    std::vector<T> unp((size_t)4 * w_in);
    std::vector<T> hout((size_t)4 * w_out);
    double t_unpack = best_ms(
        [&] {
          for (int i = 0; i < h_in; i++)
            unpack_row(p, src.data() + (size_t)nb_in * w_in * i, unp.data());
        },
        reps);
    double t_h = best_ms(
        [&] {
          for (int i = 0; i < h_in; i++) hfilter_row(p, unp.data(), hout.data());
        },
        reps);
    double t_pack = best_ms(
        [&] {
          for (int i = 0; i < h_out; i++)
            pack_row(p, hout.data(), dst.data() + (size_t)nb_out * w_out * i);
        },
        reps);
    // V-only: lerp two fixed rows h_out times
    std::vector<T> top(hout), bot(hout), tmp((size_t)4 * w_out);
    double t_v = best_ms(
        [&] {
          for (int i = 0; i < h_out; i++) {
            if constexpr (sizeof(T) == 2)
              row_lerp_u16((const uint16_t *)top.data(),
                           (const uint16_t *)bot.data(), 128,
                           (uint16_t *)tmp.data(), 4 * w_out);
            else
              row_lerp_i32((const int32_t *)top.data(),
                           (const int32_t *)bot.data(), 128, (int32_t)p->mask(),
                           (int32_t *)tmp.data(), 4 * w_out);
          }
        },
        reps);
    printf("unpack %7.3f ms | H %7.3f | Vlerp %7.3f | pack %7.3f | sum %7.3f"
           " | pipeline %7.3f\n",
           t_unpack, t_h, t_v, t_pack, t_unpack + t_h + t_v + t_pack, t_all);
  };
  if (s64)
    run_stages(uint16_t{0});
  else
    run_stages(int32_t{0});
  sst_plan_free(p);
  return 0;
}
