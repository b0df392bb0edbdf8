// Control experiment for the "BGZF inflate is memory-bandwidth bound" claim
// (BENCH_NOTES round 4: 2==3==4 native workers at ~3 GB/s aggregate output).
//
// Measures, at 1..4 threads:
//   memcpy  - large-buffer memcpy per thread (disjoint src/dst), the box's
//             practical DRAM copy ceiling (each GB/s of copy = 2 GB/s of
//             DRAM traffic).
//   inflate - libdeflate raw-deflate decompression of realistic ~64 KiB
//             BGZF-sized members (BAM-like byte mix), aggregate OUTPUT GB/s.
//
// If memcpy scales with threads while inflate saturates near its 1-thread
// rate x1, the wall is DRAM; if memcpy has ample headroom at the inflate
// plateau, the wall is libdeflate's per-stream compute and more parallelism
// (or a faster codec path) can move the scan floor.
//
// Build+run: g++ -O2 -pthread scripts/measure_inflate_bw.cpp -ldeflate \
//            -o /tmp/measure_bw && /tmp/measure_bw
#include <libdeflate.h>

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <random>
#include <thread>
#include <vector>

static double now_s() {
  return std::chrono::duration<double>(
             std::chrono::steady_clock::now().time_since_epoch())
      .count();
}

// BAM-like payload: runs of 2-bit-packed-looking bases, qualities with
// limited alphabet, some structured integers - compresses ~2.5-3x like a
// real BAM body (matches the 307 MB -> ~900 MB round-4 datapoint).
static std::vector<uint8_t> make_payload(size_t n, uint32_t seed) {
  std::mt19937 rng(seed);
  std::vector<uint8_t> out(n);
  size_t i = 0;
  while (i < n) {
    int mode = rng() % 3;
    size_t run = 64 + rng() % 192;
    for (size_t j = 0; j < run && i < n; ++j, ++i) {
      if (mode == 0) out[i] = (uint8_t)(rng() % 16);          // packed bases
      else if (mode == 1) out[i] = (uint8_t)(30 + rng() % 8); // quals
      else out[i] = (uint8_t)(rng() % 256);                   // tags/ints
    }
  }
  return out;
}

int main() {
  const int kMaxThreads = 4;
  // ---- memcpy control -------------------------------------------------
  const size_t copy_bytes = size_t(1) << 30;  // 1 GiB per thread
  printf("{\"experiment\": \"memcpy\", \"per_thread_gib\": 1, \"points\": [");
  for (int t = 1; t <= kMaxThreads; ++t) {
    std::vector<std::vector<uint8_t>> src(t), dst(t);
    for (int k = 0; k < t; ++k) {
      src[k].assign(copy_bytes, (uint8_t)k);
      dst[k].assign(copy_bytes, 0);
    }
    double best = 0;
    for (int rep = 0; rep < 3; ++rep) {
      double t0 = now_s();
      std::vector<std::thread> threads;
      for (int k = 0; k < t; ++k)
        threads.emplace_back([&, k] {
          memcpy(dst[k].data(), src[k].data(), copy_bytes);
        });
      for (auto& th : threads) th.join();
      double rate = (double)copy_bytes * t / (now_s() - t0) / 1e9;
      if (rate > best) best = rate;
    }
    printf("%s{\"threads\": %d, \"copy_gb_s\": %.2f}", t > 1 ? ", " : "", t,
           best);
    fflush(stdout);
  }
  printf("]}\n");

  // ---- libdeflate inflate ---------------------------------------------
  const size_t member_out = 65536 - 256;  // BGZF member payload size
  const int n_members = 4096;            // ~256 MiB inflated per pass
  auto payload = make_payload(member_out * 8, 7);
  struct Member {
    std::vector<uint8_t> comp;
    size_t out_size;
  };
  std::vector<Member> members(n_members);
  {
    libdeflate_compressor* comp = libdeflate_alloc_compressor(6);
    std::vector<uint8_t> buf(member_out * 2);
    for (int m = 0; m < n_members; ++m) {
      const uint8_t* p = payload.data() + (m % 8) * member_out;
      size_t n = libdeflate_deflate_compress(comp, p, member_out, buf.data(),
                                             buf.size());
      members[m].comp.assign(buf.data(), buf.data() + n);
      members[m].out_size = member_out;
    }
    libdeflate_free_compressor(comp);
    size_t comp_total = 0;
    for (auto& m : members) comp_total += m.comp.size();
    printf("{\"experiment\": \"inflate_ratio\", \"inflated_mib\": %.0f, "
           "\"compressed_mib\": %.0f}\n",
           (double)member_out * n_members / (1 << 20),
           (double)comp_total / (1 << 20));
  }
  printf("{\"experiment\": \"inflate\", \"points\": [");
  for (int t = 1; t <= kMaxThreads; ++t) {
    // one big shared output the size of the real scan's bytearray
    std::vector<uint8_t> out((size_t)member_out * n_members);
    double best = 0;
    for (int rep = 0; rep < 3; ++rep) {
      double t0 = now_s();
      std::vector<std::thread> threads;
      for (int k = 0; k < t; ++k)
        threads.emplace_back([&, k] {
          libdeflate_decompressor* d = libdeflate_alloc_decompressor();
          for (int m = k; m < n_members; m += t) {
            size_t actual;
            libdeflate_deflate_decompress(
                d, members[m].comp.data(), members[m].comp.size(),
                out.data() + (size_t)m * member_out, member_out, &actual);
          }
          libdeflate_free_decompressor(d);
        });
      for (auto& th : threads) th.join();
      double rate = (double)member_out * n_members / (now_s() - t0) / 1e9;
      if (rate > best) best = rate;
    }
    printf("%s{\"threads\": %d, \"inflate_out_gb_s\": %.2f}",
           t > 1 ? ", " : "", t, best);
    fflush(stdout);
  }
  printf("]}\n");

  // ---- inflate into FRESH (first-touch) output each pass ---------------
  // The real scan writes into a pooled bytearray; a fresh buffer per pass
  // adds page-fault traffic - quantifies how much the pooling matters.
  printf("{\"experiment\": \"inflate_fresh_dst\", \"points\": [");
  for (int t = 1; t <= kMaxThreads; ++t) {
    double best = 0;
    for (int rep = 0; rep < 3; ++rep) {
      std::vector<uint8_t> out((size_t)member_out * n_members);
      double t0 = now_s();
      std::vector<std::thread> threads;
      for (int k = 0; k < t; ++k)
        threads.emplace_back([&, k] {
          libdeflate_decompressor* d = libdeflate_alloc_decompressor();
          for (int m = k; m < n_members; m += t) {
            size_t actual;
            libdeflate_deflate_decompress(
                d, members[m].comp.data(), members[m].comp.size(),
                out.data() + (size_t)m * member_out, member_out, &actual);
          }
          libdeflate_free_decompressor(d);
        });
      for (auto& th : threads) th.join();
      double rate = (double)member_out * n_members / (now_s() - t0) / 1e9;
      if (rate > best) best = rate;
    }
    printf("%s{\"threads\": %d, \"inflate_out_gb_s\": %.2f}",
           t > 1 ? ", " : "", t, best);
    fflush(stdout);
  }
  printf("]}\n");
  return 0;
}
