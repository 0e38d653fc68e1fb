// emodata: native data-loader runtime for emoportraits_tpu.
//
// Role parity: the reference's data layer is Python LMDB readers + albumentations in
// torch DataLoader worker processes (datasets/voxceleb2hq_pairs.py). Here the host-side
// hot path — shard IO, pair sampling, uint8->float conversion, photometric and elastic
// augmentation — runs in C++ worker threads over mmap'd shards, filling caller-provided
// float32 batch buffers that Python hands straight to jax.device_put.
//
// Shard format "EMOS" (written by emoportraits_tpu.data.native.write_native_store):
//   [ magic u32 'EMOS' ][ version u32 ][ num_clips u32 ]
//   per clip: [ num_frames u32 ][ h u32 ][ w u32 ][ flags u32 ]
//             frames  u8  [num_frames][h][w][3]
//             masks   u8  [num_frames][h][w]
//             kps     f32 [num_frames][68][3]      (flags bit0)
//   version 2 appends the rest of the reference per-item geometry payload
//   (datasets/voxceleb2hq_pairs.py:233-256):
//             theta   f32 [num_frames][2][3]       (flags bit1, FFHQ-align theta)
//             p3dmm   f32 [num_frames][17]         (flags bit2, R9+offset3+roi4+size1)
//             crop    f32 [num_frames][4]          (flags bit3)
//             fscale  f32 [num_frames]             (flags bit4)
//
// C ABI (ctypes-friendly): see emod_* functions at the bottom.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <functional>
#include <mutex>
#include <queue>
#include <random>
#include <string>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

struct Clip {
  const uint8_t* frames = nullptr;  // [T][h][w][3]
  const uint8_t* masks = nullptr;   // [T][h][w]
  const float* kps = nullptr;       // [T][68][3] or null
  const float* thetas = nullptr;    // [T][2][3] or null (FFHQ-align theta)
  const float* p3dmm = nullptr;     // [T][17] or null
  const float* crop_box = nullptr;  // [T][4] or null
  const float* fscale = nullptr;    // [T] or null
  uint32_t num_frames = 0, h = 0, w = 0;
};

struct Store {
  std::vector<std::pair<void*, size_t>> mappings;
  std::vector<Clip> clips;
  ~Store() {
    for (auto& m : mappings) munmap(m.first, m.second);
  }
};

bool load_shard(Store* store, const std::string& path) {
  int fd = open(path.c_str(), O_RDONLY);
  if (fd < 0) return false;
  struct stat st;
  if (fstat(fd, &st) != 0) { close(fd); return false; }
  size_t size = static_cast<size_t>(st.st_size);
  void* base = mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0);
  close(fd);
  if (base == MAP_FAILED) return false;
  store->mappings.emplace_back(base, size);

  const uint8_t* p = static_cast<const uint8_t*>(base);
  const uint8_t* end = p + size;
  auto rd_u32 = [&](uint32_t* v) {
    if (p + 4 > end) return false;
    std::memcpy(v, p, 4); p += 4; return true;
  };
  uint32_t magic = 0, version = 0, num_clips = 0;
  if (!rd_u32(&magic) || magic != 0x534F4D45u) return false;  // 'EMOS'
  if (!rd_u32(&version) || (version != 1 && version != 2)) return false;
  if (!rd_u32(&num_clips)) return false;

  for (uint32_t i = 0; i < num_clips; ++i) {
    Clip c;
    uint32_t flags = 0;
    if (!rd_u32(&c.num_frames) || !rd_u32(&c.h) || !rd_u32(&c.w) ||
        !rd_u32(&flags))
      return false;
    size_t T = c.num_frames;
    size_t fbytes = T * c.h * c.w * 3;
    size_t mbytes = T * c.h * c.w;
    auto take_f32 = [&](const float** dst, size_t count) {
      if (p + count * 4 > end) return false;
      *dst = reinterpret_cast<const float*>(p);
      p += count * 4;
      return true;
    };
    if (p + fbytes + mbytes > end) return false;
    c.frames = p; p += fbytes;
    c.masks = p; p += mbytes;
    if ((flags & 1u) && !take_f32(&c.kps, T * 68 * 3)) return false;
    if (version >= 2) {
      if ((flags & 2u) && !take_f32(&c.thetas, T * 6)) return false;
      if ((flags & 4u) && !take_f32(&c.p3dmm, T * 17)) return false;
      if ((flags & 8u) && !take_f32(&c.crop_box, T * 4)) return false;
      if ((flags & 16u) && !take_f32(&c.fscale, T)) return false;
    }
    store->clips.push_back(c);
  }
  return true;
}

// ---------------------------------------------------------------- augmentations

struct Rng {
  std::mt19937 gen;
  explicit Rng(uint64_t seed) : gen(static_cast<uint32_t>(seed)) {}
  float uniform(float a, float b) {
    return std::uniform_real_distribution<float>(a, b)(gen);
  }
  int randint(int n) { return std::uniform_int_distribution<int>(0, n - 1)(gen); }
};

// bilinear fetch from a uint8 HWC image, clamped
inline void fetch_bilinear(const uint8_t* img, int h, int w, int ch, float y, float x,
                           float* out) {
  y = std::min(std::max(y, 0.0f), float(h - 1));
  x = std::min(std::max(x, 0.0f), float(w - 1));
  int y0 = int(y), x0 = int(x);
  int y1 = std::min(y0 + 1, h - 1), x1 = std::min(x0 + 1, w - 1);
  float fy = y - y0, fx = x - x0;
  for (int c = 0; c < ch; ++c) {
    float a = img[(y0 * w + x0) * ch + c], b = img[(y0 * w + x1) * ch + c];
    float cc = img[(y1 * w + x0) * ch + c], d = img[(y1 * w + x1) * ch + c];
    out[c] = ((a * (1 - fx) + b * fx) * (1 - fy) + (cc * (1 - fx) + d * fx) * fy)
             / 255.0f;
  }
}

struct AugParams {
  bool flip = false;
  float bright = 1.0f, contrast = 1.0f, sat = 1.0f;
  // coarse 5x5 elastic displacement grid (for warp_aug outputs)
  float disp[2][5][5] = {};
};

void sample_aug(Rng& rng, AugParams* a, float strength, float elastic_mag) {
  a->flip = rng.uniform(0, 1) < 0.5f;
  a->bright = 1.0f + rng.uniform(-strength, strength);
  a->contrast = 1.0f + rng.uniform(-strength, strength);
  a->sat = 1.0f + rng.uniform(-strength, strength);
  for (int d = 0; d < 2; ++d)
    for (int i = 0; i < 5; ++i)
      for (int j = 0; j < 5; ++j)
        a->disp[d][i][j] = rng.uniform(-elastic_mag, elastic_mag);
}

// resize+flip+jitter one frame into out [S][S][3] float; mask into out_mask [S][S][1]
void process_frame(const Clip& clip, int t, int S, const AugParams* aug,
                   bool elastic, float* out, float* out_mask) {
  int h = clip.h, w = clip.w;
  const uint8_t* img = clip.frames + size_t(t) * h * w * 3;
  const uint8_t* msk = clip.masks + size_t(t) * h * w;
  float mean_acc = 0.0f;
  for (int oy = 0; oy < S; ++oy) {
    for (int ox = 0; ox < S; ++ox) {
      int sx = aug && aug->flip ? (S - 1 - ox) : ox;
      float sy_f = float(oy) * (h - 1) / (S - 1 > 0 ? S - 1 : 1);
      float sx_f = float(sx) * (w - 1) / (S - 1 > 0 ? S - 1 : 1);
      if (elastic && aug) {
        // bilinear-upsampled coarse displacement grid, parity with
        // data/augment.py elastic_warp
        float gy = float(oy) * 4.0f / (S - 1 > 0 ? S - 1 : 1);
        float gx = float(sx) * 4.0f / (S - 1 > 0 ? S - 1 : 1);
        int gy0 = std::min(int(gy), 3), gx0 = std::min(int(gx), 3);
        float fy = gy - gy0, fx = gx - gx0;
        for (int d = 0; d < 2; ++d) {
          float v = aug->disp[d][gy0][gx0] * (1 - fy) * (1 - fx)
                  + aug->disp[d][gy0][gx0 + 1] * (1 - fy) * fx
                  + aug->disp[d][gy0 + 1][gx0] * fy * (1 - fx)
                  + aug->disp[d][gy0 + 1][gx0 + 1] * fy * fx;
          if (d == 0) sy_f += v * h;
          else sx_f += v * w;
        }
      }
      float px[3];
      fetch_bilinear(img, h, w, 3, sy_f, sx_f, px);
      float m;
      fetch_bilinear(msk, h, w, 1, sy_f, sx_f, &m);
      float* o = out + (size_t(oy) * S + ox) * 3;
      o[0] = px[0]; o[1] = px[1]; o[2] = px[2];
      mean_acc += (px[0] + px[1] + px[2]) / 3.0f;
      out_mask[size_t(oy) * S + ox] = m;
    }
  }
  if (aug) {
    float mean = mean_acc / (S * S);
    for (size_t i = 0; i < size_t(S) * S; ++i) {
      float* o = out + i * 3;
      float gray = (o[0] + o[1] + o[2]) / 3.0f;
      for (int c = 0; c < 3; ++c) {
        float v = o[c] * aug->bright;
        v = (v - mean) * aug->contrast + mean;
        v = (v - gray) * aug->sat + gray;
        o[c] = std::min(std::max(v, 0.0f), 1.0f);
      }
    }
  }
}

// FFHQ-aligned crop: out pixel -> normalized grid (u,v) in [-1,1] -> theta applied
// to (u*align_scale, v*align_scale, 1) -> source coords. This mirrors the reference
// align block (datasets/voxceleb2hq_pairs.py:321-348): theta_ = [theta; 0 0 1] @
// diag(align_scale, align_scale, 1), warp = grid @ theta_[:2]^T, then
// F.grid_sample(img, warp) with align_corners=False and zero padding.
void warp_frame_ffhq(const Clip& clip, int t, int S, const float* theta,
                     float align_scale, float* out, float* out_mask) {
  int h = clip.h, w = clip.w;
  const uint8_t* img = clip.frames + size_t(t) * h * w * 3;
  const uint8_t* msk = clip.masks + size_t(t) * h * w;
  for (int oy = 0; oy < S; ++oy) {
    float v = (2.0f * oy + 1.0f) / S - 1.0f;  // align_corners=False grid
    for (int ox = 0; ox < S; ++ox) {
      float u = (2.0f * ox + 1.0f) / S - 1.0f;
      float us = u * align_scale, vs = v * align_scale;
      float sx_n = theta[0] * us + theta[1] * vs + theta[2];
      float sy_n = theta[3] * us + theta[4] * vs + theta[5];
      // unnormalize (align_corners=False): px = ((x + 1) * size - 1) / 2
      float sx = ((sx_n + 1.0f) * w - 1.0f) * 0.5f;
      float sy = ((sy_n + 1.0f) * h - 1.0f) * 0.5f;
      float* o = out + (size_t(oy) * S + ox) * 3;
      float* om = out_mask ? out_mask + size_t(oy) * S + ox : nullptr;
      if (sx < -1.0f || sy < -1.0f || sx > float(w) || sy > float(h)) {
        o[0] = o[1] = o[2] = 0.0f;  // zero padding outside the frame
        if (om) *om = 0.0f;
        continue;
      }
      float px[3], m;
      fetch_bilinear(img, h, w, 3, sy, sx, px);
      fetch_bilinear(msk, h, w, 1, sy, sx, &m);
      o[0] = px[0]; o[1] = px[1]; o[2] = px[2];
      if (om) *om = m;
    }
  }
}

struct ThreadPool {
  std::vector<std::thread> workers;
  std::queue<std::function<void()>> tasks;
  std::mutex mu;
  std::condition_variable cv;
  std::atomic<int> pending{0};
  std::condition_variable done_cv;
  std::mutex done_mu;
  bool stop = false;

  explicit ThreadPool(int n) {
    for (int i = 0; i < n; ++i)
      workers.emplace_back([this] {
        for (;;) {
          std::function<void()> task;
          {
            std::unique_lock<std::mutex> lk(mu);
            cv.wait(lk, [this] { return stop || !tasks.empty(); });
            if (stop && tasks.empty()) return;
            task = std::move(tasks.front());
            tasks.pop();
          }
          task();
          if (--pending == 0) {
            std::lock_guard<std::mutex> lk(done_mu);
            done_cv.notify_all();
          }
        }
      });
  }
  ~ThreadPool() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stop = true;
    }
    cv.notify_all();
    for (auto& w : workers) w.join();
  }
  void submit(std::function<void()> f) {
    ++pending;
    {
      std::lock_guard<std::mutex> lk(mu);
      tasks.push(std::move(f));
    }
    cv.notify_one();
  }
  void wait() {
    std::unique_lock<std::mutex> lk(done_mu);
    done_cv.wait(lk, [this] { return pending.load() == 0; });
  }
};

struct Loader {
  Store store;
  ThreadPool pool;
  explicit Loader(int threads) : pool(std::max(threads, 1)) {}
};

}  // namespace

extern "C" {

// Opens every shard path in the NUL-separated list. Returns handle or null.
void* emod_open(const char* shard_paths, int num_shards, int num_threads) {
  auto* loader = new Loader(num_threads);
  const char* p = shard_paths;
  for (int i = 0; i < num_shards; ++i) {
    if (!load_shard(&loader->store, p)) {
      delete loader;
      return nullptr;
    }
    p += std::strlen(p) + 1;
  }
  return loader;
}

int emod_num_clips(void* handle) {
  return static_cast<int>(static_cast<Loader*>(handle)->store.clips.size());
}

// Fills a batch of (source, target) pairs (v2 surface).
//   out_src/out_tgt:     [batch][S][S][3] float32
//   out_smask/out_tmask: [batch][S][S][1] float32
//   out_src_aug/out_tgt_aug: elastic-warped expression-net inputs (may be null)
//   out_src_kp/out_tgt_kp:   [batch][68][3] 3D keypoints (may be null; flipped
//                            with the photometric flip, x in [-1,1])
//   out_tgt_ffhq/out_tgt_ffhq_mask: [batch][Sf][Sf][3 / 1] FFHQ-aligned target
//                            crop from the stored theta — the stage-2 ground
//                            truth (may be null). Warps the UN-augmented frame.
// Threaded over batch elements. Returns a feature bitmask >= 0 on success
// (bit0: keypoints delivered, bit1: ffhq thetas delivered) or -1 on error.
int emod_sample_pairs2(void* handle, int batch, int image_size, uint64_t seed,
                       int augment, float* out_src, float* out_tgt,
                       float* out_smask, float* out_tmask,
                       float* out_src_aug, float* out_tgt_aug,
                       float* out_src_kp, float* out_tgt_kp,
                       float* out_tgt_ffhq, float* out_tgt_ffhq_mask,
                       int ffhq_size, float align_scale) {
  auto* loader = static_cast<Loader*>(handle);
  auto& clips = loader->store.clips;
  if (clips.empty()) return -1;
  int S = image_size;
  std::atomic<int> feat{3};
  for (int b = 0; b < batch; ++b) {
    loader->pool.submit([=, &clips, &feat] {
      Rng rng(seed * 1000003ull + b);
      const Clip& clip = clips[rng.randint(static_cast<int>(clips.size()))];
      int si = rng.randint(clip.num_frames);
      int ti = rng.randint(clip.num_frames);
      AugParams aug;
      AugParams* ap = nullptr;
      if (augment) {
        sample_aug(rng, &aug, 0.1f, 0.0f);
        ap = &aug;
      }
      size_t img_off = size_t(b) * S * S * 3;
      size_t mask_off = size_t(b) * S * S;
      process_frame(clip, si, S, ap, false, out_src + img_off, out_smask + mask_off);
      process_frame(clip, ti, S, ap, false, out_tgt + img_off, out_tmask + mask_off);
      if (augment && out_src_aug && out_tgt_aug) {
        AugParams eaug = aug;
        Rng rng2(seed * 7777ull + b);
        sample_aug(rng2, &eaug, 0.1f, 0.05f);
        eaug.flip = aug.flip;
        std::vector<float> scratch(size_t(S) * S);
        process_frame(clip, si, S, &eaug, true, out_src_aug + img_off,
                      scratch.data());
        process_frame(clip, ti, S, &eaug, true, out_tgt_aug + img_off,
                      scratch.data());
      }
      if (out_src_kp && out_tgt_kp) {
        if (clip.kps) {
          float sign = (ap && ap->flip) ? -1.0f : 1.0f;
          for (int j = 0; j < 68; ++j) {
            for (int d = 0; d < 3; ++d) {
              float sv = clip.kps[(size_t(si) * 68 + j) * 3 + d];
              float tv = clip.kps[(size_t(ti) * 68 + j) * 3 + d];
              out_src_kp[(size_t(b) * 68 + j) * 3 + d] = d == 0 ? sv * sign : sv;
              out_tgt_kp[(size_t(b) * 68 + j) * 3 + d] = d == 0 ? tv * sign : tv;
            }
          }
        } else {
          feat &= ~1;
        }
      }
      if (out_tgt_ffhq) {
        if (clip.thetas) {
          warp_frame_ffhq(clip, ti, ffhq_size, clip.thetas + size_t(ti) * 6,
                          align_scale,
                          out_tgt_ffhq + size_t(b) * ffhq_size * ffhq_size * 3,
                          out_tgt_ffhq_mask
                              ? out_tgt_ffhq_mask + size_t(b) * ffhq_size * ffhq_size
                              : nullptr);
        } else {
          feat &= ~2;
        }
      }
    });
  }
  loader->pool.wait();
  return feat.load();
}

// v1 ABI kept for existing callers.
int emod_sample_pairs(void* handle, int batch, int image_size, uint64_t seed,
                      int augment, float* out_src, float* out_tgt,
                      float* out_smask, float* out_tmask,
                      float* out_src_aug, float* out_tgt_aug) {
  int rc = emod_sample_pairs2(handle, batch, image_size, seed, augment, out_src,
                              out_tgt, out_smask, out_tmask, out_src_aug,
                              out_tgt_aug, nullptr, nullptr, nullptr, nullptr, 0,
                              1.0f);
  return rc < 0 ? 1 : 0;
}

void emod_close(void* handle) { delete static_cast<Loader*>(handle); }

}  // extern "C"
