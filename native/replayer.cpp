// rt3d native frame replayer: mmap'd .rts sequence access with a
// background prefetch thread.
//
// TPU-native counterpart of the reference's ZED SDK capture layer (the
// C++/CUDA `pyzed` binding driving `grab`/`retrieve_image`/
// `retrieve_measure` in /root/reference/2cam/2cams_mask_gpu.py:179-215):
// here the "camera" is a recorded sequence, and the job of this layer is
// to hand frame records to Python with zero copies and to keep the next
// frames warm in the page cache while the TPU crunches the current one.
//
// Exposed as a plain C ABI consumed via ctypes (rt3d/io/native.py).
//
// Build:  g++ -O2 -shared -fPIC -o librt3d_replayer.so replayer.cpp -lpthread

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <mutex>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>

namespace {

struct Header {
  char magic[4];
  uint32_t version;
  uint32_t n_cams;
  uint32_t n_frames;
  uint32_t height;
  uint32_t width;
  uint32_t flags;
  uint32_t meta_len;
};

struct Replayer {
  int fd = -1;
  const uint8_t* base = nullptr;
  size_t size = 0;
  Header hdr{};
  size_t data_off = 0;
  size_t rgb_size = 0;
  size_t depth_size = 0;
  size_t cam_rec = 0;
  size_t frame_rec = 0;

  // prefetch machinery
  std::thread prefetcher;
  std::mutex mu;
  std::condition_variable cv;
  std::atomic<int64_t> want{-1};
  std::atomic<bool> stop{false};

  size_t cam_offset(uint32_t frame, uint32_t cam) const {
    return data_off + size_t(frame) * frame_rec + size_t(cam) * cam_rec;
  }
};

void prefetch_loop(Replayer* r, int depth_frames) {
  int64_t last = -1;
  while (!r->stop.load(std::memory_order_relaxed)) {
    int64_t w;
    {
      std::unique_lock<std::mutex> lk(r->mu);
      r->cv.wait(lk, [&] { return r->stop.load() || r->want.load() != last; });
      if (r->stop.load()) return;
      w = r->want.load();
      last = w;
    }
    // touch the next few frames so the kernel pages them in ahead of use
    for (int k = 1; k <= depth_frames; ++k) {
      int64_t f = w + k;
      if (f < 0 || f >= (int64_t)r->hdr.n_frames) break;
      const uint8_t* p = r->base + r->cam_offset((uint32_t)f, 0);
      size_t len = r->frame_rec;
      if (p + len > r->base + r->size) break;
      madvise(const_cast<uint8_t*>(p), len, MADV_WILLNEED);
    }
  }
}

}  // namespace

extern "C" {

void* rts_open(const char* path, int prefetch_frames) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) { close(fd); return nullptr; }
  void* m = mmap(nullptr, st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  if (m == MAP_FAILED) { close(fd); return nullptr; }

  auto* r = new Replayer();
  r->fd = fd;
  r->base = static_cast<const uint8_t*>(m);
  r->size = st.st_size;
  std::memcpy(&r->hdr, r->base, sizeof(Header));
  if (std::memcmp(r->hdr.magic, "RTS1", 4) != 0 || r->hdr.version != 1) {
    munmap(m, st.st_size); close(fd); delete r; return nullptr;
  }
  r->data_off = sizeof(Header) + r->hdr.meta_len;
  r->rgb_size = size_t(r->hdr.height) * r->hdr.width * 3;
  r->depth_size = (r->hdr.flags & 1) ? size_t(r->hdr.height) * r->hdr.width * 4 : 0;
  r->cam_rec = 4 + r->rgb_size + r->depth_size;
  r->frame_rec = r->cam_rec * r->hdr.n_cams;
  madvise(const_cast<uint8_t*>(r->base), r->size, MADV_SEQUENTIAL);
  if (prefetch_frames > 0) {
    r->prefetcher = std::thread(prefetch_loop, r, prefetch_frames);
  }
  return r;
}

void rts_info(void* h, uint32_t* out) {  // [n_cams, n_frames, H, W, has_depth]
  auto* r = static_cast<Replayer*>(h);
  out[0] = r->hdr.n_cams;
  out[1] = r->hdr.n_frames;
  out[2] = r->hdr.height;
  out[3] = r->hdr.width;
  out[4] = (r->hdr.flags & 1);
}

// Pointers into the mapping for (frame, cam): status, rgb, depth. Returns 0
// on success. The caller wraps them as numpy arrays without copying.
int rts_frame(void* h, uint32_t frame, uint32_t cam,
              const uint8_t** status, const uint8_t** rgb,
              const uint8_t** depth) {
  auto* r = static_cast<Replayer*>(h);
  if (frame >= r->hdr.n_frames || cam >= r->hdr.n_cams) return -1;
  const uint8_t* p = r->base + r->cam_offset(frame, cam);
  *status = p;
  *rgb = p + 4;
  *depth = r->depth_size ? p + 4 + r->rgb_size : nullptr;
  // kick the prefetcher toward the frames after this one
  if (r->prefetcher.joinable()) {
    r->want.store(frame, std::memory_order_relaxed);
    r->cv.notify_one();
  }
  return 0;
}

void rts_close(void* h) {
  auto* r = static_cast<Replayer*>(h);
  if (r->prefetcher.joinable()) {
    r->stop.store(true);
    r->cv.notify_one();
    r->prefetcher.join();
  }
  munmap(const_cast<uint8_t*>(r->base), r->size);
  close(r->fd);
  delete r;
}

}  // extern "C"
