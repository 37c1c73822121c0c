// Native batched JPEG decode stage for the Ego4D frame pipeline.
//
// TPU-native replacement for the reference's per-frame
// torchvision.io.read_image calls inside torch DataLoader worker
// processes (/root/reference/r3m/utils/data_loaders.py:30-34). Instead of
// N forked Python workers, a persistent C++ thread pool decodes a whole
// [N] batch of JPEG files directly into one preallocated uint8
// [N, H, W, 3] host buffer (the staging buffer for the device transfer),
// with an optional box-filter resize when a frame's native size differs
// from the target (the reference assumes pre-resized 224x224 frames).
//
// C ABI (used via ctypes from r3m_tpu/data/decoder.py):
//   r3m_decoder_create(n_threads) -> handle
//   r3m_decoder_destroy(handle)
//   r3m_decode_batch(handle, paths, n, out, H, W) -> n_failed
//     paths: array of n C strings; out: n*H*W*3 uint8 buffer.
//     Failed/missing frames are zero-filled (sample-level robustness is
//     the Python caller's policy).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Box-filter resize (separable average) — only used when a source frame is
// not already HxW. Nearest-area quality is fine here: the training path
// follows with RandomResizedCrop on device.
void resize_box(const std::vector<uint8_t>& src, int sh, int sw, uint8_t* dst,
                int dh, int dw, std::vector<float>& tmp) {
  // caller-owned scratch (thread-local in decode_file): no multi-MB
  // malloc/free per frame in the decode hot path
  tmp.resize(static_cast<size_t>(sh) * dw * 3);
  for (int y = 0; y < sh; ++y) {
    for (int x = 0; x < dw; ++x) {
      float x0 = static_cast<float>(x) * sw / dw;
      float x1 = static_cast<float>(x + 1) * sw / dw;
      int ix0 = static_cast<int>(x0);
      int ix1 = std::min(static_cast<int>(x1) + 1, sw);
      float acc[3] = {0, 0, 0};
      float wsum = 0;
      for (int ix = ix0; ix < ix1; ++ix) {
        float l = std::max(x0, static_cast<float>(ix));
        float r = std::min(x1, static_cast<float>(ix + 1));
        float w = r - l;
        if (w <= 0) continue;
        for (int c = 0; c < 3; ++c)
          acc[c] += w * src[(static_cast<size_t>(y) * sw + ix) * 3 + c];
        wsum += w;
      }
      for (int c = 0; c < 3; ++c)
        tmp[(static_cast<size_t>(y) * dw + x) * 3 + c] = acc[c] / wsum;
    }
  }
  for (int y = 0; y < dh; ++y) {
    float y0 = static_cast<float>(y) * sh / dh;
    float y1 = static_cast<float>(y + 1) * sh / dh;
    int iy0 = static_cast<int>(y0);
    int iy1 = std::min(static_cast<int>(y1) + 1, sh);
    for (int x = 0; x < dw; ++x) {
      float acc[3] = {0, 0, 0};
      float wsum = 0;
      for (int iy = iy0; iy < iy1; ++iy) {
        float t = std::max(y0, static_cast<float>(iy));
        float b = std::min(y1, static_cast<float>(iy + 1));
        float w = b - t;
        if (w <= 0) continue;
        for (int c = 0; c < 3; ++c)
          acc[c] += w * tmp[(static_cast<size_t>(iy) * dw + x) * 3 + c];
        wsum += w;
      }
      for (int c = 0; c < 3; ++c)
        dst[(static_cast<size_t>(y) * dw + x) * 3 + c] =
            static_cast<uint8_t>(acc[c] / wsum + 0.5f);
    }
  }
}

// libjpeg decode body. setjmp/longjmp error recovery is confined to this
// frame, which holds ONLY trivially-destructible locals — the scratch
// vectors live in the decode_file wrapper and are passed by reference, so
// the longjmp cannot skip their destructors (that would be UB and leak
// the decode buffers on every corrupt frame).
bool decode_file_impl(const char* path, uint8_t* dst, int H, int W,
                      std::vector<uint8_t>& buf, std::vector<float>& scratch) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;

  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;

  // DCT-domain downscale: pick the largest M/8 <= target/native ratio so the
  // IDCT itself produces close-to-target resolution (big decode speedup for
  // oversized frames).
  if (static_cast<int>(cinfo.image_width) > W &&
      static_cast<int>(cinfo.image_height) > H) {
    int num = 8;
    while (num > 1 && cinfo.image_width * (num - 1) / 8 >= (unsigned)W &&
           cinfo.image_height * (num - 1) / 8 >= (unsigned)H)
      --num;
    cinfo.scale_num = num;
    cinfo.scale_denom = 8;
  }

  jpeg_start_decompress(&cinfo);
  const int sw = cinfo.output_width;
  const int sh = cinfo.output_height;
  // out_color_space was forced to JCS_RGB before start_decompress, so
  // libjpeg itself converts grayscale (and longjmps on source spaces it
  // cannot convert): output_components is always 3 here.

  // Reject absurd frames (a corrupt header can declare up to 65535x65535,
  // ~12 GB of RGB even after the /8 DCT scale) before allocating for them.
  if (static_cast<int64_t>(sw) * sh > (int64_t)64 * 1024 * 1024) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return false;
  }

  bool direct = (sw == W && sh == H);
  if (!direct) buf.resize(static_cast<size_t>(sw) * sh * 3);

  while (cinfo.output_scanline < cinfo.output_height) {
    const int y = cinfo.output_scanline;
    JSAMPROW rowptr =
        direct ? dst + static_cast<size_t>(y) * W * 3
               : buf.data() + static_cast<size_t>(y) * sw * 3;
    jpeg_read_scanlines(&cinfo, &rowptr, 1);
  }
  jpeg_finish_decompress(&cinfo);
  // libjpeg treats truncated entropy data as a WARNING (it inserts a fake
  // EOI and completes with garbage rows) — a nonzero warning count means
  // the frame is untrustworthy, so fail it (caller zero-fills + counts)
  // instead of silently feeding corrupt frames into training.
  const bool clean = jerr.pub.num_warnings == 0;
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  if (!clean) return false;

  if (!direct) resize_box(buf, sh, sw, dst, H, W, scratch);
  return true;
}

// Decode one JPEG file to RGB into dst (H*W*3). Returns true on success.
// noexcept: a bad_alloc escaping a ThreadPool worker would std::terminate
// the whole training process — a failed frame must zero-fill instead.
bool decode_file(const char* path, uint8_t* dst, int H, int W) noexcept {
  try {
    // scratch owned OUTSIDE the setjmp frame; thread_local so each worker
    // reuses its buffers' capacity across frames (no per-frame mallocs)
    thread_local std::vector<uint8_t> buf;
    thread_local std::vector<float> scratch;
    return decode_file_impl(path, dst, H, W, buf, scratch);
  } catch (...) {
    return false;
  }
}

class ThreadPool {
 public:
  explicit ThreadPool(int n) : stop_(false) {
    for (int i = 0; i < n; ++i)
      workers_.emplace_back([this] { worker(); });
  }
  ~ThreadPool() {
    {
      std::unique_lock<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }
  void submit(std::function<void()> job) {
    {
      std::unique_lock<std::mutex> lk(mu_);
      jobs_.push(std::move(job));
    }
    cv_.notify_one();
  }

 private:
  void worker() {
    for (;;) {
      std::function<void()> job;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !jobs_.empty(); });
        if (stop_ && jobs_.empty()) return;
        job = std::move(jobs_.front());
        jobs_.pop();
      }
      job();
    }
  }
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> jobs_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_;
};

struct Decoder {
  explicit Decoder(int n_threads) : pool(n_threads) {}
  ThreadPool pool;
};

}  // namespace

// ---------------------------------------------------------------------------
// Prefetch pipeline: C++ owns sample-batch assembly end to end. Python
// submits path lists (a batch each); a thread pool decodes them into a ring
// of reusable staging buffers; fetch() hands back completed batches in
// submit order. Replaces the Python producer thread of the host pipeline —
// no GIL involvement between submit and fetch, and multiple batches decode
// concurrently (depth-bounded backpressure).
// ---------------------------------------------------------------------------

namespace {

struct Batch {
  int64_t seq;
  std::vector<uint8_t> buf;
  int failed;
};

struct Pipeline {
  Pipeline(int n_threads, int frames, int h, int w, int depth)
      : pool(n_threads), frames(frames), H(h), W(w), depth(depth) {}

  ThreadPool pool;
  const int frames, H, W, depth;

  std::mutex mu;
  std::condition_variable cv;
  int64_t next_submit_seq = 0;
  int64_t next_fetch_seq = 0;
  int in_flight = 0;                    // submitted, not yet fetched
  int active_fetches = 0;               // fetch() calls currently executing
  int active_submits = 0;               // submit() calls currently executing
  std::vector<Batch> ready;             // completed, unfetched batches
  std::vector<std::vector<uint8_t>> free_bufs;  // staging buffer pool
  bool stopping = false;
};

struct BatchJob {
  Pipeline* p;
  int64_t seq;
  std::vector<std::string> paths;
  std::vector<uint8_t> buf;
  std::atomic<int> remaining;
  std::atomic<int> failed{0};
};

}  // namespace

extern "C" {

void* r3m_pipeline_create(int n_threads, int batch_frames, int H, int W,
                          int depth) {
  if (n_threads < 1) n_threads = 1;
  if (depth < 1) depth = 1;
  // batch_frames == 0 would submit batches that spawn no decode jobs, so
  // the last-frame completion path never runs: fetch() and destroy() both
  // hang forever. Refuse to build such a pipeline.
  if (batch_frames < 1 || H < 1 || W < 1) return nullptr;
  return new Pipeline(n_threads, batch_frames, H, W, depth);
}

void r3m_pipeline_destroy(void* handle) {
  Pipeline* p = static_cast<Pipeline*>(handle);
  {
    std::unique_lock<std::mutex> lk(p->mu);
    p->stopping = true;
    // wake submitters blocked on depth backpressure so they can observe
    // stopping and bail out instead of deadlocking against this wait
    p->cv.notify_all();
    // wait for in-flight decodes AND executing fetches/submits so neither
    // jobs, a concurrent fetch(), nor a submit() blocked on backpressure
    // (or still enqueueing decode jobs) touch a freed Pipeline
    p->cv.wait(lk, [&] {
      return p->in_flight == static_cast<int>(p->ready.size()) &&
             p->active_fetches == 0 && p->active_submits == 0;
    });
  }
  delete p;
}

// Submit one batch of `n` frame paths (n must equal batch_frames).
// Blocks while `depth` batches are already in flight (backpressure).
// Returns 0 on success, -1 on bad n, -2 while stopping, -3 on allocation
// failure (the claimed slot is retired as an all-failed batch so the ring
// ordering and destroy() predicates stay intact; a C++ exception must never
// unwind across the extern "C"/ctypes boundary — that's UB, in practice
// std::terminate with no Python traceback).
static void submit_frame(Pipeline* p, BatchJob* job, int i, size_t frame);

int r3m_pipeline_submit(void* handle, const char** paths, int n) {
  Pipeline* p = static_cast<Pipeline*>(handle);
  if (n != p->frames) return -1;

  BatchJob* job = nullptr;
  try {
    job = new BatchJob();
    job->p = p;
    job->paths.reserve(n);
    for (int i = 0; i < n; ++i) job->paths.emplace_back(paths[i]);
  } catch (const std::exception&) {  // bad_alloc: no pipeline state touched yet
    delete job;
    return -3;
  }
  job->remaining.store(n);

  const size_t frame = static_cast<size_t>(p->H) * p->W * 3;
  {
    std::unique_lock<std::mutex> lk(p->mu);
    // pin the Pipeline for the WHOLE submit (incl. the pool.submit loop
    // below, which runs unlocked): destroy() waits for active_submits == 0
    p->active_submits += 1;
    p->cv.wait(lk, [&] { return p->in_flight < p->depth || p->stopping; });
    if (p->stopping) {
      p->active_submits -= 1;
      p->cv.notify_all();
      delete job;
      return -2;
    }
    job->seq = p->next_submit_seq++;
    p->in_flight += 1;
    if (!p->free_bufs.empty()) {
      job->buf = std::move(p->free_bufs.back());
      p->free_bufs.pop_back();
    }
  }
  try {
    job->buf.resize(frame * n);
  } catch (const std::exception&) {
    // retire the claimed seq as an all-failed batch (fetch zero-fills an
    // undersized buffer) so in_flight == ready.size() still converges
    std::unique_lock<std::mutex> lk(p->mu);
    p->ready.push_back(Batch{job->seq, std::move(job->buf), n});
    p->active_submits -= 1;
    p->cv.notify_all();
    delete job;
    return -3;
  }

  int submitted = 0;
  try {
    for (int i = 0; i < n; ++i, ++submitted) {
      submit_frame(p, job, i, frame);
    }
  } catch (const std::exception&) {
    // std::function/queue allocation failed mid-loop: the frames never
    // handed to the pool are zero-filled failures; if that makes the batch
    // complete here, publish it exactly like the last worker would
    const int rest = n - submitted;
    std::memset(job->buf.data() + frame * submitted, 0,
                frame * static_cast<size_t>(rest));
    job->failed.fetch_add(rest);
    if (job->remaining.fetch_sub(rest) == rest) {
      std::unique_lock<std::mutex> lk(p->mu);
      p->ready.push_back(
          Batch{job->seq, std::move(job->buf), job->failed.load()});
      p->cv.notify_all();
      delete job;
    }
    std::unique_lock<std::mutex> lk(p->mu);
    p->active_submits -= 1;
    p->cv.notify_all();
    return -3;
  }
  {
    std::unique_lock<std::mutex> lk(p->mu);
    p->active_submits -= 1;
    p->cv.notify_all();
  }
  return 0;
}

// One frame's decode task; factored out so the submit loop above can wrap
// pool handoff in a try/catch without nesting the whole lambda.
static void submit_frame(Pipeline* p, BatchJob* job, int i, size_t frame) {
  p->pool.submit([job, i, frame] {
    Pipeline* p = job->p;
    uint8_t* dst = job->buf.data() + frame * i;
    if (!decode_file(job->paths[i].c_str(), dst, p->H, p->W)) {
      std::memset(dst, 0, frame);
      job->failed.fetch_add(1);
    }
    if (job->remaining.fetch_sub(1) == 1) {  // last frame of the batch
      {
        std::unique_lock<std::mutex> lk(p->mu);
        p->ready.push_back(
            Batch{job->seq, std::move(job->buf), job->failed.load()});
        // notify UNDER the lock: destroy() may delete the Pipeline the
        // moment its predicate holds, so touching p->cv after unlocking
        // would be a use-after-free
        p->cv.notify_all();
      }
      delete job;
    }
  });
}

// Copy the NEXT batch (submit order) into out. Blocks until ready.
// Returns the number of failed frames (>= 0), or -1 if nothing in flight.
int r3m_pipeline_fetch(void* handle, uint8_t* out) {
  Pipeline* p = static_cast<Pipeline*>(handle);
  std::vector<uint8_t> buf;
  int failed = 0;
  {
    std::unique_lock<std::mutex> lk(p->mu);
    if (p->next_fetch_seq >= p->next_submit_seq) return -1;
    // pin the Pipeline: destroy() waits for active_fetches == 0, so the
    // unlocked memcpy below and the re-lock cannot hit freed memory
    p->active_fetches += 1;
    // CLAIM the sequence number before waiting: concurrent fetchers must
    // wait on distinct batches (two waiters on the same seq would leave
    // one blocked forever after the other consumes it)
    const int64_t want = p->next_fetch_seq++;
    p->cv.wait(lk, [&] {
      for (auto& b : p->ready)
        if (b.seq == want) return true;
      return false;
    });
    for (size_t i = 0; i < p->ready.size(); ++i) {
      if (p->ready[i].seq == want) {
        buf = std::move(p->ready[i].buf);
        failed = p->ready[i].failed;
        p->ready.erase(p->ready.begin() + i);
        break;
      }
    }
    p->in_flight -= 1;
  }
  const size_t want = static_cast<size_t>(p->frames) * p->H * p->W * 3;
  if (buf.size() >= want) {
    std::memcpy(out, buf.data(), want);
  } else {
    // allocation-failed batch retired by submit: no pixel data exists
    std::memset(out, 0, want);
  }
  {
    std::unique_lock<std::mutex> lk(p->mu);
    if (p->free_bufs.size() < static_cast<size_t>(p->depth))
      p->free_bufs.push_back(std::move(buf));
    p->active_fetches -= 1;
    // notify UNDER the lock (same reasoning as the decode-job completion)
    p->cv.notify_all();
  }
  return failed;
}

void* r3m_decoder_create(int n_threads) {
  if (n_threads < 1) n_threads = 1;
  return new Decoder(n_threads);
}

void r3m_decoder_destroy(void* handle) { delete static_cast<Decoder*>(handle); }

// Decode n JPEGs into out (n*H*W*3, uint8). Returns number of failures.
int r3m_decode_batch(void* handle, const char** paths, int n, uint8_t* out,
                     int H, int W) {
  Decoder* d = static_cast<Decoder*>(handle);
  std::atomic<int> failed{0};
  int done = 0;  // guarded by mu — NOT atomic: the caller may observe the
                 // final count and destroy mu/cv only after the last worker
                 // has released the lock, so no worker can touch them late
  std::mutex mu;
  std::condition_variable cv;

  const size_t frame = static_cast<size_t>(H) * W * 3;
  int submitted = 0;
  try {
    for (int i = 0; i < n; ++i, ++submitted) {
      d->pool.submit([&, i] {
        uint8_t* dst = out + frame * i;
        if (!decode_file(paths[i], dst, H, W)) {
          std::memset(dst, 0, frame);
          failed.fetch_add(1);
        }
        {
          std::unique_lock<std::mutex> lk(mu);
          if (++done == n) cv.notify_one();
        }
      });
    }
  } catch (const std::exception&) {
    // pool handoff allocation failed: the never-submitted frames are
    // zero-filled failures; the exception must not cross the C ABI
    const int rest = n - submitted;
    std::memset(out + frame * submitted, 0,
                frame * static_cast<size_t>(rest));
    failed.fetch_add(rest);
    std::unique_lock<std::mutex> lk(mu);
    done += rest;
  }
  std::unique_lock<std::mutex> lk(mu);
  cv.wait(lk, [&] { return done == n; });
  return failed.load();
}

}  // extern "C"
