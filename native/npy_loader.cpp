// npy_loader — native shard reader + prefetcher for the training hot path.
//
// C++ counterpart of clipcap_tpu/data/token_prefix.py (itself the rebuild
// of the reference's TokenPrefixDataset, reference dataset.py:76-180):
// reads {prefixes,tokens}/*.npy shard pairs, assembles batches of exactly
// `batch_size` rows carrying overflow across shard files, wraps at the
// last file forever — but does the file IO and batch assembly on a
// background thread with a bounded ring of ready batches, so the Python
// training loop never blocks on disk (the role DataLoader worker
// processes play in the reference, train.py:266).
//
// C ABI (driven from Python via ctypes — see data/native_loader.py):
//   loader_create(prefix_dir, tokens_dir, batch_size, queue_depth) -> handle
//   loader_row_info(handle, &prefix_row_elems, &tokens_row_elems,
//                   &sample_count)
//   loader_next(handle, prefix_out, tokens_out)  // blocking, row-major
//   loader_destroy(handle)
// Source dtypes f32/f64/i32/i64 are converted to f32 (prefixes) / i64
// (tokens) on read; outputs are always those fixed types.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <dirent.h>
#include <sys/stat.h>

#include <algorithm>

namespace {

struct NpyInfo {
  std::string path;
  std::vector<int64_t> shape;
  std::string descr;       // e.g. "<f4"
  size_t header_offset = 0;
  size_t itemsize = 0;
  int64_t rows() const { return shape.empty() ? 0 : shape[0]; }
  size_t row_elems() const {
    size_t n = 1;
    for (size_t i = 1; i < shape.size(); ++i) n *= (size_t)shape[i];
    return n;
  }
};

bool parse_npy_header(const std::string& path, NpyInfo* out) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  unsigned char magic[8];
  if (fread(magic, 1, 8, f) != 8 || memcmp(magic, "\x93NUMPY", 6) != 0) {
    fclose(f);
    return false;
  }
  int major = magic[6];
  uint32_t header_len = 0;
  if (major == 1) {
    unsigned char b[2];
    if (fread(b, 1, 2, f) != 2) { fclose(f); return false; }
    header_len = b[0] | (b[1] << 8);
    out->header_offset = 10 + header_len;
  } else {
    unsigned char b[4];
    if (fread(b, 1, 4, f) != 4) { fclose(f); return false; }
    header_len = b[0] | (b[1] << 8) | (b[2] << 16) | ((uint32_t)b[3] << 24);
    out->header_offset = 12 + header_len;
  }
  std::string header(header_len, '\0');
  if (fread(&header[0], 1, header_len, f) != header_len) { fclose(f); return false; }
  fclose(f);

  // descr
  size_t dpos = header.find("'descr'");
  if (dpos == std::string::npos) return false;
  size_t q1 = header.find('\'', dpos + 7);
  size_t q2 = header.find('\'', q1 + 1);
  out->descr = header.substr(q1 + 1, q2 - q1 - 1);

  if (header.find("'fortran_order': True") != std::string::npos) return false;

  // shape tuple
  size_t spos = header.find("'shape'");
  size_t p1 = header.find('(', spos);
  size_t p2 = header.find(')', p1);
  std::string tup = header.substr(p1 + 1, p2 - p1 - 1);
  out->shape.clear();
  int64_t cur = -1;
  for (char c : tup) {
    if (c >= '0' && c <= '9') {
      if (cur < 0) cur = 0;
      cur = cur * 10 + (c - '0');
    } else if (cur >= 0) {
      out->shape.push_back(cur);
      cur = -1;
    }
  }
  if (cur >= 0) out->shape.push_back(cur);

  char kind = out->descr.size() >= 2 ? out->descr[1] : '?';
  int width = out->descr.size() >= 3 ? (out->descr[2] - '0') : 0;
  if ((kind != 'f' && kind != 'i') || (width != 4 && width != 8)) return false;
  out->itemsize = (size_t)width;
  out->path = path;
  return true;
}

std::vector<std::string> list_npy_sorted(const std::string& dir) {
  std::vector<std::string> files;
  DIR* d = opendir(dir.c_str());
  if (!d) return files;
  while (dirent* e = readdir(d)) {
    std::string name = e->d_name;
    if (name.size() > 4 && name.substr(name.size() - 4) == ".npy")
      files.push_back(name);
  }
  closedir(d);
  std::sort(files.begin(), files.end());
  for (auto& f : files) f = dir + "/" + f;
  return files;
}

struct Batch {
  std::vector<float> prefixes;
  std::vector<int64_t> tokens;
};

class Loader {
 public:
  Loader(std::vector<NpyInfo> prefix_files, std::vector<NpyInfo> tokens_files,
         int64_t batch_size, int queue_depth)
      : prefix_files_(std::move(prefix_files)),
        tokens_files_(std::move(tokens_files)),
        batch_size_(batch_size),
        queue_depth_(queue_depth) {
    prefix_row_elems_ = prefix_files_[0].row_elems();
    tokens_row_elems_ = tokens_files_[0].row_elems();
    for (const auto& f : prefix_files_) sample_count_ += f.rows();
    worker_ = std::thread([this] { this->run(); });
  }

  ~Loader() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_producer_.notify_all();
    cv_consumer_.notify_all();
    if (worker_.joinable()) worker_.join();
  }

  size_t prefix_row_elems() const { return prefix_row_elems_; }
  size_t tokens_row_elems() const { return tokens_row_elems_; }
  int64_t sample_count() const { return sample_count_; }
  int64_t batch_size() const { return batch_size_; }

  bool next(float* prefix_out, int64_t* tokens_out) {
    std::unique_lock<std::mutex> lk(mu_);
    cv_consumer_.wait(lk, [this] { return stop_ || !queue_.empty(); });
    if (stop_ && queue_.empty()) return false;
    Batch b = std::move(queue_.front());
    queue_.pop_front();
    lk.unlock();
    cv_producer_.notify_one();
    memcpy(prefix_out, b.prefixes.data(), b.prefixes.size() * sizeof(float));
    memcpy(tokens_out, b.tokens.data(), b.tokens.size() * sizeof(int64_t));
    return true;
  }

 private:
  // Signal a fatal worker-side error: wake any blocked consumer so
  // loader_next returns false instead of hanging forever (ADVICE: a
  // mid-rotation fopen failure or truncated shard must not deadlock the
  // training loop).
  void fail() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_consumer_.notify_all();
  }

  template <typename Dst>
  static bool read_rows(const NpyInfo& info, FILE* f, int64_t start, int64_t n,
                        Dst* dst) {
    const size_t elems = info.row_elems() * (size_t)n;
    std::vector<unsigned char> raw(elems * info.itemsize);
    fseek(f, (long)(info.header_offset +
                    (size_t)start * info.row_elems() * info.itemsize),
          SEEK_SET);
    size_t got = fread(raw.data(), info.itemsize, elems, f);
    if (got != elems) {
      // truncated shard (header claims more rows than the file holds):
      // fail loudly rather than emit uninitialized batch rows
      fprintf(stderr, "npy_loader: short read in %s (want %zu elems, got %zu)\n",
              info.path.c_str(), elems, got);
      return false;
    }
    char kind = info.descr[1];
    if (kind == 'f' && info.itemsize == 4) {
      const float* src = (const float*)raw.data();
      for (size_t i = 0; i < elems; ++i) dst[i] = (Dst)src[i];
    } else if (kind == 'f' && info.itemsize == 8) {
      const double* src = (const double*)raw.data();
      for (size_t i = 0; i < elems; ++i) dst[i] = (Dst)src[i];
    } else if (kind == 'i' && info.itemsize == 8) {
      const int64_t* src = (const int64_t*)raw.data();
      for (size_t i = 0; i < elems; ++i) dst[i] = (Dst)src[i];
    } else {
      const int32_t* src = (const int32_t*)raw.data();
      for (size_t i = 0; i < elems; ++i) dst[i] = (Dst)src[i];
    }
    return true;
  }

  void run() {
    size_t file_index = 0;
    // overflow rows carried across shard files (reference dataset.py:109)
    std::vector<float> ov_prefix;
    std::vector<int64_t> ov_tokens;
    int64_t ov_rows = 0;

    while (true) {
      {
        std::lock_guard<std::mutex> lk(mu_);
        if (stop_) return;
      }
      if (file_index >= prefix_files_.size()) file_index = 0;
      const NpyInfo& pinfo = prefix_files_[file_index];
      const NpyInfo& tinfo = tokens_files_[file_index];
      FILE* pf = fopen(pinfo.path.c_str(), "rb");
      FILE* tf = fopen(tinfo.path.c_str(), "rb");
      if (!pf || !tf) {
        // shard deleted/moved mid-rotation: error out rather than hang
        fprintf(stderr, "npy_loader: cannot reopen shard %s\n",
                (!pf ? pinfo.path : tinfo.path).c_str());
        if (pf) fclose(pf);
        if (tf) fclose(tf);
        fail();
        return;
      }
      int64_t sample_index = 0;
      const int64_t max_rows = pinfo.rows();
      while (sample_index < max_rows) {
        int64_t need = batch_size_ - ov_rows;
        int64_t take = std::min(need, max_rows - sample_index);

        size_t pr = prefix_row_elems_, tr = tokens_row_elems_;
        ov_prefix.resize((size_t)(ov_rows + take) * pr);
        ov_tokens.resize((size_t)(ov_rows + take) * tr);
        if (!read_rows(pinfo, pf, sample_index, take,
                       ov_prefix.data() + (size_t)ov_rows * pr) ||
            !read_rows(tinfo, tf, sample_index, take,
                       ov_tokens.data() + (size_t)ov_rows * tr)) {
          fclose(pf);
          fclose(tf);
          fail();
          return;
        }
        ov_rows += take;
        sample_index += take;

        if (ov_rows == batch_size_) {
          Batch b;
          b.prefixes = std::move(ov_prefix);
          b.tokens = std::move(ov_tokens);
          ov_prefix.clear();
          ov_tokens.clear();
          ov_rows = 0;
          std::unique_lock<std::mutex> lk(mu_);
          cv_producer_.wait(lk, [this] {
            return stop_ || (int)queue_.size() < queue_depth_;
          });
          if (stop_) {
            fclose(pf);
            fclose(tf);
            return;
          }
          queue_.push_back(std::move(b));
          lk.unlock();
          cv_consumer_.notify_one();
        }
      }
      fclose(pf);
      fclose(tf);
      ++file_index;
    }
  }

  std::vector<NpyInfo> prefix_files_, tokens_files_;
  int64_t batch_size_;
  int queue_depth_;
  size_t prefix_row_elems_ = 0, tokens_row_elems_ = 0;
  int64_t sample_count_ = 0;

  std::thread worker_;
  std::mutex mu_;
  std::condition_variable cv_producer_, cv_consumer_;
  std::deque<Batch> queue_;
  bool stop_ = false;
};

}  // namespace

extern "C" {

void* loader_create(const char* prefix_dir, const char* tokens_dir,
                    int64_t batch_size, int queue_depth) {
  auto pfiles_names = list_npy_sorted(prefix_dir);
  auto tfiles_names = list_npy_sorted(tokens_dir);
  if (pfiles_names.empty() || pfiles_names.size() != tfiles_names.size())
    return nullptr;
  std::vector<NpyInfo> pfiles, tfiles;
  for (size_t i = 0; i < pfiles_names.size(); ++i) {
    NpyInfo p, t;
    if (!parse_npy_header(pfiles_names[i], &p)) return nullptr;
    if (!parse_npy_header(tfiles_names[i], &t)) return nullptr;
    if (p.rows() != t.rows()) return nullptr;
    if (i > 0) {
      // every shard must share shard 0's row width and dtype — the output
      // buffers (and ov_prefix/ov_tokens) are sized from shard 0, so a
      // wider later shard would overflow them on the worker thread
      if (p.row_elems() != pfiles[0].row_elems() || p.descr != pfiles[0].descr)
        return nullptr;
      if (t.row_elems() != tfiles[0].row_elems() || t.descr != tfiles[0].descr)
        return nullptr;
    }
    pfiles.push_back(std::move(p));
    tfiles.push_back(std::move(t));
  }
  return new Loader(std::move(pfiles), std::move(tfiles), batch_size,
                    queue_depth > 0 ? queue_depth : 2);
}

void loader_row_info(void* handle, int64_t* prefix_row_elems,
                     int64_t* tokens_row_elems, int64_t* sample_count) {
  auto* l = (Loader*)handle;
  *prefix_row_elems = (int64_t)l->prefix_row_elems();
  *tokens_row_elems = (int64_t)l->tokens_row_elems();
  *sample_count = l->sample_count();
}

int loader_next(void* handle, float* prefix_out, int64_t* tokens_out) {
  auto* l = (Loader*)handle;
  return l->next(prefix_out, tokens_out) ? 0 : 1;
}

void loader_destroy(void* handle) { delete (Loader*)handle; }

}  // extern "C"
