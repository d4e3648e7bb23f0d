// fvio: asynchronous tagged-binary array I/O engine.
//
// Native runtime component playing the role of the reference's FMS I/O
// layer (fms2_io / mpp_io behind restart.F90 and fv_io.F90): the model
// thread hands off arrays and keeps computing while a writer thread
// streams them to disk. Format: "FVIO" magic + little-endian records
//   [u32 name_len][name][u8 dtype][u8 ndim][u64 dims...][u64 nbytes]
//   [payload][u32 crc32-of-payload]
// terminated by a zero name_len sentinel and a file-level record count.
//
// C ABI for ctypes; no Python dependencies.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <condition_variable>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

uint32_t crc32_table[256];
struct CrcInit {
  CrcInit() {
    for (uint32_t i = 0; i < 256; i++) {
      uint32_t c = i;
      for (int k = 0; k < 8; k++)
        c = (c & 1) ? 0xEDB88320u ^ (c >> 1) : c >> 1;
      crc32_table[i] = c;
    }
  }
} crc_init;

uint32_t crc32(const uint8_t* p, size_t n, uint32_t crc = 0) {
  crc = ~crc;
  for (size_t i = 0; i < n; i++)
    crc = crc32_table[(crc ^ p[i]) & 0xFF] ^ (crc >> 8);
  return ~crc;
}

struct Record {
  std::string name;
  uint8_t dtype;
  std::vector<uint64_t> dims;
  std::vector<uint8_t> payload;   // copied at submit time
};

struct Writer {
  FILE* f = nullptr;
  std::thread thread;
  std::deque<Record> queue;
  std::mutex mu;
  std::condition_variable cv;
  bool closing = false;
  bool failed = false;
  uint64_t nrecords = 0;

  explicit Writer(const char* path) {
    f = std::fopen(path, "wb");
    if (!f) { failed = true; return; }
    std::fwrite("FVIO\x01\x00\x00\x00", 1, 8, f);
    thread = std::thread([this] { run(); });
  }

  void run() {
    for (;;) {
      Record rec;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv.wait(lk, [this] { return closing || !queue.empty(); });
        if (queue.empty()) break;     // closing and drained
        rec = std::move(queue.front());
        queue.pop_front();
      }
      write_record(rec);
      cv.notify_all();
    }
  }

  void write_record(const Record& r) {
    uint32_t nl = (uint32_t)r.name.size();
    std::fwrite(&nl, 4, 1, f);
    std::fwrite(r.name.data(), 1, nl, f);
    uint8_t nd = (uint8_t)r.dims.size();
    std::fwrite(&r.dtype, 1, 1, f);
    std::fwrite(&nd, 1, 1, f);
    for (uint64_t d : r.dims) std::fwrite(&d, 8, 1, f);
    uint64_t nb = r.payload.size();
    std::fwrite(&nb, 8, 1, f);
    if (nb) std::fwrite(r.payload.data(), 1, nb, f);
    uint32_t crc = crc32(r.payload.data(), nb);
    std::fwrite(&crc, 4, 1, f);
    nrecords++;
  }

  void submit(const char* name, uint8_t dtype, int ndim,
              const uint64_t* dims, const void* data, uint64_t nbytes) {
    Record r;
    r.name = name;
    r.dtype = dtype;
    r.dims.assign(dims, dims + ndim);
    r.payload.assign((const uint8_t*)data, (const uint8_t*)data + nbytes);
    {
      std::lock_guard<std::mutex> lk(mu);
      queue.push_back(std::move(r));
    }
    cv.notify_all();
  }

  int pending() {
    std::lock_guard<std::mutex> lk(mu);
    return (int)queue.size();
  }

  void close() {
    {
      std::lock_guard<std::mutex> lk(mu);
      closing = true;
    }
    cv.notify_all();
    if (thread.joinable()) thread.join();
    if (f) {
      uint32_t zero = 0;
      std::fwrite(&zero, 4, 1, f);            // sentinel
      std::fwrite(&nrecords, 8, 1, f);
      std::fclose(f);
      f = nullptr;
    }
  }

  ~Writer() { close(); }
};

}  // namespace

extern "C" {

void* fvio_open(const char* path) {
  Writer* w = new Writer(path);
  if (w->failed) { delete w; return nullptr; }
  return w;
}

// dtype codes: 0=f32 1=f64 2=i32 3=i64 4=u8
int fvio_write(void* h, const char* name, int dtype, int ndim,
               const uint64_t* dims, const void* data, uint64_t nbytes) {
  if (!h) return -1;
  static_cast<Writer*>(h)->submit(name, (uint8_t)dtype, ndim, dims, data,
                                  nbytes);
  return 0;
}

int fvio_pending(void* h) {
  return h ? static_cast<Writer*>(h)->pending() : -1;
}

int fvio_close(void* h) {
  if (!h) return -1;
  Writer* w = static_cast<Writer*>(h);
  w->close();
  delete w;
  return 0;
}

uint32_t fvio_crc32(const void* data, uint64_t nbytes) {
  return crc32((const uint8_t*)data, nbytes);
}

}  // extern "C"
