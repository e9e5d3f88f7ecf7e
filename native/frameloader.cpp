// frameloader: parallel zip/npz member reader for the host data path.
//
// The reference's data loader spends its worker-process time in Python
// zipfile parsing + per-frame npz decompression (DiskCalvinDataset loads one
// .npz per frame through a ThreadPoolExecutor, data_utils.py:1070-1072).
// This library moves that hot path to native code: zip central-directory
// parsing, stored/deflate member extraction (zlib), and a std::thread fan-out
// that runs fully outside the Python GIL. Python binds it with ctypes
// (dreamvla_tpu/data/native_loader.py) and falls back to numpy when the
// shared object is absent.
//
// Build: make -C native   (g++ -O3 -shared -fPIC frameloader.cpp -lz)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>
#include <zlib.h>

namespace {

struct Member {
  uint16_t method = 0;
  uint64_t comp_size = 0;
  uint64_t uncomp_size = 0;
  uint64_t header_offset = 0;
};

uint16_t rd16(const uint8_t* p) { return p[0] | (p[1] << 8); }
uint32_t rd32(const uint8_t* p) {
  return p[0] | (p[1] << 8) | (p[2] << 16) | (uint32_t(p[3]) << 24);
}

// Reads the whole file; small episode files (<10MB) make this the fastest
// option (one syscall, page-cache friendly).
bool read_file(const char* path, std::vector<uint8_t>& buf) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (size < 0) {
    fclose(f);
    return false;
  }
  buf.resize(size_t(size));
  size_t got = fread(buf.data(), 1, size_t(size), f);
  fclose(f);
  return got == size_t(size);
}

// Locate a member via the central directory (EOCD scan from the tail).
bool find_member(const std::vector<uint8_t>& zip, const char* name,
                 Member* out) {
  if (zip.size() < 22) return false;
  size_t scan_from = zip.size() >= 22 + 65535 ? zip.size() - 22 - 65535 : 0;
  size_t eocd = std::string::npos;
  for (size_t i = zip.size() - 22; i + 1 > scan_from; --i) {
    if (rd32(&zip[i]) == 0x06054b50) {
      eocd = i;
      break;
    }
    if (i == 0) break;
  }
  if (eocd == std::string::npos) return false;
  uint16_t count = rd16(&zip[eocd + 10]);
  uint64_t cd_off = rd32(&zip[eocd + 16]);
  size_t want_len = strlen(name);
  size_t p = cd_off;
  for (uint16_t e = 0; e < count; ++e) {
    if (p + 46 > zip.size() || rd32(&zip[p]) != 0x02014b50) return false;
    uint16_t method = rd16(&zip[p + 10]);
    uint32_t comp = rd32(&zip[p + 20]);
    uint32_t uncomp = rd32(&zip[p + 24]);
    uint16_t nlen = rd16(&zip[p + 28]);
    uint16_t xlen = rd16(&zip[p + 30]);
    uint16_t clen = rd16(&zip[p + 32]);
    uint32_t lho = rd32(&zip[p + 42]);
    if (nlen == want_len && memcmp(&zip[p + 46], name, want_len) == 0) {
      out->method = method;
      out->comp_size = comp;
      out->uncomp_size = uncomp;
      out->header_offset = lho;
      return true;
    }
    p += 46 + nlen + xlen + clen;
  }
  return false;
}

// Extract (inflate if deflated) a member into a malloc'd buffer.
int64_t extract(const std::vector<uint8_t>& zip, const Member& m,
                uint8_t** out) {
  size_t p = m.header_offset;
  if (p + 30 > zip.size() || rd32(&zip[p]) != 0x04034b50) return -1;
  uint16_t nlen = rd16(&zip[p + 26]);
  uint16_t xlen = rd16(&zip[p + 28]);
  size_t data = p + 30 + nlen + xlen;
  if (data + m.comp_size > zip.size()) return -1;
  uint8_t* buf = static_cast<uint8_t*>(malloc(m.uncomp_size ? m.uncomp_size : 1));
  if (!buf) return -1;
  if (m.method == 0) {  // stored
    memcpy(buf, &zip[data], m.uncomp_size);
  } else if (m.method == 8) {  // deflate
    z_stream zs;
    memset(&zs, 0, sizeof(zs));
    if (inflateInit2(&zs, -15) != Z_OK) {
      free(buf);
      return -1;
    }
    zs.next_in = const_cast<uint8_t*>(&zip[data]);
    zs.avail_in = uInt(m.comp_size);
    zs.next_out = buf;
    zs.avail_out = uInt(m.uncomp_size);
    int rc = inflate(&zs, Z_FINISH);
    inflateEnd(&zs);
    if (rc != Z_STREAM_END) {
      free(buf);
      return -1;
    }
  } else {
    free(buf);
    return -1;
  }
  *out = buf;
  return int64_t(m.uncomp_size);
}

}  // namespace

extern "C" {

// Read one npz member (raw .npy bytes incl. header). Returns size or -1.
int64_t fl_read_member(const char* path, const char* member, uint8_t** out) {
  std::vector<uint8_t> zip;
  if (!read_file(path, zip)) return -1;
  std::string name = std::string(member) + ".npy";
  Member m;
  if (!find_member(zip, name.c_str(), &m)) {
    // some writers store members without the .npy suffix
    if (!find_member(zip, member, &m)) return -1;
  }
  return extract(zip, m, out);
}

// Parallel batch read: n (path, member) tasks fanned over n_threads.
// outs[i]/sizes[i] receive per-task results (size -1 on failure).
int fl_read_members_batch(const char** paths, const char** members, int n,
                          uint8_t** outs, int64_t* sizes, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::vector<std::thread> pool;
  auto worker = [&](int tid) {
    for (int i = tid; i < n; i += n_threads) {
      sizes[i] = fl_read_member(paths[i], members[i], &outs[i]);
    }
  };
  for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker, t);
  for (auto& th : pool) th.join();
  return 0;
}

void fl_free(uint8_t* p) { free(p); }

}  // extern "C"
