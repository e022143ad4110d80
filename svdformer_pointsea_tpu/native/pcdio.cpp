// Fast PCD point-cloud reader (C++), exposed to Python via ctypes.
//
// The reference delegates .pcd parsing to open3d's C++ IO inside DataLoader
// worker processes; this is the TPU framework's native equivalent for the
// host-side input pipeline (threaded Python prefetch + native parse).
//
// Supports PCD v0.7 with DATA ascii, binary, and binary_compressed (PCL's
// LZF framing: u32 compressed size, u32 uncompressed size, LZF payload with
// field-major storage). Returns the x/y/z columns as float32.
//
// Build: g++ -O3 -shared -fPIC -o libpcdio.so pcdio.cpp

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Field {
  std::string name;
  int size = 4;
  char type = 'F';
  int count = 1;
};

// LZF decompression (standard algorithm: literal runs for control bytes
// < 32, otherwise back-references of length (ctrl>>5)+2 with 13-bit offset).
bool lzf_decompress(const uint8_t* in, size_t in_len, uint8_t* out,
                    size_t out_len) {
  size_t ip = 0, op = 0;
  while (ip < in_len) {
    uint32_t ctrl = in[ip++];
    if (ctrl < 32) {  // literal run of ctrl+1 bytes
      uint32_t len = ctrl + 1;
      if (ip + len > in_len || op + len > out_len) return false;
      std::memcpy(out + op, in + ip, len);
      ip += len;
      op += len;
    } else {  // back reference
      uint32_t len = ctrl >> 5;
      if (len == 7) {
        if (ip >= in_len) return false;
        len += in[ip++];
      }
      if (ip >= in_len) return false;
      uint32_t ref_off = ((ctrl & 0x1f) << 8) + in[ip++] + 1;
      if (ref_off > op) return false;
      size_t ref = op - ref_off;
      len += 2;
      if (op + len > out_len) return false;
      for (uint32_t i = 0; i < len; ++i) out[op + i] = out[ref + i];
      op += len;
    }
  }
  return op == out_len;
}

double parse_value(const uint8_t* p, char type, int size) {
  switch (type) {
    case 'F':
      if (size == 4) {
        float v;
        std::memcpy(&v, p, 4);
        return v;
      } else {
        double v;
        std::memcpy(&v, p, 8);
        return v;
      }
    case 'I': {
      if (size == 1) return *reinterpret_cast<const int8_t*>(p);
      if (size == 2) {
        int16_t v;
        std::memcpy(&v, p, 2);
        return v;
      }
      int32_t v;
      std::memcpy(&v, p, 4);
      return v;
    }
    case 'U': {
      if (size == 1) return *p;
      if (size == 2) {
        uint16_t v;
        std::memcpy(&v, p, 2);
        return v;
      }
      uint32_t v;
      std::memcpy(&v, p, 4);
      return v;
    }
  }
  return 0.0;
}

}  // namespace

extern "C" {

// Parse the PCD at `path`. On success returns the number of points and
// writes a malloc'd float32 buffer of xyz triplets to *out (caller frees via
// pcd_free). Returns -1 on failure.
long pcd_read_xyz(const char* path, float** out) {
  *out = nullptr;
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::vector<Field> fields;
  long npoints = -1;
  std::string data_mode;

  char line[4096];
  long header_end = 0;
  while (std::fgets(line, sizeof(line), f)) {
    std::string s(line);
    if (s.rfind("FIELDS", 0) == 0) {
      fields.clear();
      char* tok = std::strtok(line + 6, " \t\r\n");
      while (tok) {
        Field fd;
        fd.name = tok;
        fields.push_back(fd);
        tok = std::strtok(nullptr, " \t\r\n");
      }
    } else if (s.rfind("SIZE", 0) == 0) {
      char* tok = std::strtok(line + 4, " \t\r\n");
      for (size_t i = 0; tok && i < fields.size(); ++i) {
        fields[i].size = std::atoi(tok);
        tok = std::strtok(nullptr, " \t\r\n");
      }
    } else if (s.rfind("TYPE", 0) == 0) {
      char* tok = std::strtok(line + 4, " \t\r\n");
      for (size_t i = 0; tok && i < fields.size(); ++i) {
        fields[i].type = tok[0];
        tok = std::strtok(nullptr, " \t\r\n");
      }
    } else if (s.rfind("COUNT", 0) == 0) {
      char* tok = std::strtok(line + 5, " \t\r\n");
      for (size_t i = 0; tok && i < fields.size(); ++i) {
        fields[i].count = std::atoi(tok);
        tok = std::strtok(nullptr, " \t\r\n");
      }
    } else if (s.rfind("POINTS", 0) == 0) {
      npoints = std::atol(s.c_str() + 6);
    } else if (s.rfind("DATA", 0) == 0) {
      data_mode = s.substr(5);
      while (!data_mode.empty() &&
             (data_mode.back() == '\n' || data_mode.back() == '\r'))
        data_mode.pop_back();
      header_end = std::ftell(f);
      break;
    }
  }
  if (npoints < 0 || fields.empty() || data_mode.empty()) {
    std::fclose(f);
    return -1;
  }

  int xi = -1, yi = -1, zi = -1;
  int stride = 0;
  std::vector<int> offsets(fields.size());
  for (size_t i = 0; i < fields.size(); ++i) {
    offsets[i] = stride;
    stride += fields[i].size * fields[i].count;
    if (fields[i].name == "x") xi = (int)i;
    if (fields[i].name == "y") yi = (int)i;
    if (fields[i].name == "z") zi = (int)i;
  }
  if (xi < 0 || yi < 0 || zi < 0) {
    std::fclose(f);
    return -1;
  }

  float* res = (float*)std::malloc(sizeof(float) * 3 * npoints);
  if (!res) {
    std::fclose(f);
    return -1;
  }

  bool ok = true;
  if (data_mode == "ascii") {
    for (long p = 0; p < npoints && ok; ++p) {
      for (size_t i = 0; i < fields.size(); ++i) {
        for (int c = 0; c < fields[i].count; ++c) {
          double v = 0;
          if (std::fscanf(f, "%lf", &v) != 1) {
            ok = false;
            break;
          }
          if (c == 0) {
            if ((int)i == xi) res[p * 3 + 0] = (float)v;
            if ((int)i == yi) res[p * 3 + 1] = (float)v;
            if ((int)i == zi) res[p * 3 + 2] = (float)v;
          }
        }
        if (!ok) break;
      }
    }
  } else if (data_mode == "binary") {
    std::vector<uint8_t> buf((size_t)stride * npoints);
    ok = std::fread(buf.data(), 1, buf.size(), f) == buf.size();
    if (ok) {
      for (long p = 0; p < npoints; ++p) {
        const uint8_t* rec = buf.data() + (size_t)p * stride;
        res[p * 3 + 0] =
            (float)parse_value(rec + offsets[xi], fields[xi].type, fields[xi].size);
        res[p * 3 + 1] =
            (float)parse_value(rec + offsets[yi], fields[yi].type, fields[yi].size);
        res[p * 3 + 2] =
            (float)parse_value(rec + offsets[zi], fields[zi].type, fields[zi].size);
      }
    }
  } else if (data_mode == "binary_compressed") {
    uint32_t comp = 0, uncomp = 0;
    ok = std::fread(&comp, 4, 1, f) == 1 && std::fread(&uncomp, 4, 1, f) == 1;
    if (ok) {
      std::vector<uint8_t> cbuf(comp), ubuf(uncomp);
      ok = std::fread(cbuf.data(), 1, comp, f) == comp &&
           lzf_decompress(cbuf.data(), comp, ubuf.data(), uncomp);
      if (ok) {
        // binary_compressed stores data field-major (SoA).
        std::vector<size_t> field_off(fields.size());
        size_t acc = 0;
        for (size_t i = 0; i < fields.size(); ++i) {
          field_off[i] = acc;
          acc += (size_t)fields[i].size * fields[i].count * npoints;
        }
        ok = acc <= uncomp;
        if (ok) {
          for (long p = 0; p < npoints; ++p) {
            const uint8_t* px =
                ubuf.data() + field_off[xi] + (size_t)p * fields[xi].size;
            const uint8_t* py =
                ubuf.data() + field_off[yi] + (size_t)p * fields[yi].size;
            const uint8_t* pz =
                ubuf.data() + field_off[zi] + (size_t)p * fields[zi].size;
            res[p * 3 + 0] = (float)parse_value(px, fields[xi].type, fields[xi].size);
            res[p * 3 + 1] = (float)parse_value(py, fields[yi].type, fields[yi].size);
            res[p * 3 + 2] = (float)parse_value(pz, fields[zi].type, fields[zi].size);
          }
        }
      }
    }
  } else {
    ok = false;
  }

  std::fclose(f);
  if (!ok) {
    std::free(res);
    return -1;
  }
  *out = res;
  return npoints;
}

void pcd_free(float* p) { std::free(p); }

}  // extern "C"
