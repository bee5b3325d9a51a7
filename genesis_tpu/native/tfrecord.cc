// Native tfrecord reader + tf.train.Example parser.
//
// The hot host-side path of the data pipelines (SURVEY.md section 2.2:
// the reference leans on TensorFlow's C++ tf.data runtime for this).
// Exposed as a C ABI for ctypes; genesis_tpu/data/tfrecord.py uses it as
// the fast path with the pure-Python implementation as fallback.
//
// Build: g++ -O3 -march=native -shared -fPIC tfrecord.cc -o
//        libgenesis_native.so -lz
//
// Capabilities:
//   * stream plain or whole-file-GZIP tfrecords (framing: u64 length,
//     masked crc32c of length, payload, masked crc32c of payload)
//   * optional crc32c verification (slice-by-8 table implementation)
//   * Example wire-format field extraction: concatenated BytesList
//     payloads, packed/unpacked FloatList, varint Int64List

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <zlib.h>

extern "C" {

// ---------------------------------------------------------------------
// crc32c
// ---------------------------------------------------------------------

static uint32_t crc_table[8][256];
static bool crc_init_done = false;

static void crc_init() {
  if (crc_init_done) return;
  const uint32_t poly = 0x82F63B78u;
  for (int i = 0; i < 256; ++i) {
    uint32_t crc = (uint32_t)i;
    for (int k = 0; k < 8; ++k)
      crc = (crc >> 1) ^ ((crc & 1) ? poly : 0);
    crc_table[0][i] = crc;
  }
  for (int t = 1; t < 8; ++t)
    for (int i = 0; i < 256; ++i)
      crc_table[t][i] = (crc_table[t - 1][i] >> 8) ^
                        crc_table[0][crc_table[t - 1][i] & 0xFF];
  crc_init_done = true;
}

uint32_t gt_crc32c(const uint8_t* data, int64_t n) {
  crc_init();
  uint32_t crc = 0xFFFFFFFFu;
  while (n >= 8) {
    uint64_t word;
    memcpy(&word, data, 8);
    word ^= (uint64_t)crc;
    crc = crc_table[7][word & 0xFF] ^
          crc_table[6][(word >> 8) & 0xFF] ^
          crc_table[5][(word >> 16) & 0xFF] ^
          crc_table[4][(word >> 24) & 0xFF] ^
          crc_table[3][(word >> 32) & 0xFF] ^
          crc_table[2][(word >> 40) & 0xFF] ^
          crc_table[1][(word >> 48) & 0xFF] ^
          crc_table[0][(word >> 56) & 0xFF];
    data += 8;
    n -= 8;
  }
  while (n-- > 0)
    crc = crc_table[0][(crc ^ *data++) & 0xFF] ^ (crc >> 8);
  return crc ^ 0xFFFFFFFFu;
}

static uint32_t masked_crc(const uint8_t* data, int64_t n) {
  uint32_t c = gt_crc32c(data, n);
  return ((c >> 15) | (c << 17)) + 0xA282EAD8u;
}

// ---------------------------------------------------------------------
// Record streams
// ---------------------------------------------------------------------

struct Stream {
  FILE* file = nullptr;
  gzFile gz = nullptr;
  bool verify = false;
  // Length of a record whose header was consumed but whose payload did
  // not fit the caller's buffer (-1 = none) — lets gt_next be retried
  // with a larger buffer.
  int64_t pending = -1;
};

static int64_t stream_read(Stream* s, uint8_t* buf, int64_t n) {
  if (s->gz) return (int64_t)gzread(s->gz, buf, (unsigned)n);
  return (int64_t)fread(buf, 1, (size_t)n, s->file);
}

void* gt_open(const char* path, int gzip, int verify_crc) {
  Stream* s = new Stream();
  s->verify = verify_crc != 0;
  if (gzip) {
    s->gz = gzopen(path, "rb");
    if (!s->gz) { delete s; return nullptr; }
    gzbuffer(s->gz, 1 << 20);
  } else {
    s->file = fopen(path, "rb");
    if (!s->file) { delete s; return nullptr; }
  }
  return s;
}

void gt_close(void* handle) {
  Stream* s = (Stream*)handle;
  if (!s) return;
  if (s->gz) gzclose(s->gz);
  if (s->file) fclose(s->file);
  delete s;
}

// Returns: >=0 record length written to buf; -1 EOF; -3 corrupt;
// <= -16: buffer too small, required size = -(ret + 16) (the +16 offset
// keeps small-length codes clear of the fixed sentinels). The pending
// record is retained for retry with a larger buffer.
int64_t gt_next(void* handle, uint8_t* buf, int64_t capacity) {
  Stream* s = (Stream*)handle;
  uint64_t length;
  if (s->pending >= 0) {
    length = (uint64_t)s->pending;
  } else {
    uint8_t header[12];
    int64_t got = stream_read(s, header, 12);
    if (got == 0) return -1;
    if (got < 12) return -3;
    memcpy(&length, header, 8);
    if (s->verify) {
      uint32_t want;
      memcpy(&want, header + 8, 4);
      if (masked_crc(header, 8) != want) return -3;
    }
  }
  if ((int64_t)length > capacity) {
    s->pending = (int64_t)length;
    return -16 - (int64_t)length;  // required size encoded
  }
  s->pending = -1;
  if (stream_read(s, buf, (int64_t)length) < (int64_t)length) return -3;
  uint8_t crc_bytes[4];
  if (stream_read(s, crc_bytes, 4) < 4) return -3;
  if (s->verify) {
    uint32_t want;
    memcpy(&want, crc_bytes, 4);
    if (masked_crc(buf, (int64_t)length) != want) return -3;
  }
  return (int64_t)length;
}

// Skip n records without copying payloads. Returns number skipped.
int64_t gt_skip(void* handle, int64_t n) {
  Stream* s = (Stream*)handle;
  uint8_t scratch[1 << 14];  // stack-local: thread-safe
  int64_t skipped = 0;
  for (; skipped < n; ++skipped) {
    uint8_t header[12];
    if (stream_read(s, header, 12) < 12) break;
    uint64_t length;
    memcpy(&length, header, 8);
    int64_t remaining = (int64_t)length + 4;
    if (s->file) {
      if (fseek(s->file, (long)remaining, SEEK_CUR) != 0) break;
    } else {
      while (remaining > 0) {
        int64_t chunk = remaining < (int64_t)sizeof(scratch)
                            ? remaining : (int64_t)sizeof(scratch);
        if (stream_read(s, scratch, chunk) < chunk) return skipped;
        remaining -= chunk;
      }
    }
  }
  return skipped;
}

// ---------------------------------------------------------------------
// Example wire parsing
// ---------------------------------------------------------------------

static bool read_varint(const uint8_t* buf, int64_t len, int64_t* pos,
                        uint64_t* out) {
  uint64_t result = 0;
  int shift = 0;
  while (*pos < len) {
    uint8_t b = buf[(*pos)++];
    result |= (uint64_t)(b & 0x7F) << shift;
    if (!(b & 0x80)) { *out = result; return true; }
    shift += 7;
    if (shift > 63) return false;
  }
  return false;
}

struct Field {
  uint64_t number;
  int wire;
  const uint8_t* data;  // for wire 2; else nullptr
  int64_t len;
  uint64_t varint;      // for wire 0
};

static bool next_field(const uint8_t* buf, int64_t len, int64_t* pos,
                       Field* f) {
  if (*pos >= len) return false;
  uint64_t tag;
  if (!read_varint(buf, len, pos, &tag)) return false;
  f->number = tag >> 3;
  f->wire = (int)(tag & 0x7);
  f->data = nullptr;
  f->len = 0;
  f->varint = 0;
  switch (f->wire) {
    case 0:
      return read_varint(buf, len, pos, &f->varint);
    case 1:
      f->data = buf + *pos; f->len = 8; *pos += 8;
      return *pos <= len;
    case 2: {
      uint64_t l;
      if (!read_varint(buf, len, pos, &l)) return false;
      f->data = buf + *pos; f->len = (int64_t)l; *pos += (int64_t)l;
      return *pos <= len;
    }
    case 5:
      f->data = buf + *pos; f->len = 4; *pos += 4;
      return *pos <= len;
    default:
      return false;
  }
}

// Find the Feature message for `key` inside a serialised Example.
static bool find_feature(const uint8_t* rec, int64_t len, const char* key,
                         const uint8_t** feat, int64_t* feat_len) {
  int64_t klen = (int64_t)strlen(key);
  int64_t pos = 0;
  Field f;
  const uint8_t* features = nullptr;
  int64_t features_len = 0;
  while (next_field(rec, len, &pos, &f)) {
    if (f.number == 1 && f.wire == 2) {
      features = f.data;
      features_len = f.len;
    }
  }
  if (!features) return false;
  pos = 0;
  while (next_field(features, features_len, &pos, &f)) {
    if (f.number != 1 || f.wire != 2) continue;
    // map entry: 1=key 2=value
    int64_t epos = 0;
    Field ef;
    const uint8_t* k = nullptr;
    int64_t kl = 0;
    const uint8_t* v = nullptr;
    int64_t vl = 0;
    while (next_field(f.data, f.len, &epos, &ef)) {
      if (ef.number == 1 && ef.wire == 2) { k = ef.data; kl = ef.len; }
      if (ef.number == 2 && ef.wire == 2) { v = ef.data; vl = ef.len; }
    }
    if (k && kl == klen && memcmp(k, key, (size_t)klen) == 0 && v) {
      *feat = v;
      *feat_len = vl;
      return true;
    }
  }
  return false;
}

// Extract a feature's payload into `out`.
//   kind 1: BytesList -> concatenated bytes; returns total bytes
//   kind 2: FloatList -> float32 array; returns count of floats
//   kind 3: Int64List -> int64 array; returns count of ints
// Returns -1 if missing, -2 if out too small (required size encoded as
// -2 - needed), -3 on parse error. `out` may be null to query size.
int64_t gt_extract(const uint8_t* rec, int64_t len, const char* key,
                   int kind, uint8_t* out, int64_t capacity) {
  const uint8_t* feat;
  int64_t feat_len;
  if (!find_feature(rec, len, key, &feat, &feat_len)) return -1;
  int64_t pos = 0;
  Field f;
  int64_t written = 0;  // bytes for kind1, element count otherwise
  while (next_field(feat, feat_len, &pos, &f)) {
    // Feature oneof: 1=BytesList, 2=FloatList, 3=Int64List
    if ((int)f.number != kind || f.wire != 2) continue;
    int64_t lpos = 0;
    Field lf;
    while (next_field(f.data, f.len, &lpos, &lf)) {
      if (lf.number != 1) continue;
      if (kind == 1) {  // bytes values
        if (out) {
          if (written + lf.len > capacity)
            return -2 - (written + lf.len);
          memcpy(out + written, lf.data, (size_t)lf.len);
        }
        written += lf.len;
      } else if (kind == 2) {  // floats: packed or fixed32
        int64_t count = lf.wire == 2 ? lf.len / 4 : 1;
        if (out) {
          if ((written + count) * 4 > capacity)
            return -2 - (written + count);
          memcpy(out + written * 4, lf.data, (size_t)(count * 4));
        }
        written += count;
      } else if (kind == 3) {  // int64 varints
        if (lf.wire == 2) {
          int64_t vpos = 0;
          uint64_t v;
          while (vpos < lf.len) {
            if (!read_varint(lf.data, lf.len, &vpos, &v)) return -3;
            if (out) {
              if ((written + 1) * 8 > capacity) return -2 - (written + 1);
              memcpy(out + written * 8, &v, 8);
            }
            written += 1;
          }
        } else if (lf.wire == 0) {
          if (out) {
            if ((written + 1) * 8 > capacity) return -2 - (written + 1);
            memcpy(out + written * 8, &lf.varint, 8);
          }
          written += 1;
        }
      }
    }
  }
  return written;
}

// Count of values in a BytesList (for per-element access, e.g. GQN JPEG
// frames) and per-element extraction.
int64_t gt_bytes_count(const uint8_t* rec, int64_t len, const char* key) {
  const uint8_t* feat;
  int64_t feat_len;
  if (!find_feature(rec, len, key, &feat, &feat_len)) return -1;
  int64_t pos = 0, count = 0;
  Field f;
  while (next_field(feat, feat_len, &pos, &f)) {
    if (f.number != 1 || f.wire != 2) continue;
    int64_t lpos = 0;
    Field lf;
    while (next_field(f.data, f.len, &lpos, &lf))
      if (lf.number == 1) ++count;
  }
  return count;
}

int64_t gt_bytes_at(const uint8_t* rec, int64_t len, const char* key,
                    int64_t index, uint8_t* out, int64_t capacity) {
  const uint8_t* feat;
  int64_t feat_len;
  if (!find_feature(rec, len, key, &feat, &feat_len)) return -1;
  int64_t pos = 0, count = 0;
  Field f;
  while (next_field(feat, feat_len, &pos, &f)) {
    if (f.number != 1 || f.wire != 2) continue;
    int64_t lpos = 0;
    Field lf;
    while (next_field(f.data, f.len, &lpos, &lf)) {
      if (lf.number != 1) continue;
      if (count == index) {
        if (!out) return lf.len;
        if (lf.len > capacity) return -2 - lf.len;
        memcpy(out, lf.data, (size_t)lf.len);
        return lf.len;
      }
      ++count;
    }
  }
  return -1;
}

}  // extern "C"
