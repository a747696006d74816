// Fast multi-threaded SVMLight/LETOR parser.
//
// Native counterpart of the reference's single-threaded getline/read_token
// parser (Svml::read_horizontal, src/io/svml.cc:38-161): the whole file is
// read into memory, split at line boundaries into per-thread chunks, parsed
// into sparse (fid, value) rows with thread-local buffers, then densified
// into one row-major [num_docs, max_fid] float matrix in parallel.  Exposed
// through a plain C ABI for ctypes (no pybind11 in this image).
//
// Format per line:  <label> qid:<qid> <fid>:<value> ... # optional comment
//
// Build: g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread \
//            -o libsvmlparse.so svml_parser.cc

#include <atomic>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <cstdio>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Row {
  float label;
  int64_t qid;
  uint32_t begin;  // index range into the chunk's (fid, val) pool
  uint32_t end;
};

struct Chunk {
  std::vector<Row> rows;
  std::vector<std::pair<int32_t, float>> pool;
  int32_t max_fid = 0;
  std::string error;
};

// Minimal fast float parse (strtof is locale-aware and slow-ish but fine
// and correct; the bottleneck is usually I/O).
inline const char *skip_ws(const char *p, const char *end) {
  while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
  return p;
}

void parse_chunk(const char *buf, size_t begin, size_t end_pos, Chunk *out) {
  const char *p = buf + begin;
  const char *end = buf + end_pos;
  while (p < end) {
    const char *line_end = static_cast<const char *>(
        memchr(p, '\n', static_cast<size_t>(end - p)));
    if (!line_end) line_end = end;
    const char *q = p;
    p = line_end + 1;
    // strip comment
    const char *hash = static_cast<const char *>(
        memchr(q, '#', static_cast<size_t>(line_end - q)));
    const char *stop = hash ? hash : line_end;
    q = skip_ws(q, stop);
    if (q >= stop) continue;  // empty line

    char *next = nullptr;
    float label = strtof(q, &next);
    if (next == q) {
      out->error = "malformed label";
      return;
    }
    q = skip_ws(next, stop);
    if (stop - q < 4 || strncmp(q, "qid:", 4) != 0) {
      out->error = "expected qid:";
      return;
    }
    q += 4;
    int64_t qid = strtoll(q, &next, 10);
    if (next == q) {
      // 'qid:' followed by a non-number would silently parse as qid 0
      // while the numpy fallback raises on int('')
      out->error = "malformed qid";
      return;
    }
    q = skip_ws(next, stop);

    Row row;
    row.label = label;
    row.qid = qid;
    row.begin = static_cast<uint32_t>(out->pool.size());
    while (q < stop) {
      long fid = strtol(q, &next, 10);
      if (next == q || *next != ':') {
        // trailing garbage is an ERROR, not an implicit end-of-line:
        // breaking silently would drop the rest of the row's features
        // where the numpy fallback raises (keep edge cases identical)
        out->error = "malformed feature token";
        return;
      }
      if (fid < 1) {
        // SVML feature ids are 1-based; 0/negative would otherwise be
        // silently skipped here while the numpy fallback raises — keep
        // the two parsers' edge-case behavior identical
        out->error = "feature id < 1 (SVML ids are 1-based)";
        return;
      }
      q = next + 1;
      float val = strtof(q, &next);
      if (next == q) {
        // unparseable value would be stored as 0.0 and the rest of the
        // line dropped; numpy raises on float('abc')
        out->error = "malformed feature value";
        return;
      }
      q = skip_ws(next, stop);
      out->pool.emplace_back(static_cast<int32_t>(fid), val);
      if (fid > out->max_fid) out->max_fid = static_cast<int32_t>(fid);
    }
    row.end = static_cast<uint32_t>(out->pool.size());
    out->rows.push_back(row);
  }
}

}  // namespace

extern "C" {

struct SvmlResult {
  int64_t num_docs;
  int64_t num_features;
  float *features;  // row-major [num_docs, num_features]
  float *labels;    // [num_docs]
  int64_t *qids;    // [num_docs] per-doc query id
  char *error;      // non-null on failure
};

SvmlResult *svml_read(const char *path, int nthreads) {
  auto *res = static_cast<SvmlResult *>(calloc(1, sizeof(SvmlResult)));
  FILE *f = fopen(path, "rb");
  if (!f) {
    res->error = strdup("cannot open file");
    return res;
  }
  fseek(f, 0, SEEK_END);
  long fsize = ftell(f);
  fseek(f, 0, SEEK_SET);
  char *buf = static_cast<char *>(malloc(static_cast<size_t>(fsize) + 1));
  if (!buf) {
    fclose(f);
    res->error = strdup("out of memory (file buffer)");
    return res;
  }
  if (fread(buf, 1, static_cast<size_t>(fsize), f) !=
      static_cast<size_t>(fsize)) {
    fclose(f);
    free(buf);
    res->error = strdup("short read");
    return res;
  }
  fclose(f);
  buf[fsize] = '\n';

  if (nthreads <= 0) {
    nthreads = static_cast<int>(std::thread::hardware_concurrency());
    if (nthreads <= 0) nthreads = 1;
  }
  size_t n = static_cast<size_t>(fsize);
  if (n < (size_t)(1 << 16)) nthreads = 1;

  // chunk boundaries snapped forward to newline
  std::vector<size_t> bounds(static_cast<size_t>(nthreads) + 1, 0);
  for (int t = 1; t < nthreads; ++t) {
    size_t pos = n * static_cast<size_t>(t) / static_cast<size_t>(nthreads);
    while (pos < n && buf[pos] != '\n') ++pos;
    bounds[static_cast<size_t>(t)] = pos + 1;
  }
  bounds[static_cast<size_t>(nthreads)] = n;

  std::vector<Chunk> chunks(static_cast<size_t>(nthreads));
  {
    std::vector<std::thread> threads;
    for (int t = 0; t < nthreads; ++t) {
      threads.emplace_back(parse_chunk, buf, bounds[static_cast<size_t>(t)],
                           bounds[static_cast<size_t>(t) + 1],
                           &chunks[static_cast<size_t>(t)]);
    }
    for (auto &th : threads) th.join();
  }
  free(buf);

  int64_t num_docs = 0;
  int32_t max_fid = 0;
  for (auto &c : chunks) {
    if (!c.error.empty()) {
      res->error = strdup(c.error.c_str());
      return res;
    }
    num_docs += static_cast<int64_t>(c.rows.size());
    if (c.max_fid > max_fid) max_fid = c.max_fid;
  }
  if (num_docs == 0 || max_fid == 0) {
    res->error = strdup("no documents found");
    return res;
  }

  res->num_docs = num_docs;
  res->num_features = max_fid;
  res->features = static_cast<float *>(
      calloc(static_cast<size_t>(num_docs) * static_cast<size_t>(max_fid),
             sizeof(float)));
  res->labels =
      static_cast<float *>(malloc(static_cast<size_t>(num_docs) * 4));
  res->qids =
      static_cast<int64_t *>(malloc(static_cast<size_t>(num_docs) * 8));
  if (!res->features || !res->labels || !res->qids) {
    // a NULL write from the densify threads would SIGSEGV the whole
    // interpreter; a catchable error lets data/svml.py fall back to the
    // (lower-peak-memory) numpy parser
    res->error = strdup("out of memory (dense matrix)");
    return res;
  }

  // densify in parallel: each chunk owns a contiguous row range
  std::vector<int64_t> row_offsets(chunks.size() + 1, 0);
  for (size_t c = 0; c < chunks.size(); ++c)
    row_offsets[c + 1] =
        row_offsets[c] + static_cast<int64_t>(chunks[c].rows.size());

  {
    std::vector<std::thread> threads;
    for (size_t c = 0; c < chunks.size(); ++c) {
      threads.emplace_back([&, c]() {
        const Chunk &ch = chunks[c];
        int64_t base = row_offsets[c];
        for (size_t r = 0; r < ch.rows.size(); ++r) {
          const Row &row = ch.rows[r];
          int64_t gr = base + static_cast<int64_t>(r);
          res->labels[gr] = row.label;
          res->qids[gr] = row.qid;
          float *dst =
              res->features + gr * static_cast<int64_t>(max_fid);
          for (uint32_t k = row.begin; k < row.end; ++k) {
            int32_t fid = ch.pool[k].first;
            if (fid >= 1 && fid <= max_fid) dst[fid - 1] = ch.pool[k].second;
          }
        }
      });
    }
    for (auto &th : threads) th.join();
  }
  return res;
}

void svml_release(SvmlResult *res) {
  if (!res) return;
  free(res->features);
  free(res->labels);
  free(res->qids);
  free(res->error);
  free(res);
}

}  // extern "C"
