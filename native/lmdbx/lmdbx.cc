// lmdbx: a from-scratch LMDB data-file engine (read + bulk write).
//
// Replaces the reference's C LMDB dependency (data/data.py:18,73-76,143-153)
// with a native component we own. It implements the LMDB *on-disk format*
// (B+tree of 4096-byte pages, dual meta pages, overflow pages for large
// values) so the released UNITER txt/img DBs (data.mdb files) are readable,
// and DBs we write are readable by stock liblmdb:
//   - read: mmap the file, pick the newer meta page, walk the B+tree with
//     binary search per page; zero-copy value pointers into the map.
//   - write: offline bulk-load of sorted key/value pairs, packing leaves
//     then building branch levels bottom-up; values larger than the inline
//     node budget go to overflow pages (F_BIGDATA).
//
// Only the features the data plane needs are implemented: a single unnamed
// DB, read-only transactions-free access (our DBs are immutable once
// written), no dupsort, no nested DBs, no locks (the reference also opens
// readonly with readahead, no writers at train time).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr uint32_t kMagic = 0xBEEFC0DE;
constexpr uint32_t kVersion = 1;
constexpr size_t kPageSize = 4096;
constexpr size_t kPageHdrSz = 16;
constexpr uint64_t kInvalidPg = ~0ull;

// page flags
constexpr uint16_t P_BRANCH = 0x01;
constexpr uint16_t P_LEAF = 0x02;
constexpr uint16_t P_OVERFLOW = 0x04;
constexpr uint16_t P_META = 0x08;

// node flags
constexpr uint16_t F_BIGDATA = 0x01;

// Max inline node size: (pagesize - header) / MDB_MINKEYS(4), even-aligned —
// matches liblmdb's me_nodemax so our files agree with stock readers.
constexpr size_t kNodeMax = ((kPageSize - kPageHdrSz) / 4) & ~1ull;

#pragma pack(push, 1)
struct PageHeader {
  uint64_t pgno;
  uint16_t pad;
  uint16_t flags;
  union {
    struct {
      uint16_t lower;  // end of ptr array
      uint16_t upper;  // start of node area
    } pb;
    uint32_t pages;  // overflow page count
  };
};
static_assert(sizeof(PageHeader) == 16, "page header must be 16 bytes");

struct Node {
  uint16_t lo;
  uint16_t hi;
  uint16_t flags;
  uint16_t ksize;
  // key bytes, then data
};

struct DbInfo {
  uint32_t pad;
  uint16_t flags;
  uint16_t depth;
  uint64_t branch_pages;
  uint64_t leaf_pages;
  uint64_t overflow_pages;
  uint64_t entries;
  uint64_t root;
};
static_assert(sizeof(DbInfo) == 48, "MDB_db must be 48 bytes");

struct Meta {
  uint32_t magic;
  uint32_t version;
  uint64_t address;
  uint64_t mapsize;
  DbInfo dbs[2];  // free DB, main DB
  uint64_t last_pg;
  uint64_t txnid;
};
#pragma pack(pop)

inline const PageHeader* page(const uint8_t* map, uint64_t pgno) {
  return reinterpret_cast<const PageHeader*>(map + pgno * kPageSize);
}

inline const uint16_t* ptrs(const PageHeader* p) {
  return reinterpret_cast<const uint16_t*>(
      reinterpret_cast<const uint8_t*>(p) + kPageHdrSz);
}

// mp_lower/mp_upper are offsets from the start of the page (PAGEBASE = 0 in
// standard non-WRITEMAP builds); numkeys = (lower - PAGEHDRSZ) / 2.
inline size_t num_keys(const PageHeader* p) {
  return (p->pb.lower - kPageHdrSz) >> 1;
}

inline const Node* node_at(const PageHeader* p, size_t i) {
  return reinterpret_cast<const Node*>(
      reinterpret_cast<const uint8_t*>(p) + ptrs(p)[i]);
}

inline const uint8_t* node_key(const Node* n) {
  return reinterpret_cast<const uint8_t*>(n) + 8;
}

inline uint64_t branch_pgno(const Node* n) {
  return uint64_t(n->lo) | (uint64_t(n->hi) << 16) |
         (uint64_t(n->flags) << 32);
}

inline size_t leaf_dsize(const Node* n) {
  return size_t(n->lo) | (size_t(n->hi) << 16);
}

int cmp_keys(const uint8_t* a, size_t alen, const uint8_t* b, size_t blen) {
  size_t n = alen < blen ? alen : blen;
  int c = memcmp(a, b, n);
  if (c) return c;
  return (alen < blen) ? -1 : (alen > blen ? 1 : 0);
}

struct Reader {
  int fd = -1;
  const uint8_t* map = nullptr;
  size_t size = 0;
  DbInfo main_db{};
};

}  // namespace

extern "C" {

void* lmdbx_open(const char* path) {
  std::string p(path);
  struct stat st;
  // accept a directory (containing data.mdb) or a file
  if (stat(p.c_str(), &st) != 0) return nullptr;
  if (S_ISDIR(st.st_mode)) {
    p += "/data.mdb";
    if (stat(p.c_str(), &st) != 0) return nullptr;
  }
  int fd = open(p.c_str(), O_RDONLY);
  if (fd < 0) return nullptr;
  void* map = mmap(nullptr, st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  if (map == MAP_FAILED) {
    close(fd);
    return nullptr;
  }
  madvise(map, st.st_size, MADV_RANDOM);
  auto* r = new Reader;
  r->fd = fd;
  r->map = static_cast<const uint8_t*>(map);
  r->size = st.st_size;
  // choose the meta page with the larger txnid
  const Meta* m0 = reinterpret_cast<const Meta*>(r->map + kPageHdrSz);
  const Meta* m1 =
      reinterpret_cast<const Meta*>(r->map + kPageSize + kPageHdrSz);
  const Meta* m = nullptr;
  if (m0->magic == kMagic && m1->magic == kMagic)
    m = (m0->txnid >= m1->txnid) ? m0 : m1;
  else if (m0->magic == kMagic)
    m = m0;
  else if (m1->magic == kMagic)
    m = m1;
  if (!m || m->version != kVersion) {
    munmap(const_cast<uint8_t*>(r->map), r->size);
    close(fd);
    delete r;
    return nullptr;
  }
  r->main_db = m->dbs[1];
  return r;
}

void lmdbx_close(void* handle) {
  auto* r = static_cast<Reader*>(handle);
  if (!r) return;
  munmap(const_cast<uint8_t*>(r->map), r->size);
  close(r->fd);
  delete r;
}

uint64_t lmdbx_entries(void* handle) {
  return static_cast<Reader*>(handle)->main_db.entries;
}

// Returns 0 on hit; *val/*val_len point into the mmap (valid until close).
int lmdbx_get(void* handle, const uint8_t* key, size_t key_len,
              const uint8_t** val, size_t* val_len) {
  auto* r = static_cast<Reader*>(handle);
  uint64_t pgno = r->main_db.root;
  if (pgno == kInvalidPg) return -1;
  const PageHeader* p = page(r->map, pgno);
  while (p->flags & P_BRANCH) {
    size_t n = num_keys(p);
    // first branch key is empty; find rightmost node with key <= target
    size_t lo = 1, hi = n, best = 0;
    while (lo < hi) {
      size_t mid = (lo + hi) / 2;
      const Node* nd = node_at(p, mid);
      int c = cmp_keys(key, key_len, node_key(nd), nd->ksize);
      if (c < 0)
        hi = mid;
      else {
        best = mid;
        lo = mid + 1;
      }
    }
    p = page(r->map, branch_pgno(node_at(p, best)));
  }
  if (!(p->flags & P_LEAF)) return -2;
  size_t n = num_keys(p);
  size_t lo = 0, hi = n;
  while (lo < hi) {
    size_t mid = (lo + hi) / 2;
    const Node* nd = node_at(p, mid);
    int c = cmp_keys(key, key_len, node_key(nd), nd->ksize);
    if (c == 0) {
      size_t dsize = leaf_dsize(nd);
      const uint8_t* data = node_key(nd) + nd->ksize;
      if (nd->flags & F_BIGDATA) {
        uint64_t ovpg;
        memcpy(&ovpg, data, sizeof(ovpg));
        *val = reinterpret_cast<const uint8_t*>(page(r->map, ovpg)) +
               kPageHdrSz;
      } else {
        *val = data;
      }
      *val_len = dsize;
      return 0;
    }
    if (c < 0)
      hi = mid;
    else
      lo = mid + 1;
  }
  return -1;
}

// ---- cursor over all keys (in order) ----

struct Cursor {
  Reader* r;
  std::vector<std::pair<uint64_t, size_t>> stack;  // (pgno, index)
};

void* lmdbx_cursor_open(void* handle) {
  auto* r = static_cast<Reader*>(handle);
  auto* c = new Cursor{r, {}};
  uint64_t pgno = r->main_db.root;
  if (pgno == kInvalidPg) return c;
  const PageHeader* p = page(r->map, pgno);
  c->stack.push_back({pgno, 0});
  while (p->flags & P_BRANCH) {
    pgno = branch_pgno(node_at(p, 0));
    p = page(r->map, pgno);
    c->stack.push_back({pgno, 0});
  }
  return c;
}

// 1 = produced a key; 0 = done
int lmdbx_cursor_next(void* cursor, const uint8_t** key, size_t* key_len) {
  auto* c = static_cast<Cursor*>(cursor);
  while (!c->stack.empty()) {
    auto& [pgno, idx] = c->stack.back();
    const PageHeader* p = page(c->r->map, pgno);
    if (idx >= num_keys(p)) {
      c->stack.pop_back();
      if (!c->stack.empty()) c->stack.back().second++;
      continue;
    }
    if (p->flags & P_LEAF) {
      const Node* nd = node_at(p, idx);
      *key = node_key(nd);
      *key_len = nd->ksize;
      idx++;  // advance within leaf
      c->stack.back().second = idx;
      return 1;
    }
    // branch: descend
    uint64_t child = branch_pgno(node_at(p, idx));
    c->stack.push_back({child, 0});
  }
  return 0;
}

void lmdbx_cursor_close(void* cursor) {
  delete static_cast<Cursor*>(cursor);
}

// ---- bulk writer ----

namespace {

struct WPage {
  std::vector<uint8_t> bytes;
  WPage() : bytes(kPageSize, 0) {}
  PageHeader* hdr() { return reinterpret_cast<PageHeader*>(bytes.data()); }
};

// STREAMING builder: leaf + overflow pages are written to disk as keys
// arrive (bounded memory — a full-split image DB is tens of GB); only the
// per-leaf first keys stay resident for the branch build at finish. Pages
// land at offset pgno*kPageSize in strictly increasing pgno order; the two
// meta pages are back-patched at the end.
class Builder {
 public:
  explicit Builder(const char* path) : f_(fopen(path, "wb")) {
    if (!f_) {
      error_ = true;
      return;
    }
    // reserve pages 0,1 for the metas (back-patched in finish)
    if (fseek(f_, long(2 * kPageSize), SEEK_SET) != 0) error_ = true;
  }

  ~Builder() {
    if (f_) fclose(f_);
  }

  // entries must arrive in strictly increasing key order (B+tree bulk
  // build). Returns 0, or -1 for out-of-order keys, keys over LMDB's
  // 511-byte maxkeysize, or an earlier I/O error.
  int add(const uint8_t* key, size_t klen, const uint8_t* val, size_t vlen) {
    if (error_ || klen > 511) {
      error_ = true;
      return -1;
    }
    std::vector<uint8_t> k(key, key + klen);
    if (entries_ && !(last_key_ < k)) {
      error_ = true;  // unsorted input would build an unsearchable tree
      return -1;
    }
    size_t inline_sz = 8 + klen + vlen;
    bool big = inline_sz > kNodeMax;
    size_t node_sz = big ? (8 + klen + 8) : inline_sz;
    node_sz = (node_sz + 1) & ~1ull;  // even alignment
    if (leaf_used_ + 2 + node_sz > kPageSize - kPageHdrSz) flush_leaf();
    LeafEntry e;
    e.key = k;
    if (big) {
      e.big = true;
      e.ov_pgno_slot = ov_values_.size();
      ov_values_.emplace_back(val, val + vlen);
      e.dsize = vlen;
    } else {
      e.big = false;
      e.data.assign(val, val + vlen);
      e.dsize = vlen;
    }
    leaf_used_ += 2 + node_sz;
    cur_leaf_.push_back(std::move(e));
    last_key_ = std::move(k);
    entries_++;
    return error_ ? -1 : 0;
  }

  int finish() {
    if (error_ || !f_) return -1;
    flush_leaf();
    // branch levels over the streamed-out leaves' first keys
    struct Ref {
      std::vector<uint8_t> first_key;
      uint64_t pgno;
    };
    std::vector<Ref> level;
    level.reserve(leaf_refs_.size());
    for (auto& [k, pg] : leaf_refs_) level.push_back({k, pg});
    uint16_t depth = 1;
    uint64_t root = level.empty() ? kInvalidPg : level[0].pgno;
    uint64_t n_branch = 0;
    while (level.size() > 1) {
      depth++;
      std::vector<Ref> next_level;
      size_t i = 0;
      while (i < level.size()) {
        WPage wp;
        auto* h = wp.hdr();
        h->flags = P_BRANCH;
        size_t used = 0;
        std::vector<size_t> members;
        while (i < level.size()) {
          size_t klen = members.empty() ? 0 : level[i].first_key.size();
          size_t nsz = (8 + klen + 1) & ~1ull;
          if (used + 2 + nsz > kPageSize - kPageHdrSz) break;
          members.push_back(i);
          used += 2 + nsz;
          i++;
        }
        uint16_t* pp = reinterpret_cast<uint16_t*>(wp.bytes.data() +
                                                   kPageHdrSz);
        size_t upper = kPageSize;
        for (size_t m = 0; m < members.size(); m++) {
          const Ref& ref = level[members[m]];
          size_t klen = (m == 0) ? 0 : ref.first_key.size();
          size_t nsz = (8 + klen + 1) & ~1ull;
          upper -= nsz;
          pp[m] = uint16_t(upper);
          Node* nd = reinterpret_cast<Node*>(wp.bytes.data() + upper);
          nd->lo = uint16_t(ref.pgno & 0xFFFF);
          nd->hi = uint16_t((ref.pgno >> 16) & 0xFFFF);
          nd->flags = uint16_t((ref.pgno >> 32) & 0xFFFF);
          nd->ksize = uint16_t(klen);
          if (klen)
            memcpy(wp.bytes.data() + upper + 8, ref.first_key.data(), klen);
        }
        h->pb.lower = uint16_t(kPageHdrSz + 2 * members.size());
        h->pb.upper = uint16_t(upper);
        h->pgno = next_pg_;
        next_level.push_back({level[members[0]].first_key, next_pg_});
        next_pg_++;
        n_branch++;
        wr(wp.bytes.data(), kPageSize);
      }
      level = std::move(next_level);
      root = level[0].pgno;
    }
    if (leaf_refs_.size() == 1) root = leaf_refs_[0].second;

    uint64_t last_pg = next_pg_ - 1;
    // back-patch the metas
    if (fseek(f_, 0, SEEK_SET) != 0) error_ = true;
    for (int mi = 0; mi < 2; mi++) {
      WPage wp;
      auto* h = wp.hdr();
      h->pgno = mi;
      h->flags = P_META;
      Meta* m = reinterpret_cast<Meta*>(wp.bytes.data() + kPageHdrSz);
      m->magic = kMagic;
      m->version = kVersion;
      m->mapsize = (last_pg + 1) * kPageSize;
      m->dbs[0].root = kInvalidPg;  // free DB empty
      m->dbs[0].flags = 0x08;      // MDB_INTEGERKEY (as liblmdb does)
      m->dbs[1].flags = 0;
      m->dbs[1].depth = leaf_refs_.empty() ? 0 : depth;
      m->dbs[1].branch_pages = n_branch;
      m->dbs[1].leaf_pages = leaf_refs_.size();
      m->dbs[1].overflow_pages = n_ov_pages_;
      m->dbs[1].entries = entries_;
      m->dbs[1].root = root;
      m->last_pg = last_pg;
      m->txnid = 1;
      wr(wp.bytes.data(), kPageSize);
    }
    FILE* f = f_;
    f_ = nullptr;
    bool ok = !error_;
    if (fclose(f) != 0) ok = false;
    return ok ? 0 : -1;
  }

 private:
  struct LeafEntry {
    std::vector<uint8_t> key;
    std::vector<uint8_t> data;
    bool big = false;
    size_t ov_pgno_slot = 0;
    size_t dsize = 0;
  };

  // checked writes: a short fwrite (disk full, I/O error) must fail the
  // build, not silently leave a truncated data.mdb behind
  void wr(const void* p, size_t n) {
    if (!error_ && fwrite(p, 1, n, f_) != n) error_ = true;
  }

  void flush_leaf() {
    if (cur_leaf_.empty() || error_) {
      cur_leaf_.clear();
      leaf_used_ = 0;
      ov_values_.clear();
      return;
    }
    // pgnos: this leaf, then its overflow chains, in file order
    uint64_t leaf_pg = next_pg_++;
    std::vector<uint64_t> ov_pgnos(ov_values_.size());
    std::vector<uint32_t> ov_npages(ov_values_.size());
    for (size_t i = 0; i < ov_values_.size(); i++) {
      size_t npg =
          (ov_values_[i].size() + kPageHdrSz + kPageSize - 1) / kPageSize;
      ov_pgnos[i] = next_pg_;
      ov_npages[i] = npg;
      next_pg_ += npg;
      n_ov_pages_ += npg;
    }
    WPage wp;
    auto* h = wp.hdr();
    h->pgno = leaf_pg;
    h->flags = P_LEAF;
    uint16_t* pp = reinterpret_cast<uint16_t*>(wp.bytes.data() + kPageHdrSz);
    size_t upper = kPageSize;
    for (size_t m = 0; m < cur_leaf_.size(); m++) {
      auto& e = cur_leaf_[m];
      size_t payload = e.big ? 8 : e.data.size();
      size_t nsz = (8 + e.key.size() + payload + 1) & ~1ull;
      upper -= nsz;
      pp[m] = uint16_t(upper);
      Node* nd = reinterpret_cast<Node*>(wp.bytes.data() + upper);
      nd->lo = uint16_t(e.dsize & 0xFFFF);
      nd->hi = uint16_t((e.dsize >> 16) & 0xFFFF);
      nd->flags = e.big ? F_BIGDATA : 0;
      nd->ksize = uint16_t(e.key.size());
      memcpy(wp.bytes.data() + upper + 8, e.key.data(), e.key.size());
      if (e.big) {
        uint64_t ov = ov_pgnos[e.ov_pgno_slot];
        memcpy(wp.bytes.data() + upper + 8 + e.key.size(), &ov, 8);
      } else {
        memcpy(wp.bytes.data() + upper + 8 + e.key.size(), e.data.data(),
               e.data.size());
      }
    }
    h->pb.lower = uint16_t(kPageHdrSz + 2 * cur_leaf_.size());
    h->pb.upper = uint16_t(upper);
    wr(wp.bytes.data(), kPageSize);
    // overflow chains follow their leaf immediately
    for (size_t i = 0; i < ov_values_.size(); i++) {
      const auto& v = ov_values_[i];
      std::vector<uint8_t> buf(ov_npages[i] * kPageSize, 0);
      PageHeader* oh = reinterpret_cast<PageHeader*>(buf.data());
      oh->pgno = ov_pgnos[i];
      oh->flags = P_OVERFLOW;
      oh->pages = ov_npages[i];
      memcpy(buf.data() + kPageHdrSz, v.data(), v.size());
      wr(buf.data(), buf.size());
    }
    leaf_refs_.emplace_back(cur_leaf_[0].key, leaf_pg);
    cur_leaf_.clear();
    ov_values_.clear();
    leaf_used_ = 0;
  }

  FILE* f_ = nullptr;
  bool error_ = false;
  std::vector<LeafEntry> cur_leaf_;
  size_t leaf_used_ = 0;
  std::vector<std::vector<uint8_t>> ov_values_;  // current leaf's only
  std::vector<std::pair<std::vector<uint8_t>, uint64_t>> leaf_refs_;
  std::vector<uint8_t> last_key_;
  uint64_t next_pg_ = 2;
  uint64_t n_ov_pages_ = 0;
  uint64_t entries_ = 0;
};

}  // namespace

void* lmdbx_builder_new(const char* path) {
  auto* b = new Builder(path);
  return b;
}

int lmdbx_builder_add(void* b, const uint8_t* key, size_t klen,
                      const uint8_t* val, size_t vlen) {
  return static_cast<Builder*>(b)->add(key, klen, val, vlen);
}

int lmdbx_builder_finish(void* b) {
  auto* builder = static_cast<Builder*>(b);
  int rc = builder->finish();
  delete builder;
  return rc;
}

void lmdbx_builder_abort(void* b) { delete static_cast<Builder*>(b); }

}  // extern "C"
