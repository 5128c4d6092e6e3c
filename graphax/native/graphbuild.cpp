// graphax native graph builder — host-side topology kernels.
//
// The reference's topology work lives in torch_scatter/torch_sparse C++/CUDA
// extensions and PyG utilities (SURVEY §2.7/§2.9). graphax keeps topology on
// the host by design (device programs are static-shape); this library is the
// fast path for the NumPy builders in graphax.sparse.build — the operations
// that dominate preprocessing and epoch-boundary rewiring on large graphs:
//
//   gx_coalesce       sort edges by (row, col) and sum duplicate weights
//   gx_to_undirected  union with the reversed edge set, dedup
//   gx_add_self_loops add fill to the diagonal (merging with existing loops)
//   gx_lcc            largest weakly-connected component via union-find
//   gx_row_tiles      row-tiled block tables for the MXU segment kernels
//   gx_partition_owner owner-computes shard assignment + halo request counts
//
// Exposed with a plain C ABI for ctypes (no pybind11 in this environment).
// All index arrays are int64 in/out; caller owns all buffers.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <functional>
#include <numeric>
#include <vector>

extern "C" {

// Sort (row, col, w) by (row, col), summing duplicates.
// Returns the new edge count; outputs written to out_* (capacity >= e).
int64_t gx_coalesce(const int64_t* row, const int64_t* col, const double* w,
                    int64_t e, int64_t /*num_nodes*/, int64_t* out_row,
                    int64_t* out_col, double* out_w) {
  std::vector<int64_t> idx(e);
  std::iota(idx.begin(), idx.end(), 0);
  std::sort(idx.begin(), idx.end(), [&](int64_t a, int64_t b) {
    if (row[a] != row[b]) return row[a] < row[b];
    return col[a] < col[b];
  });
  int64_t n_out = 0;
  for (int64_t i = 0; i < e; ++i) {
    int64_t j = idx[i];
    if (n_out > 0 && out_row[n_out - 1] == row[j] &&
        out_col[n_out - 1] == col[j]) {
      out_w[n_out - 1] += w ? w[j] : 1.0;
    } else {
      out_row[n_out] = row[j];
      out_col[n_out] = col[j];
      out_w[n_out] = w ? w[j] : 1.0;
      ++n_out;
    }
  }
  return n_out;
}

// Union of edges with their reverses, deduplicated, sorted by (row, col).
// out_* capacity must be >= 2 * e.
int64_t gx_to_undirected(const int64_t* row, const int64_t* col, int64_t e,
                         int64_t num_nodes, int64_t* out_row,
                         int64_t* out_col) {
  std::vector<int64_t> r(2 * e), c(2 * e);
  std::memcpy(r.data(), row, e * sizeof(int64_t));
  std::memcpy(c.data(), col, e * sizeof(int64_t));
  std::memcpy(r.data() + e, col, e * sizeof(int64_t));
  std::memcpy(c.data() + e, row, e * sizeof(int64_t));
  std::vector<double> w(2 * e, 1.0);
  std::vector<double> ow(2 * e);
  int64_t n = gx_coalesce(r.data(), c.data(), w.data(), 2 * e, num_nodes,
                          out_row, out_col, ow.data());
  return n;  // weights dropped, as in the reference to_undirected
}

// Add `fill` to every diagonal entry (merging with existing self-loops).
// Inputs must already be coalesced; out_* capacity >= e + num_nodes.
int64_t gx_add_self_loops(const int64_t* row, const int64_t* col,
                          const double* w, int64_t e, int64_t num_nodes,
                          double fill, int64_t* out_row, int64_t* out_col,
                          double* out_w) {
  std::vector<int64_t> r(e + num_nodes), c(e + num_nodes);
  std::vector<double> ww(e + num_nodes);
  std::memcpy(r.data(), row, e * sizeof(int64_t));
  std::memcpy(c.data(), col, e * sizeof(int64_t));
  if (w)
    std::memcpy(ww.data(), w, e * sizeof(double));
  else
    std::fill(ww.begin(), ww.begin() + e, 1.0);
  for (int64_t i = 0; i < num_nodes; ++i) {
    r[e + i] = i;
    c[e + i] = i;
    ww[e + i] = fill;
  }
  return gx_coalesce(r.data(), c.data(), ww.data(), e + num_nodes, num_nodes,
                     out_row, out_col, out_w);
}

// Largest weakly-connected component via union-find.
// labels[i] = 1 if node i is in the LCC else 0. Returns LCC size.
int64_t gx_lcc(const int64_t* row, const int64_t* col, int64_t e,
               int64_t num_nodes, uint8_t* labels) {
  std::vector<int64_t> parent(num_nodes), size(num_nodes, 1);
  std::iota(parent.begin(), parent.end(), 0);
  std::function<int64_t(int64_t)> find = [&](int64_t x) {
    while (parent[x] != x) {
      parent[x] = parent[parent[x]];
      x = parent[x];
    }
    return x;
  };
  for (int64_t i = 0; i < e; ++i) {
    int64_t a = find(row[i]), b = find(col[i]);
    if (a == b) continue;
    if (size[a] < size[b]) std::swap(a, b);
    parent[b] = a;
    size[a] += size[b];
  }
  int64_t best = 0, best_size = 0;
  for (int64_t i = 0; i < num_nodes; ++i) {
    int64_t r = find(i);
    if (size[r] > best_size) {
      best_size = size[r];
      best = r;
    }
  }
  for (int64_t i = 0; i < num_nodes; ++i)
    labels[i] = (find(i) == best) ? 1 : 0;
  return best_size;
}

// Row-tiled block tables (graphax.kernels.tiles layout).
// Inputs: edges sorted by row. Outputs sized by a prior call with
// out_* == nullptr which returns the number of blocks needed.
// edge_slot/col_out/local_row: [num_blocks * block_edges];
// tile_idx: [num_blocks]. Padded slots: local_row == tile, slot -1.
int64_t gx_row_tiles(const int64_t* row, const int64_t* col, int64_t e,
                     int64_t num_nodes, int64_t tile, int64_t block_edges,
                     int64_t* edge_slot, int64_t* col_out,
                     int64_t* local_row, int64_t* tile_idx) {
  int64_t t = (num_nodes + tile - 1) / tile;
  // count per tile
  std::vector<int64_t> counts(t, 0);
  for (int64_t i = 0; i < e; ++i) counts[row[i] / tile]++;
  int64_t n_blocks = 0;
  for (int64_t ti = 0; ti < t; ++ti)
    n_blocks += (counts[ti] + block_edges - 1) / block_edges;
  if (n_blocks == 0) n_blocks = 1;
  if (!edge_slot) return n_blocks;  // size query

  int64_t b = 0, pos = 0;
  for (int64_t ti = 0; ti < t; ++ti) {
    int64_t d = counts[ti], off = 0;
    while (off < d) {
      int64_t take = std::min(block_edges, d - off);
      tile_idx[b] = ti;
      for (int64_t k = 0; k < block_edges; ++k) {
        int64_t slot = b * block_edges + k;
        if (k < take) {
          int64_t eidx = pos + off + k;
          edge_slot[slot] = eidx;
          col_out[slot] = col[eidx];
          local_row[slot] = row[eidx] - ti * tile;
        } else {
          edge_slot[slot] = -1;
          col_out[slot] = 0;
          local_row[slot] = tile;
        }
      }
      off += take;
      ++b;
    }
    pos += d;
  }
  // cover the n_blocks==1 empty-graph case
  if (b == 0) {
    tile_idx[0] = 0;
    for (int64_t k = 0; k < block_edges; ++k) {
      edge_slot[k] = -1;
      col_out[k] = 0;
      local_row[k] = tile;
    }
  }
  return n_blocks;
}

// Owner-computes partition census: shard of each edge (= row / block_size)
// and, per (owner shard s, peer t), the number of distinct remote cols shard
// s requests from t. Returns max edges per shard.
int64_t gx_partition_census(const int64_t* row, const int64_t* col, int64_t e,
                            int64_t num_shards, int64_t block_size,
                            int64_t* edge_shard /*[e]*/,
                            int64_t* halo_counts /*[num_shards*num_shards]*/) {
  std::vector<int64_t> per_shard(num_shards, 0);
  std::vector<std::vector<int64_t>> remote(num_shards);
  for (int64_t i = 0; i < e; ++i) {
    int64_t s = row[i] / block_size;
    edge_shard[i] = s;
    per_shard[s]++;
    int64_t cs = col[i] / block_size;
    if (cs != s) remote[s].push_back(col[i]);
  }
  std::memset(halo_counts, 0,
              num_shards * num_shards * sizeof(int64_t));
  for (int64_t s = 0; s < num_shards; ++s) {
    auto& v = remote[s];
    std::sort(v.begin(), v.end());
    v.erase(std::unique(v.begin(), v.end()), v.end());
    for (int64_t g : v) halo_counts[s * num_shards + g / block_size]++;
  }
  return *std::max_element(per_shard.begin(), per_shard.end());
}

// Balanced greedy region-growing partitioner (GGGP-style "graph growing").
// Grows part 0..p-1 sequentially: each step admits the unassigned node with
// the most neighbors already inside the growing part (lazy max-heap with
// (gain desc, node id asc) order — deterministic), capping each part at
// `cap` nodes; disconnected remainders seed from the lowest unassigned id.
// With p*cap >= n every node gets a label. Returns the directed edge cut.
// Beats plain BFS when cross-community edges are dense: FIFO expansion
// leaks across communities, max-gain expansion stays inside them.
int64_t gx_partition_grow(const int64_t* row, const int64_t* col, int64_t e,
                          int64_t n, int64_t p, int64_t cap,
                          int64_t* out_label) {
  std::vector<int64_t> deg(n, 0);
  for (int64_t i = 0; i < e; ++i) {
    deg[row[i]]++;
    deg[col[i]]++;
  }
  std::vector<int64_t> ptr(n + 1, 0);
  for (int64_t v = 0; v < n; ++v) ptr[v + 1] = ptr[v] + deg[v];
  std::vector<int64_t> adj(2 * e);
  std::vector<int64_t> cur(ptr.begin(), ptr.end() - 1);
  for (int64_t i = 0; i < e; ++i) {
    adj[cur[row[i]]++] = col[i];
    adj[cur[col[i]]++] = row[i];
  }
  std::fill(out_label, out_label + n, int64_t(-1));
  std::vector<int64_t> gain(n, 0);
  // lazy max-heap of (gain, node): top = highest gain, ties -> lowest id
  typedef std::pair<int64_t, int64_t> Entry;  // (gain, node)
  auto cmp = [](const Entry& a, const Entry& b) {
    if (a.first != b.first) return a.first < b.first;
    return a.second > b.second;
  };
  int64_t next_scan = 0;
  for (int64_t s = 0; s < p; ++s) {
    std::fill(gain.begin(), gain.end(), int64_t(0));
    std::vector<Entry> heap;
    auto admit = [&](int64_t v) {
      out_label[v] = s;
      for (int64_t k = ptr[v]; k < ptr[v + 1]; ++k) {
        int64_t u = adj[k];
        if (out_label[u] == -1) {
          gain[u]++;
          heap.push_back(Entry(gain[u], u));
          std::push_heap(heap.begin(), heap.end(), cmp);
        }
      }
    };
    int64_t count = 0;
    while (count < cap) {
      int64_t pick = -1;
      while (!heap.empty()) {
        Entry top = heap.front();
        std::pop_heap(heap.begin(), heap.end(), cmp);
        heap.pop_back();
        if (out_label[top.second] == -1 && gain[top.second] == top.first) {
          pick = top.second;
          break;
        }
      }
      if (pick == -1) {
        while (next_scan < n && out_label[next_scan] != -1) ++next_scan;
        if (next_scan == n) break;
        pick = next_scan;
      }
      admit(pick);
      ++count;
    }
  }
  int64_t cut = 0;
  for (int64_t i = 0; i < e; ++i)
    if (out_label[row[i]] != out_label[col[i]]) ++cut;
  return cut;
}

}  // extern "C"
