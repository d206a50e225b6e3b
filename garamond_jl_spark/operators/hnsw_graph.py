"""Partition-local HNSW graphs — the algorithmic core behind
``operators.ann.HNSWCandidateIndex``.

Reference counterpart: /root/reference/src/index/hnsw.jl:14-45 wraps a
``HierarchicalNSW`` graph ("Million-scale indexing using hnsw",
docs/src/index.md) whose build and walk are inherently sequential
pointer-chasing — unusable as a single distributed structure.  The
Spark-native shape is SHARDED: the corpus is hash-split into shards,
each shard owns an independent in-memory graph built here, and a query
beam-searches every shard in parallel (one ``applyInPandas`` pass),
taking the union of per-shard results as the candidate set for the
searcher's exact rerank.  Adding machines adds shards — the same
scale story as the per-bucket index build.

This module is pure numpy + stdlib (no Spark imports) so the same
code runs on the driver (unit tests) and inside pandas UDF workers.
It implements the published algorithm — Y. A. Malkov, D. A. Yashunin,
"Efficient and robust approximate nearest neighbor search using
Hierarchical Navigable Small World graphs" (arXiv:1603.09320),
Algorithms 1, 2 and 5, with the SELECT-NEIGHBORS-HEURISTIC rule
(Alg. 4, with keepPrunedConnections) by default: a candidate joins
the neighbor set only if it is closer to the base point than to every
already-selected neighbor.  The paper (§4) motivates exactly our
regime — clustered data, where keep-the-M-closest links a node only
inside its own cluster and inter-cluster navigability dies;
``select="simple"`` keeps Alg. 3 for comparison (measured recall@10
at 1M docs / 1000 clusters / ef=50: simple 0.73, heuristic 1.00 at
the same candidate budget, for ~1.6× the one-off build cost with the
vectorized selection — BENCH.md r4 HNSW table).

Determinism: the per-node level draw (the only randomness in HNSW) is
the repo-wide md5 derandomization trick — ``u = md5(seed:HL:key)``
mapped to (0,1), ``level = floor(-ln(u)·mL)`` — and shard insertion
order is sorted by key, so an index is rebuildable anywhere with no
stored RNG state.  Distances are squared Euclidean internally
(monotone in L2, saves the sqrt in every comparison); ``search``
reports true L2.  Cosine/angular use is the caller normalizing rows
first (then L2 order == cosine order), the same public convention as
hnswlib's "cosine" space.
"""

from __future__ import annotations

import hashlib
import heapq
import math

import numpy as np


def level_for(key: int, m_l: float, seed: int = 0) -> int:
    """Deterministic HNSW level draw: md5-uniform u ∈ (0,1) →
    floor(-ln(u)·mL) (arXiv:1603.09320 Alg. 1 line 4)."""
    h = hashlib.md5(f"{seed}:HL:{key}".encode()).hexdigest()
    u = (int(h[:13], 16) + 0.5) / 16.0 ** 13
    return int(-math.log(u) * m_l)


class NumpyHNSW:
    """One shard's graph.  ``add`` builds incrementally (Alg. 1);
    ``search`` is the layered beam search (Alg. 5).  ``ef`` ≥ the shard
    size makes the level-0 beam exhaustive over the connected graph —
    the exact mode the parity rows pin at small scale."""

    def __init__(self, dim: int, M: int = 8, ef_construction: int = 100,
                 seed: int = 0, select: str = "heuristic"):
        if M < 2:
            raise ValueError("HNSW needs M >= 2")
        if select not in ("heuristic", "simple"):
            raise ValueError(f"unknown neighbor selection: {select!r}")
        self.dim = int(dim)
        self.M = int(M)
        self.M0 = 2 * int(M)          # level-0 degree cap (paper §4.1)
        self.efc = int(ef_construction)
        self.seed = int(seed)
        self.select = select
        self.m_l = 1.0 / math.log(M)
        self.keys: list[int] = []
        self.pos: dict[int, int] = {}
        self.levels: list[int] = []
        self.nbrs: list[list[list[int]]] = []   # idx -> level -> [idx]
        self._vecs = np.empty((0, self.dim), dtype=np.float64)
        self._n2 = np.empty((0,), dtype=np.float64)
        self._n = 0
        self.entry = -1
        self.max_level = -1

    # -- storage ----------------------------------------------------------
    def __len__(self) -> int:
        return self._n

    def _grow(self) -> None:
        if self._n < self._vecs.shape[0]:
            return
        cap = max(64, 2 * self._vecs.shape[0])
        v = np.empty((cap, self.dim), dtype=np.float64)
        v[:self._n] = self._vecs[:self._n]
        n2 = np.empty((cap,), dtype=np.float64)
        n2[:self._n] = self._n2[:self._n]
        self._vecs, self._n2 = v, n2

    def _dists(self, q: np.ndarray, qn2: float, idxs) -> np.ndarray:
        """Squared L2 from q to the given node indexes, one matvec."""
        X = self._vecs[idxs]
        return np.maximum(self._n2[idxs] + qn2 - 2.0 * (X @ q), 0.0)

    # -- Algorithm 2: beam search on one layer -----------------------------
    def _search_layer(self, q: np.ndarray, qn2: float, eps: list[int],
                      ef: int, level: int) -> list[tuple[float, int]]:
        eps = list(dict.fromkeys(eps))
        d0 = self._dists(q, qn2, np.asarray(eps, dtype=np.int64))
        visited = set(eps)
        cand = sorted(zip(d0.tolist(), eps))          # min-heap
        res = [(-d, i) for d, i in cand[:ef]]         # max-heap, ≤ ef
        heapq.heapify(res)
        while cand:
            d, c = heapq.heappop(cand)
            if d > -res[0][0] and len(res) >= ef:
                break
            nb = [n for n in self.nbrs[c][level] if n not in visited]
            if not nb:
                continue
            visited.update(nb)
            nd = self._dists(q, qn2, np.asarray(nb, dtype=np.int64))
            for dn, n in zip(nd.tolist(), nb):
                if len(res) < ef:
                    heapq.heappush(cand, (dn, n))
                    heapq.heappush(res, (-dn, n))
                elif dn < -res[0][0]:
                    heapq.heappush(cand, (dn, n))
                    heapq.heapreplace(res, (-dn, n))
        return [(-md, i) for md, i in res]

    # -- Algorithm 4: neighbor selection -------------------------------------
    def _select_neighbors(self, cand: list[tuple[float, int]],
                          m: int) -> list[int]:
        """``cand`` = [(dist-to-base, idx)].  Heuristic (Alg. 4, with
        keepPrunedConnections): walk candidates closest-first; e is
        kept only if it is closer to the base point than to every
        already-kept neighbor — this preserves edges ACROSS clusters
        (the closest-M rule links a node only into its own cluster and
        strands inter-cluster navigation).  Pruned candidates back-fill
        up to m.  ``select='simple'`` = Alg. 3, keep the m closest.

        The candidate↔candidate distances are computed as ONE C×C
        Gram matmul up front and the greedy walk is then scalar Python
        (kept ≤ m, so ≤ C·m float compares) — the per-candidate
        matvec + np.all version spent ~60% of the whole build in numpy
        call overhead at M=8/efc=100 (cProfile, 8k-node shard)."""
        cand = sorted(cand)
        if self.select == "simple" or len(cand) <= m:
            return [i for _, i in cand[:m]]
        idxs = np.asarray([i for _, i in cand], dtype=np.int64)
        X = self._vecs[idxs]
        n2 = self._n2[idxs]
        D = np.maximum(n2[:, None] + n2[None, :] - 2.0 * (X @ X.T),
                       0.0).tolist()
        kept: list[int] = []            # positions into cand
        pruned: list[int] = []
        for p, (d_eq, _e) in enumerate(cand):
            if len(kept) == m:
                break
            Dp = D[p]
            for kp in kept:
                if d_eq >= Dp[kp]:
                    pruned.append(p)
                    break
            else:
                kept.append(p)
        for p in pruned:
            if len(kept) >= m:
                break
            kept.append(p)
        return [cand[p][1] for p in kept]

    # -- Algorithm 1: insert ------------------------------------------------
    def add(self, key: int, vec: np.ndarray) -> None:
        key = int(key)
        if key in self.pos:
            raise ValueError(f"duplicate key {key}")
        vec = np.asarray(vec, dtype=np.float64)
        lvl = level_for(key, self.m_l, self.seed)
        idx = self._n
        self._grow()
        self._vecs[idx] = vec
        self._n2[idx] = float(vec @ vec)
        self._n += 1
        self.keys.append(key)
        self.pos[key] = idx
        self.levels.append(lvl)
        self.nbrs.append([[] for _ in range(lvl + 1)])
        if self.entry < 0:
            self.entry, self.max_level = idx, lvl
            return
        qn2 = self._n2[idx]
        eps = [self.entry]
        for lev in range(self.max_level, lvl, -1):
            w = self._search_layer(vec, qn2, eps, 1, lev)
            eps = [min(w)[1]]
        for lev in range(min(lvl, self.max_level), -1, -1):
            w = self._search_layer(vec, qn2, eps, self.efc, lev)
            w.sort()
            neigh = self._select_neighbors(w, self.M)
            self.nbrs[idx][lev] = list(neigh)
            mmax = self.M0 if lev == 0 else self.M
            for n in neigh:
                ln = self.nbrs[n][lev]
                ln.append(idx)
                if len(ln) > mmax:      # shrink via the same selection
                    nd = self._dists(self._vecs[n], self._n2[n],
                                     np.asarray(ln, dtype=np.int64))
                    self.nbrs[n][lev] = self._select_neighbors(
                        sorted(zip(nd.tolist(), ln)), mmax)
            eps = [i for _, i in w]
        if lvl > self.max_level:
            self.entry, self.max_level = idx, lvl

    # -- Algorithm 5: query --------------------------------------------------
    def search(self, qvec: np.ndarray, k: int,
               ef: int = 50) -> list[tuple[int, float]]:
        """Top-k as [(key, L2 distance)], ties broken by key — the
        deterministic external contract."""
        if self.entry < 0:
            return []
        q = np.asarray(qvec, dtype=np.float64)
        qn2 = float(q @ q)
        ep = self.entry
        for lev in range(self.max_level, 0, -1):
            w = self._search_layer(q, qn2, [ep], 1, lev)
            ep = min(w)[1]
        w = self._search_layer(q, qn2, [ep], max(ef, k), 0)
        out = sorted((d, self.keys[i]) for d, i in w)
        return [(key, math.sqrt(d)) for d, key in out[:k]]

    # -- (de)serialization to plain rows -------------------------------------
    def to_rows(self):
        """Yield (key, level, nbrs-as-external-keys, vector) per node —
        the columnar form the Spark graph table stores."""
        for idx in range(self._n):
            nb = [[self.keys[j] for j in lev] for lev in self.nbrs[idx]]
            yield (self.keys[idx], self.levels[idx], nb,
                   self._vecs[idx].tolist())

    @classmethod
    def from_rows(cls, rows, dim: int, M: int = 8,
                  ef_construction: int = 100, seed: int = 0,
                  symmetric: bool = False,
                  select: str = "heuristic") -> "NumpyHNSW":
        """Rebuild a searchable graph from ``to_rows`` output (no
        re-insertion; adjacency is taken as stored).  Entry point =
        highest level, ties to the smallest key — derived, not stored.
        ``select`` must match the BUILD's neighbor-selection mode when
        the caller intends to ``add`` to the loaded graph (search
        ignores it): a graph built with select='simple' reloaded at
        the default would silently switch new inserts to Alg. 4.

        ``symmetric=True`` unions each node's out-edges with its
        in-edges for SEARCH: insertion creates every link as a
        bidirectional pair and the degree-cap trim then drops single
        DIRECTIONS (Alg. 1's shrink step), which can strand a node
        with in-degree 0 — the known HNSW disconnection mode.  The
        undirected closure restores any edge either endpoint kept, so
        beam search can reach such nodes; the ef cap still bounds the
        work.  The Spark wrapper searches symmetric.

        This path runs inside the query UDF on EVERY batch (a worker
        deserializes its shard's rows), so it is fully vectorized:
        neighbor keys map to indexes via one ``searchsorted`` over the
        sorted key array and the undirected closure is an edge-array
        encode → ``np.unique`` → split, not per-node Python sets
        (0.80 s → ~0.1 s on a 31k-node shard)."""
        g = cls(dim, M, ef_construction, seed, select=select)
        rows = sorted(rows, key=lambda r: r[0])
        n = len(rows)
        if n == 0:
            return g
        keys_arr = np.asarray([int(r[0]) for r in rows], dtype=np.int64)
        g.keys = keys_arr.tolist()
        g.pos = {k: i for i, k in enumerate(g.keys)}
        g.levels = [int(r[1]) for r in rows]
        g._vecs = np.asarray([r[3] for r in rows],
                             dtype=np.float64).reshape(n, dim)
        # per-row BLAS dot, NOT einsum/gemm: ``add`` computes v @ v, and
        # a loaded graph must score bit-identically to the built one
        g._n2 = np.fromiter((float(v @ v) for v in g._vecs),
                            dtype=np.float64, count=n)
        g._n = n
        # flatten all adjacency lists; one searchsorted key->idx pass
        flat: list[int] = []
        counts: list[int] = []          # per (node, level) list length
        group_node: list[int] = []
        group_level: list[int] = []
        for i, (_key, _lvl, nb, _vec) in enumerate(rows):
            for lev, lst in enumerate(nb):
                flat.extend(lst)
                counts.append(len(lst))
                group_node.append(i)
                group_level.append(lev)
        flat_arr = np.asarray(flat, dtype=np.int64)
        idx_arr = np.searchsorted(keys_arr, flat_arr)
        if flat_arr.size:
            bad = keys_arr[idx_arr.clip(0, n - 1)] != flat_arr
            if bad.any():
                raise KeyError(
                    f"adjacency references key {int(flat_arr[bad][0])} "
                    "not in this shard")
        counts_arr = np.asarray(counts, dtype=np.int64)
        if symmetric:
            levels_arr = np.asarray(g.levels, dtype=np.int64)
            L1 = int(levels_arr.max()) + 1        # levels per node ≤ L1
            e_src = np.repeat(np.asarray(group_node, dtype=np.int64),
                              counts_arr)
            e_lev = np.repeat(np.asarray(group_level, dtype=np.int64),
                              counts_arr)
            e_dst = idx_arr
            rev = e_lev <= levels_arr[e_dst]      # reversed edge fits
            a_src = np.concatenate([e_src, e_dst[rev]])
            a_dst = np.concatenate([e_dst, e_src[rev]])
            a_lev = np.concatenate([e_lev, e_lev[rev]])
            code = (a_src * L1 + a_lev) * n + a_dst   # sort key (s, l, d)
            uniq = np.unique(code)
            dsts = (uniq % n).tolist()
            pref = uniq // n                      # src*L1 + lev
            # one vectorized boundary lookup for every (node, level)
            want = np.asarray([i * L1 + lev
                               for i in range(n)
                               for lev in range(int(levels_arr[i]) + 1)],
                              dtype=np.int64)
            lo = np.searchsorted(pref, want).tolist()
            hi = np.searchsorted(pref, want + 1).tolist()
            g.nbrs = []
            c = 0
            for i in range(n):
                node_levels = []
                for _ in range(int(levels_arr[i]) + 1):
                    node_levels.append(dsts[lo[c]:hi[c]])
                    c += 1
                g.nbrs.append(node_levels)
        else:
            idx_list = idx_arr.tolist()
            g.nbrs = []
            p = 0
            c = 0
            for _key, _lvl, nb, _vec in rows:
                node_levels = []
                for _ in range(len(nb)):
                    ln = counts[c]
                    c += 1
                    node_levels.append(idx_list[p:p + ln])
                    p += ln
                g.nbrs.append(node_levels)
        best = min(range(n), key=lambda i: (-g.levels[i], g.keys[i]))
        g.entry, g.max_level = best, g.levels[best]
        return g


def build_shard(keys, mat: np.ndarray, M: int = 8,
                ef_construction: int = 100, seed: int = 0,
                select: str = "heuristic") -> NumpyHNSW:
    """Build one shard's graph over (keys, row-matrix), inserting in
    sorted-key order (the determinism contract)."""
    mat = np.asarray(mat, dtype=np.float64)
    g = NumpyHNSW(mat.shape[1], M, ef_construction, seed, select)
    order = sorted(range(len(keys)), key=lambda i: int(keys[i]))
    for i in order:
        g.add(int(keys[i]), mat[i])
    return g
