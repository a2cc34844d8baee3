"""stress_centrality_links vs an independent BFS path-counting brute.

The DuckDB oracle replays the engine's unrolled rounds; this test is
the method-independent check: plain per-source BFS with the standard
sigma recurrence, accumulating sigma(s,v)*sigma(v,t) over exact-split
pairs — no joins, no level tables.
"""

import hashlib
from collections import deque

import duckdb

from gipspark.queries import REGISTRY

SF = "/root/testdata/sf0.001"
K = 3


def md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def brute_stress(n_nodes):
    adj = {}
    for src in range(n_nodes):
        for j in range(3):
            dst = md5_long(f"e:{j}:{src}") % n_nodes
            if dst != src:
                adj.setdefault(src, set()).add(dst)
    adj = {k: sorted(v) for k, v in adj.items()}
    stress = dict.fromkeys(range(n_nodes), 0)
    for s in range(n_nodes):
        dist = {s: 0}
        sigma = {s: 1}
        q = deque([s])
        while q:
            u = q.popleft()
            if dist[u] == K:
                continue
            for w in adj.get(u, []):
                if w not in dist:
                    dist[w] = dist[u] + 1
                    sigma[w] = 0
                    q.append(w)
                if dist[w] == dist[u] + 1:
                    sigma[w] += sigma[u]
        for v, dv in dist.items():
            if v == s or dv == 0:
                continue
            for t, dt in dist.items():
                if t in (s, v):
                    continue
                if dist[t] == dv + (dtv := _bfs_dist(adj, v, t, K)) and dtv >= 1 and dv + dtv <= K:
                    stress[v] += sigma[v] * _sigma_from(adj, v, t, dtv)
    return stress


def _bfs_dist(adj, a, b, cap):
    if a == b:
        return 0
    dist = {a: 0}
    q = deque([a])
    while q:
        u = q.popleft()
        if dist[u] >= cap:
            continue
        for w in adj.get(u, []):
            if w not in dist:
                dist[w] = dist[u] + 1
                if w == b:
                    return dist[w]
                q.append(w)
    return 10**9


def _sigma_from(adj, a, b, d):
    dist = {a: 0}
    sigma = {a: 1}
    q = deque([a])
    while q:
        u = q.popleft()
        if dist[u] >= d:
            continue
        for w in adj.get(u, []):
            if w not in dist:
                dist[w] = dist[u] + 1
                sigma[w] = 0
                q.append(w)
            if dist[w] == dist[u] + 1:
                sigma[w] += sigma[u]
    return sigma.get(b, 0)


def test_stress_matches_independent_bfs(spark):
    n = duckdb.sql(f"SELECT count(*) FROM '{SF}/documents.parquet'").fetchone()[0]
    got = {
        r.doc_id: r.stress
        for r in REGISTRY["stress_centrality_links"][0](spark, SF).collect()
    }
    want = brute_stress(n)
    assert got == want
