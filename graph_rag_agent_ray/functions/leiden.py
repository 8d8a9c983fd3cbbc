"""Seeded Leiden community detection (Traag, Waltman & van Eck 2019).

Replaces the round-1 networkx-Louvain stand-in for GDS Leiden
(/root/reference/community/detector/leiden.py:10-89, with
``includeIntermediateCommunities`` — our per-level memberships are the same
hierarchy contract). Pure-python/numpy because ``leidenalg``/``igraph`` are
not in this environment; the graph it runs on is the *aggregated* entity
graph (entities ≪ corpus), driver-local behind build_kg's size guard or
per-component inside the distributed fallback.

Objectives:
- ``cpm`` (default): constant Potts model, H = Σ_c [E_c − γ·n_c(n_c−1)/2].
  CPM has no resolution limit (Traag, Van Dooren & Nesterov 2011), so
  planted modular structure is recovered at any graph size — the property
  the synthetic corpus's planted-partition oracle depends on.
- ``modularity``: γ-scaled modularity gain, for reference parity (GDS
  Leiden's default objective).

Determinism: seeded visit orders (numpy Generator), best-gain moves with
(−gain, community-id) tie-break, no dependence on dict iteration order.
The Leiden phases are implemented faithfully: queue-based fast local move →
refinement (singleton re-merge constrained to the local-move communities) →
aggregation on the refined partition with the local-move partition as the
initial assignment of the aggregated graph.
"""

from __future__ import annotations

from collections import deque
from typing import Dict, List, Tuple

import numpy as np


class _Graph:
    """Small undirected weighted graph: adjacency dicts + node sizes."""

    def __init__(self, n: int):
        self.n = n
        self.adj: List[Dict[int, float]] = [dict() for _ in range(n)]
        self.self_w = np.zeros(n)          # internal (self-loop) weight
        self.sizes = np.ones(n)            # CPM node sizes (original-node counts)
        self.strength = np.zeros(n)        # weighted degree incl. 2*self_w

    def add_edge(self, u: int, v: int, w: float) -> None:
        if u == v:
            self.self_w[u] += w
            self.strength[u] += 2 * w
            return
        self.adj[u][v] = self.adj[u].get(v, 0.0) + w
        self.adj[v][u] = self.adj[v].get(u, 0.0) + w
        self.strength[u] += w
        self.strength[v] += w


def _gain_fn(objective: str, gamma: float, total_w: float):
    """Returns gain(k_to_new, size_new, K_new, k_to_old, size_old_rest,
    K_old_rest, size_v, K_v): ΔH of moving v between communities."""
    if objective == "cpm":
        def gain(k_new, s_new, _K_new, k_old, s_old, _K_old, s_v, _K_v):
            return (k_new - gamma * s_v * s_new) - (k_old - gamma * s_v * s_old)
    else:  # modularity (γ-scaled), m = total edge weight
        m2 = max(2.0 * total_w, 1e-12)

        def gain(k_new, _s_new, K_new, k_old, _s_old, K_old, _s_v, K_v):
            return ((k_new - gamma * K_v * K_new / m2)
                    - (k_old - gamma * K_v * K_old / m2))
    return gain


def _local_move(g: _Graph, comm: np.ndarray, gain, rng: np.random.Generator
                ) -> bool:
    """Queue-based fast local move (Leiden alg. A2). Mutates ``comm``;
    returns True if any node moved."""
    n = g.n
    comm_size = np.zeros(n)
    comm_K = np.zeros(n)
    for v in range(n):
        comm_size[comm[v]] += g.sizes[v]
        comm_K[comm[v]] += g.strength[v]
    order = rng.permutation(n)
    queue = deque(int(v) for v in order)
    in_q = np.ones(n, dtype=bool)
    moved_any = False
    while queue:
        v = queue.popleft()
        in_q[v] = False
        c_old = int(comm[v])
        # weights from v into each neighbouring community
        k_to: Dict[int, float] = {}
        for u, w in g.adj[v].items():
            cu = int(comm[u])
            k_to[cu] = k_to.get(cu, 0.0) + w
        s_v, K_v = g.sizes[v], g.strength[v]
        k_old = k_to.get(c_old, 0.0)
        s_old_rest = comm_size[c_old] - s_v
        K_old_rest = comm_K[c_old] - K_v
        best_c, best_g = c_old, 0.0
        # candidates: neighbour communities + an empty community (CPM can
        # prefer splitting off); empty candidate id = v's own slot if free
        candidates = sorted(k_to)
        if s_old_rest > 0 and comm_size[v] == 0:
            candidates.append(int(v))  # a guaranteed-empty community slot
        for c_new in candidates:
            if c_new == c_old:
                continue
            gn = gain(k_to.get(c_new, 0.0), comm_size[c_new], comm_K[c_new],
                      k_old, s_old_rest, K_old_rest, s_v, K_v)
            if gn > best_g + 1e-12 or (abs(gn - best_g) <= 1e-12
                                       and best_c != c_old and c_new < best_c):
                best_c, best_g = c_new, gn
        if best_c != c_old:
            comm[v] = best_c
            comm_size[c_old] -= s_v
            comm_K[c_old] -= K_v
            comm_size[best_c] += s_v
            comm_K[best_c] += K_v
            moved_any = True
            for u in g.adj[v]:
                if comm[u] != best_c and not in_q[u]:
                    queue.append(int(u))
                    in_q[u] = True
    return moved_any


def _refine(g: _Graph, comm: np.ndarray, gain, rng: np.random.Generator
            ) -> np.ndarray:
    """Refinement phase: start from singletons; each still-singleton node may
    merge into a refined community inside its OWN local-move community when
    the gain is positive (deterministic best-gain variant of alg. A3)."""
    n = g.n
    ref = np.arange(n)
    ref_size = g.sizes.copy()
    ref_K = g.strength.copy()
    for v in (int(x) for x in rng.permutation(n)):
        if ref_size[ref[v]] != g.sizes[v]:
            continue  # no longer a singleton
        c_v = comm[v]
        k_to: Dict[int, float] = {}
        for u, w in g.adj[v].items():
            if comm[u] == c_v:
                ru = int(ref[u])
                k_to[ru] = k_to.get(ru, 0.0) + w
        r_old = int(ref[v])
        best_r, best_g = r_old, 0.0
        for r_new in sorted(k_to):
            if r_new == r_old:
                continue
            gn = gain(k_to[r_new], ref_size[r_new], ref_K[r_new],
                      0.0, 0.0, 0.0, g.sizes[v], g.strength[v])
            if gn > best_g + 1e-12 or (abs(gn - best_g) <= 1e-12
                                       and best_r != r_old and r_new < best_r):
                best_r, best_g = r_new, gn
        if best_r != r_old:
            ref_size[r_old] -= g.sizes[v]
            ref_K[r_old] -= g.strength[v]
            ref_size[best_r] += g.sizes[v]
            ref_K[best_r] += g.strength[v]
            ref[v] = best_r
    return ref


def _aggregate(g: _Graph, ref: np.ndarray, comm: np.ndarray
               ) -> Tuple[_Graph, np.ndarray, np.ndarray]:
    """Aggregate on the refined partition; aggregated nodes inherit the
    local-move community as their initial assignment. Returns
    (agg_graph, node→agg mapping, initial agg communities)."""
    labels = {}
    for v in range(g.n):  # deterministic first-seen order
        r = int(ref[v])
        if r not in labels:
            labels[r] = len(labels)
    k = len(labels)
    node2agg = np.array([labels[int(ref[v])] for v in range(g.n)], dtype=np.int64)
    ag = _Graph(k)
    ag.sizes = np.zeros(k)
    for v in range(g.n):
        a = node2agg[v]
        ag.sizes[a] += g.sizes[v]
        if g.self_w[v]:
            ag.add_edge(int(a), int(a), float(g.self_w[v]))
    for v in range(g.n):
        av = int(node2agg[v])
        for u, w in g.adj[v].items():
            if u <= v:
                continue
            ag.add_edge(av, int(node2agg[u]), w)
    init = np.zeros(k, dtype=np.int64)
    for v in range(g.n):
        init[node2agg[v]] = comm[v]
    # compact the inherited communities to 0..k-1 ids
    remap = {}
    for a in range(k):
        c = int(init[a])
        if c not in remap:
            remap[c] = len(remap)
        init[a] = remap[c]
    return ag, node2agg, init


def leiden_levels(
    nodes: List[str],
    edges: List[Tuple[int, int, float]],
    gamma: float = 0.7,
    seed: int = 42,
    max_levels: int = 4,
    objective: str = "cpm",
) -> List[np.ndarray]:
    """Run Leiden; returns per-level membership arrays for the ORIGINAL
    nodes (len(levels) >= 1; last level is the final partition). Community
    ids are arbitrary ints per level — callers canonicalize numbering."""
    n = len(nodes)
    g = _Graph(n)
    total_w = 0.0
    for u, v, w in edges:
        g.add_edge(int(u), int(v), float(w))
        total_w += float(w)
    gain = _gain_fn(objective, gamma, total_w)
    rng = np.random.default_rng(seed)

    def first_seen_relabel(arr: np.ndarray) -> np.ndarray:
        remap: Dict[int, int] = {}
        out = np.empty(len(arr), dtype=np.int64)
        for i, c in enumerate(arr):
            c = int(c)
            if c not in remap:
                remap[c] = len(remap)
            out[i] = remap[c]
        return out

    mapping = np.arange(n, dtype=np.int64)   # original node → current node
    comm = np.arange(g.n, dtype=np.int64)    # singleton start
    levels: List[np.ndarray] = []
    prev: np.ndarray | None = None
    for _ in range(max_levels):
        _local_move(g, comm, gain, rng)
        proj = first_seen_relabel(comm[mapping])
        if prev is not None and np.array_equal(proj, prev):
            break  # fixpoint: this level changed nothing
        levels.append(proj)
        prev = proj
        ref = _refine(g, comm, gain, rng)
        g, node2agg, comm = _aggregate(g, ref, comm)
        mapping = node2agg[mapping]
    if not levels:
        levels.append(np.zeros(n, dtype=np.int64))
    return levels
