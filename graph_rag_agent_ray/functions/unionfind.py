"""Union-find with deterministic canonical representatives.

Replaces three reference mechanisms: GDS WCC over SIMILAR edges
(/root/reference/graph/processing/similar_entity.py:224-286), the in-memory
merge-group overlap union (graph/processing/entity_merger.py:233-280), and the
Cypher transitive-closure grouping (similar_entity.py:315-353). The reference
keeps the *first* node's properties on merge (apoc 'discard'); block order is
nondeterministic under Ray, so our canonical representative is the
lexicographically smallest member — stable across runs and parallelism levels.
"""

from __future__ import annotations

from typing import Dict, Hashable, Iterable, List, Tuple


class UnionFind:
    def __init__(self) -> None:
        self.parent: Dict[Hashable, Hashable] = {}

    def find(self, x: Hashable) -> Hashable:
        p = self.parent.setdefault(x, x)
        while p != x:
            self.parent[x] = self.parent.setdefault(p, p)
            x = self.parent[x]
            p = self.parent.setdefault(x, x)
        return x

    def union(self, a: Hashable, b: Hashable) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        # deterministic: smaller value becomes the root
        if str(rb) < str(ra):
            ra, rb = rb, ra
        self.parent[rb] = ra

    def groups(self) -> Dict[Hashable, List[Hashable]]:
        out: Dict[Hashable, List[Hashable]] = {}
        for x in list(self.parent):
            out.setdefault(self.find(x), []).append(x)
        for members in out.values():
            members.sort(key=str)
        return out

    def alias_map(self) -> Dict[Hashable, Hashable]:
        """member -> canonical (lexicographic-min of its component)."""
        return {m: root for root, members in self.groups().items() for m in members}


def components_from_pairs(pairs: Iterable[Tuple[Hashable, Hashable]]) -> Dict[Hashable, Hashable]:
    uf = UnionFind()
    for a, b in pairs:
        uf.union(a, b)
    return uf.alias_map()
