"""Union-find (disjoint-set) with path compression + union by size.

Used by the driver-side connected-components path (small/medium candidate
edge sets) and by tests as the oracle for the distributed hash-min rounds.
"""

from __future__ import annotations


class DSU:
    def __init__(self) -> None:
        self.parent: dict[str, str] = {}
        self.size: dict[str, int] = {}

    def find(self, x: str) -> str:
        p = self.parent
        if x not in p:
            p[x] = x
            self.size[x] = 1
            return x
        root = x
        while p[root] != root:
            root = p[root]
        while p[x] != root:
            p[x], x = root, p[x]
        return root

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        if self.size[ra] < self.size[rb]:
            ra, rb = rb, ra
        self.parent[rb] = ra
        self.size[ra] += self.size[rb]

    def components(self) -> dict[str, list[str]]:
        out: dict[str, list[str]] = {}
        for x in self.parent:
            out.setdefault(self.find(x), []).append(x)
        return out

    def canon_map(self) -> dict[str, str]:
        """node -> min member of its component (the canonical id rule)."""
        comps = self.components()
        out: dict[str, str] = {}
        for members in comps.values():
            canon = min(members)
            for m in members:
                out[m] = canon
        return out
