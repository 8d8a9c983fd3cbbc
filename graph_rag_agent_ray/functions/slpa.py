"""Speaker-Listener Label Propagation (SLPA, Xie et al. 2011) — the
algorithm behind GDS ``sllpa`` that the reference's alternative detector
invokes (/root/reference/community/detector/sllpa.py:10-80, parameters
``maxIterations`` / ``minAssociationStrength``).

Every node keeps a MEMORY of labels it has accepted. Per iteration, each
listener (seeded random order) asks every neighbour to speak one label drawn
from the speaker's memory with probability proportional to its frequency,
adopts the most popular received label (ties → smallest label), and appends
it to memory. Post-processing keeps each node's labels whose memory
frequency ≥ ``min_association`` — nodes can pass several labels, which is
what makes SLPA's communities OVERLAPPING (GDS writes a ``communityIds``
array per node for the same reason).

Driver-local like the other detectors: it runs on the aggregated entity
graph behind the MAX_DRIVER_GRAPH_EDGES guard; determinism comes from the
seeded generator plus sorted node/neighbour order, so results are identical
across runs and parallelism levels.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def slpa_memberships(
    n_nodes: int,
    edge_list: Sequence[Tuple[int, int, float]],
    seed: int = 42,
    max_iterations: int = 50,
    min_association: float = 0.1,
) -> List[List[int]]:
    """Per-node passing labels, strongest-first (label ints index nodes).

    ``max_iterations`` / ``min_association`` default to the reference's
    small-memory SLLPA tier (sllpa.py:75-80: maxIterations=50,
    minAssociationStrength=0.1)."""
    nbrs: List[List[int]] = [[] for _ in range(n_nodes)]
    for u, v, _w in edge_list:
        if u == v:
            continue
        nbrs[u].append(v)
        nbrs[v].append(u)
    nbrs = [sorted(set(x)) for x in nbrs]

    rng = np.random.default_rng(seed)
    memory: List[dict] = [{i: 1} for i in range(n_nodes)]
    for _ in range(max_iterations):
        for listener in rng.permutation(n_nodes):
            ns = nbrs[listener]
            if not ns:
                continue
            received: dict = {}
            for sp in ns:
                m = memory[sp]
                if len(m) == 1:
                    lab = next(iter(m))
                else:
                    labels = sorted(m)          # deterministic draw order
                    cum = np.cumsum([m[l] for l in labels])
                    lab = labels[int(np.searchsorted(
                        cum, rng.random() * cum[-1], side="right"))]
                received[lab] = received.get(lab, 0) + 1
            top = max(received.values())
            tied = sorted(l for l, c in received.items() if c == top)
            # seeded-random tie break: a fixed "smallest label wins" rule
            # would systematically spread low-indexed nodes' labels
            best = tied[0] if len(tied) == 1 else \
                tied[int(rng.integers(0, len(tied)))]
            memory[listener][best] = memory[listener].get(best, 0) + 1

    out: List[List[int]] = []
    for i in range(n_nodes):
        m = memory[i]
        total = sum(m.values())
        passing = sorted(
            ((cnt, lab) for lab, cnt in m.items()
             if cnt / total >= min_association),
            key=lambda t: (-t[0], t[1]),
        )
        if not passing:  # threshold above even the argmax — keep strongest
            cnt, lab = max(((c, -l) for l, c in m.items()))
            passing = [(cnt, -lab)]
        out.append([lab for _cnt, lab in passing])
    return out
