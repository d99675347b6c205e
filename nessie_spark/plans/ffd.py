"""First-fit-decreasing bin packing for small-file compaction.

north_star (BASELINE.json:6): "bin-packing small-file compaction
(first-fit-decreasing on file-size histograms)".

Driver-side planning is correct here: the input is the *file-stats list*
(O(#files), tiny vs data). For the 10^12-image story where even file counts
explode, ``ffd_bucketed`` shards the plan by size decile so each shard packs
independently — same outputs apart from cross-shard mixes, fully
parallelizable (SURVEY.md §7.3 risk 6).
"""

from __future__ import annotations


def ffd_pack(sizes: list[int], target: int) -> list[list[int]]:
    """Pack items (by index) into bins of capacity ``target`` using
    first-fit-decreasing. Items larger than target get singleton bins.
    Returns bins as lists of input indices; deterministic (stable sort by
    (-size, index))."""
    order = sorted(range(len(sizes)), key=lambda i: (-sizes[i], i))
    bins: list[list[int]] = []
    remaining: list[int] = []
    for i in order:
        s = sizes[i]
        placed = False
        for b in range(len(bins)):
            if remaining[b] >= s:
                bins[b].append(i)
                remaining[b] -= s
                placed = True
                break
        if not placed:
            bins.append([i])
            remaining.append(max(target - s, 0))
    return bins


def ffd_histogram(sizes: list[int], target: int, n_buckets: int = 16) -> dict[int, int]:
    """File-size histogram (equi-width up to target) — the planning input
    named by the north star; also exported to BENCH metrics."""
    hist: dict[int, int] = {}
    for s in sizes:
        b = min(int(s * n_buckets / max(target, 1)), n_buckets)
        hist[b] = hist.get(b, 0) + 1
    return hist


def ffd_bucketed(sizes: list[int], target: int, shards: int = 1) -> list[list[int]]:
    """Sharded FFD: partition items round-robin by size rank into ``shards``
    independent FFD problems (distributed fallback for huge file counts)."""
    if shards <= 1:
        return ffd_pack(sizes, target)
    order = sorted(range(len(sizes)), key=lambda i: (-sizes[i], i))
    out: list[list[int]] = []
    for s in range(shards):
        idxs = order[s::shards]
        sub = ffd_pack([sizes[i] for i in idxs], target)
        out.extend([[idxs[j] for j in b] for b in sub])
    return out
