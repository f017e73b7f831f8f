"""Colored de Bruijn graph assembly (Platypus-style, benchmarks/dbg).

Semantics source: benchmarks/dbg/debruijn.cpp —
  * colours REF=1 READ=2 (:38-40); node merge ORs colours and sums node
    weights; edge weights accumulate (:860-905 AddEdge/InsertOrUpdate)
  * loadReferenceIntoGraph (:1262-1290): edges between consecutive ref
    k-mers, weight 1; loop bound i < len-k-1 (the reference's off-by-one
    — the final k-mer edge is never added — is reproduced)
  * loadReadIntoGraph (:1322-1366): per window of k+1 bases, min base
    quality over the window must be >= minQual and no Ns; edge weight =
    that min quality
  * detectCyclesInGraph (:1002-1084): the reference's iterative marking
    walk from the position-sorted first node (faithfully mirrored,
    including its pop-once recolouring behaviour)
  * getVariantPathsThroughGraphFromNode (:1147-1230): bounded DFS (stack
    and results capped at 20) collecting read-coloured bubbles that
    rejoin the reference
  * assembleReadsAndDetectVariants (:1389-1433): per window defaults
    kmerSize=15, minQual=20, minWeight=minReads*minQual=40
  * window loop (:1527-1545): assemblyRegionSize=1500, shift=750,
    ref context = [assemStart-1500, assemEnd+1500)

This subsystem is host-side by design (hash/pointer-bound graph build —
SURVEY.md §7 step 9); the TPU framework keeps it for capability parity.
"""

from __future__ import annotations

from dataclasses import dataclass, field

REF = 1
READ = 2
REF_AND_READ = 3


@dataclass
class DbgNode:
    kmer: str
    colours: int
    position: int
    weight: float
    edges: dict = field(default_factory=dict)  # succ kmer -> weight
    order: int = 0  # insertion order (allNodes stack order)


class DeBruijnGraph:
    def __init__(self, kmer_size: int):
        self.k = kmer_size
        self.nodes: dict[str, DbgNode] = {}

    def _insert_or_update(self, kmer, colours, position, weight) -> DbgNode:
        node = self.nodes.get(kmer)
        if node is None:
            node = DbgNode(kmer, colours, position, weight, order=len(self.nodes))
            self.nodes[kmer] = node
        else:
            node.colours |= colours
            node.weight += weight
        return node

    def add_edge(self, k1, k2, colours, pos1, pos2, node_weight, edge_weight):
        a = self._insert_or_update(k1, colours, pos1, node_weight)
        self._insert_or_update(k2, colours, pos2, node_weight)
        # reference caps a node at 4 out-edges (one per base); dict is
        # equivalent since successors of a k-mer differ in the last base
        a.edges[k2] = a.edges.get(k2, 0.0) + edge_weight

    def load_reference(self, ref_seq: str, ref_start: int):
        k = self.k
        for i in range(len(ref_seq) - k - 1):  # reference's exact bound
            self.add_edge(
                ref_seq[i : i + k], ref_seq[i + 1 : i + 1 + k],
                REF, ref_start + i, ref_start + i + 1, 1, 1,
            )

    def load_read(self, seq: str, quals, min_qual: int):
        k = self.k
        for i in range(len(seq) - k - 1):
            window = range(i, i + k + 1)
            this_min = min(int(quals[j]) for j in window)
            if this_min >= min_qual and all(seq[j] != "N" for j in window):
                self.add_edge(
                    seq[i : i + k], seq[i + 1 : i + 1 + k],
                    READ, -1, -1, this_min, this_min,
                )

    # ---- cycle detection (debruijn.cpp:971-1000 Recursive variant) ----
    def detect_cycles(self, min_weight: float = 0.0) -> bool:
        """White/grey/black DFS from every node in insertion (allNodes)
        order; read-only edges below min_weight are skipped
        (dfsVisit, debruijn.cpp:936-939).  Iterative emulation of the
        reference's recursion — same coloring, same verdict."""
        colour = {k: "w" for k in self.nodes}
        for start in sorted(self.nodes.values(), key=lambda n: n.order):
            if colour[start.kmer] != "w":
                continue
            colour[start.kmer] = "g"
            stack = [(start, iter(list(start.edges.items())))]
            while stack:
                node, edge_iter = stack[-1]
                advanced = False
                for succ, w in edge_iter:
                    nxt = self.nodes[succ]
                    if nxt.colours == READ and w < min_weight:
                        continue
                    c = colour[succ]
                    if c == "g":
                        return True
                    if c == "w":
                        colour[succ] = "g"
                        stack.append((nxt, iter(list(nxt.edges.items()))))
                        advanced = True
                        break
                if not advanced:
                    colour[node.kmer] = "b"
                    stack.pop()
        return False

    # ---- bubble path extraction (debruijn.cpp:1147-1230) ----
    def variant_paths_from(self, start_kmer: str, min_weight: float):
        """All bubble paths leaving a ref node: for each qualifying edge
        start->succ (the reference's own extension filter,
        debruijn.cpp:1217), the reference's bounded DFS
        getVariantPathsThroughGraphFromNode is run on the 2-node seed
        path [start, succ].  Called on a bare 1-node REF_AND_READ path
        the reference function degenerates (finishes immediately,
        :1186-1189 has no length guard) and its benchmark driver never
        calls it at all — per-seed invocation is the convention that
        makes each call execute the reference's code non-trivially, and
        it is what tools/golden/dbg_harness.cpp pins reference-executed
        goldens against.  Exploded seeds (the reference's NULL return)
        contribute nothing."""
        start = self.nodes[start_kmer]
        out = []
        for succ, w in start.edges.items():
            nxt = self.nodes[succ]
            if not (w >= min_weight or nxt.colours in (REF_AND_READ, REF)):
                continue
            paths = self.variant_paths_from_seed([start_kmer, succ],
                                                 min_weight)
            if paths:
                out.extend(paths)
        return out

    def variant_paths_from_seed(self, seed, min_weight: float):
        """getVariantPathsThroughGraphFromNode (debruijn.cpp:1147-1230)
        on one seed path: bounded DFS (stack and finished both capped at
        20, checked after each pop, :1176), per-path cycle rejection
        (:1116-1143), finish on rejoining a REF_AND_READ node, drop on a
        pure-REF end, extend through edges with weight >= minWeight or
        ref-coloured targets (:1217).  Returns the finished paths in the
        reference's push order, or None on explosion (NULL return)."""
        stack = [list(seed)]
        finished = []
        while stack:
            path = stack.pop()
            if len(stack) > 20 or len(finished) > 20:
                return None
            if len(set(path)) != len(path):  # cycle in path
                continue
            end = self.nodes[path[-1]]
            if end.colours == REF_AND_READ:
                finished.append(path)
            elif end.colours == REF:
                continue
            else:
                for succ, w in end.edges.items():
                    nxt = self.nodes[succ]
                    if w >= min_weight or nxt.colours in (REF_AND_READ, REF):
                        stack.append(path + [succ])
        return finished


def path_sequence(path, k):
    """createSequenceFromPath: first char of each node (+ tail of last)."""
    return "".join(p[0] for p in path) + path[-1][1:]


def assemble_window(ref_seq: str, ref_start: int, reads, kmer_size: int = 15,
                    min_qual: int = 20, min_reads: int = 2):
    """assembleReadsAndDetectVariants for one window.

    reads: list of (seq, quals, flag).  Returns the built graph plus the
    read-bubble paths from every REF_AND_READ node (the full variant-path
    machinery the reference ships; its benchmark driver stops after the
    graph build).
    """
    g = DeBruijnGraph(kmer_size)
    g.load_reference(ref_seq, ref_start)
    for seq, quals, flag in reads:
        if flag & 0x200:  # BAM_FQCFAIL (Read_IsQCFail)
            continue
        g.load_read(seq, quals, min_qual)
    min_weight = min_reads * min_qual
    bubbles = []
    for node in g.nodes.values():
        if node.colours == REF_AND_READ:
            paths = g.variant_paths_from(node.kmer, min_weight)
            if paths:
                bubbles.extend(paths)
    return g, bubbles


def window_batches(beg: int, end: int, region_size: int = 1500):
    """The driver's window schedule (debruijn.cpp:1526-1545)."""
    shift = max(100, min(1000, region_size // 2))
    out = []
    for k in range(beg, end, shift):
        assem_start = k
        assem_end = min(k + region_size, end)
        ref_start = max(0, assem_start - region_size)
        ref_end = assem_end + region_size
        out.append((assem_start, assem_end, ref_start, ref_end))
    return out
