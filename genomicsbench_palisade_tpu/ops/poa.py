"""Partial-order alignment on TPU (spoa convex-NW semantics).

TPU-native design.  Graph topology mutates per added sequence (pointer
work — stays on host, see oracle/poa.py PoaGraph); the O(nodes x width)
convex Needleman-Wunsch DP and its traceback run on device, vmapped over
many MSA windows in lock-step:

  round k: align sequence k of EVERY window on device (one launch),
           then apply the k-th graph updates on the host.

DP reformulation (exact, see sisd_alignment_engine.cpp:659-907):
  * F/O (vertical, graph-edge gaps) are max-reductions over <=P padded
    predecessor rows — pure gathers + VPU max.
  * E/Q (horizontal gaps) couple through H within a row; each chain has
    the closed form  E[j] = g + (j-1)e + max_{j'<j}(H[j'] - j'e)
    (a cummax), and the E<->Q coupling converges by iterating the pair of
    cummax passes to fixpoint (gap-after-gap alternation depth is tiny;
    the loop runs until H stops changing, so the result is exact).
  * traceback is a device while_loop emitting (node_rank, seq_pos) pairs
    with the reference's exact priority order and extend-repair loops.

Rank-space graph arrays (padded): code_by_rank [N], preds [N, P] (rank+1,
row 0 = virtual start), npreds [N], out_empty [N].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -(1 << 31) + 1024  # spoa kNegativeInfinity


def graph_to_arrays(graph, n_cap: int, p_cap: int):
    """Host: PoaGraph -> padded rank-space arrays. Returns None on overflow."""
    n = len(graph.nodes)
    if n > n_cap:
        return None
    node_rank = {nid: r for r, nid in enumerate(graph.rank_to_node_id)}
    code = np.zeros(n_cap, np.int32)
    preds = np.zeros((n_cap, p_cap), np.int32)
    npreds = np.zeros(n_cap, np.int32)
    out_empty = np.zeros(n_cap, bool)
    for r, nid in enumerate(graph.rank_to_node_id):
        node = graph.nodes[nid]
        code[r] = node.code
        ins = node.in_edges
        if len(ins) > p_cap:
            return None
        for p, ei in enumerate(ins):
            preds[r, p] = node_rank[graph.edges[ei].begin] + 1
        npreds[r] = len(ins)
        out_empty[r] = len(node.out_edges) == 0
    return {
        "code": code,
        "preds": preds,
        "npreds": npreds,
        "out_empty": out_empty,
        "n_nodes": np.int32(n),
    }


def _lazy_chain(h, open_pen, ext_pen, j_iota, w):
    """E[j] = open + (j-1)*ext + max_{j'<j}(h[j'] - j'*ext); E[0] = NEG_INF."""
    src = h - j_iota * ext_pen
    cm = jax.lax.cummax(src)
    cm_excl = jnp.concatenate([jnp.array([NEG_INF], jnp.int32), cm[:-1]])
    e = cm_excl + open_pen + (j_iota - 1) * ext_pen
    return jnp.where(j_iota == 0, NEG_INF, e)


@functools.partial(jax.jit, static_argnames=("params", "w_cap", "a_cap"))
def poa_align_device(seqcode, seqlen, garr, params, w_cap, a_cap):
    """One (sequence, graph) convex-NW alignment on device.

    seqcode: [w_cap-1] int32 base codes; seqlen: scalar; garr: graph arrays.
    Returns (aln_i [a_cap] rank-or-minus-one, aln_j [a_cap], aln_len).
    Designed to be vmapped over a batch of windows.
    """
    m, nmis, g, e, q, c = params
    n_cap, p_cap = garr["preds"].shape
    w = w_cap  # matrix width = seq capacity + 1
    n_nodes = garr["n_nodes"]
    j_iota = jnp.arange(w, dtype=jnp.int32)
    valid_j = j_iota <= seqlen  # columns 0..seqlen are live

    # ---------------- matrix init ----------------
    big = (n_cap + 1, w)
    H = jnp.zeros(big, jnp.int32)
    F = jnp.zeros(big, jnp.int32)
    E = jnp.zeros(big, jnp.int32)
    O = jnp.zeros(big, jnp.int32)
    Q = jnp.zeros(big, jnp.int32)
    row0_O = jnp.where(j_iota == 0, 0, NEG_INF)
    row0_Q = jnp.where(j_iota == 0, 0, q + (j_iota - 1) * c)
    row0_F = jnp.where(j_iota == 0, 0, NEG_INF)
    row0_E = jnp.where(j_iota == 0, 0, g + (j_iota - 1) * e)
    row0_H = jnp.where(j_iota == 0, 0, jnp.maximum(row0_Q, row0_E))
    O = O.at[0].set(row0_O)
    Q = Q.at[0].set(row0_Q)
    F = F.at[0].set(row0_F)
    E = E.at[0].set(row0_E)
    H = H.at[0].set(row0_H)

    # column-0 boundary rows are produced inside the row scan (they depend
    # on predecessor rows, same recurrence restricted to j==0)

    def row_step(mats, r):
        H, F, E, O, Q = mats
        i = r + 1
        code_i = garr["code"][r]
        np_r = garr["npreds"][r]
        pred_idx = jnp.where(
            jnp.arange(p_cap) < jnp.maximum(np_r, 1), garr["preds"][r], 0
        )
        pred_mask = jnp.arange(p_cap) < jnp.maximum(np_r, 1)  # [P]

        H_p = H[pred_idx]  # [P, W]
        F_p = F[pred_idx]
        O_p = O[pred_idx]
        neg = jnp.full((p_cap, w), NEG_INF, jnp.int32)
        H_pm = jnp.where(pred_mask[:, None], H_p, neg)
        F_pm = jnp.where(pred_mask[:, None], F_p, neg)
        O_pm = jnp.where(pred_mask[:, None], O_p, neg)

        # col-0 boundary (initialize(): penalty from preds, or q-c / g-e)
        has_preds = np_r > 0
        f0 = jnp.where(
            has_preds, jnp.max(jnp.where(pred_mask, F_p[:, 0], NEG_INF)), g - e
        ) + e
        o0 = jnp.where(
            has_preds, jnp.max(jnp.where(pred_mask, O_p[:, 0], NEG_INF)), q - c
        ) + c
        h0 = jnp.maximum(f0, o0)

        F_row = jnp.max(jnp.maximum(H_pm + g, F_pm + e), axis=0)
        O_row = jnp.max(jnp.maximum(H_pm + q, O_pm + c), axis=0)
        prof = jnp.concatenate(
            [jnp.array([0], jnp.int32), jnp.where(seqcode == code_i, m, nmis)]
        )
        H_p_sh = jnp.concatenate([neg[:, :1], H_pm[:, :-1]], axis=1)
        H_base = jnp.max(H_p_sh + prof[None, :], axis=0)

        base = jnp.maximum(H_base, jnp.maximum(F_row, O_row))
        base = jnp.where(j_iota == 0, h0, base)
        F_row = jnp.where(j_iota == 0, f0, F_row)
        O_row = jnp.where(j_iota == 0, o0, O_row)
        # E/Q fixpoint
        def fix_cond(st):
            return st[3]

        def fix_body(st):
            h_cur, e_row, q_row, _ = st
            e_new = _lazy_chain(h_cur, g, e, j_iota, w)
            q_new = _lazy_chain(h_cur, q, c, j_iota, w)
            e_new = jnp.where(j_iota == 0, NEG_INF, e_new)
            q_new = jnp.where(j_iota == 0, NEG_INF, q_new)
            h_new = jnp.maximum(base, jnp.maximum(e_new, q_new))
            h_new = jnp.where(j_iota == 0, h0, h_new)
            changed = jnp.any(h_new != h_cur)
            return (h_new, e_new, q_new, changed)

        st = (base, jnp.full(w, NEG_INF, jnp.int32), jnp.full(w, NEG_INF, jnp.int32), jnp.bool_(True))
        h_row, e_row, q_row, _ = jax.lax.while_loop(fix_cond, fix_body, st)
        # one more pass so E/Q reflect the final H (matrix-value exactness)
        e_row = jnp.where(j_iota == 0, NEG_INF, _lazy_chain(h_row, g, e, j_iota, w))
        q_row = jnp.where(j_iota == 0, NEG_INF, _lazy_chain(h_row, q, c, j_iota, w))

        live = r < n_nodes
        def put(mat, row):
            return jax.lax.cond(
                live, lambda: mat.at[i].set(row), lambda: mat
            )
        H = put(H, h_row)
        F = put(F, F_row)
        E = put(E, e_row)
        O = put(O, O_row)
        Q = put(Q, q_row)
        return (H, F, E, O, Q), None

    (H, F, E, O, Q), _ = jax.lax.scan(
        row_step, (H, F, E, O, Q), jnp.arange(n_cap, dtype=jnp.int32)
    )

    # ---------------- find max (kNW: last column, sink rows) ----------------
    rows = jnp.arange(n_cap, dtype=jnp.int32)
    is_sink = garr["out_empty"] & (rows < n_nodes)
    h_last = H[1:, :]  # row i corresponds to rank i-1
    end_scores = jnp.where(
        is_sink, jnp.take_along_axis(h_last, jnp.broadcast_to(seqlen, (n_cap,))[:, None], 1)[:, 0], NEG_INF
    )
    # reference keeps the FIRST maximal sink in rank order (strict <)
    best_rank = jnp.argmax(end_scores)  # argmax returns first max
    max_i = best_rank + 1
    max_j = seqlen

    # ---------------- traceback ----------------
    aln_i = jnp.full(a_cap, -2, jnp.int32)
    aln_j = jnp.full(a_cap, -2, jnp.int32)

    def tb_cond(st):
        return (st["i"] != 0) | (st["j"] != 0)

    def tb_body(st):
        i, j = st["i"], st["j"]
        h_ij = H[i, j]
        r = i - 1
        np_r = jnp.where(i > 0, garr["npreds"][r], 0)
        pred_idx = jnp.where(jnp.arange(p_cap) < jnp.maximum(np_r, 1), garr["preds"][jnp.maximum(r, 0)], 0)
        pmask = jnp.arange(p_cap) < jnp.maximum(np_r, 1)
        code_i = garr["code"][jnp.maximum(r, 0)]
        sc = jnp.where(j > 0, jnp.where(seqcode[jnp.maximum(j - 1, 0)] == code_i, m, nmis), 0)

        # 1) diagonal over preds
        diag_ok = (i != 0) & (j != 0) & pmask & (h_ij == H[pred_idx, j - 1] + sc)
        diag_p = jnp.argmax(diag_ok)
        found_d = jnp.any(diag_ok)

        # 2) vertical over preds (with extend_up flag per the |= chain)
        c1 = pmask & (h_ij == F[pred_idx, j] + e)
        c2 = pmask & (h_ij == H[pred_idx, j] + g)
        c3 = pmask & (h_ij == O[pred_idx, j] + c)
        c4 = pmask & (h_ij == H[pred_idx, j] + q)
        vert_ok = (i != 0) & (c1 | c2 | c3 | c4)
        vert_p = jnp.argmax(vert_ok)
        found_v = jnp.any(vert_ok) & ~found_d
        ext_up = found_v & (c1[vert_p] | (~c2[vert_p] & c3[vert_p]))

        # 3) horizontal
        e1 = h_ij == E[i, jnp.maximum(j - 1, 0)] + e
        e2 = h_ij == H[i, jnp.maximum(j - 1, 0)] + g
        e3 = h_ij == Q[i, jnp.maximum(j - 1, 0)] + c
        e4 = h_ij == H[i, jnp.maximum(j - 1, 0)] + q
        found_h = (j != 0) & ~found_d & ~found_v & (e1 | e2 | e3 | e4)
        ext_left = found_h & (e1 | (~e2 & e3))

        prev_i = jnp.where(found_d, pred_idx[diag_p], jnp.where(found_v, pred_idx[vert_p], i))
        prev_j = jnp.where(found_d, j - 1, jnp.where(found_v, j, jnp.where(found_h, j - 1, j)))
        # NW at boundary: if nothing found (shouldn't happen), step to 0,0
        prev_i = jnp.where(found_d | found_v | found_h, prev_i, 0)
        prev_j = jnp.where(found_d | found_v | found_h, prev_j, 0)

        out_i = jnp.where(i == prev_i, -1, i - 1)
        out_j = jnp.where(j == prev_j, -1, j - 1)
        cnt = st["cnt"]
        ai = st["ai"].at[cnt].set(out_i)
        aj = st["aj"].at[cnt].set(out_j)
        cnt = cnt + 1
        i2, j2 = prev_i, prev_j

        # extend-left repair loop
        def el_cond(s):
            return s[3]

        def el_body(s):
            ai, aj, cnt, _, jj = s
            ai = ai.at[cnt].set(-1)
            aj = aj.at[cnt].set(jj - 1)
            cnt = cnt + 1
            jj = jj - 1
            more = ~(
                (E[i2, jj] + e != E[i2, jj + 1]) & (Q[i2, jj] + c != Q[i2, jj + 1])
            )
            return (ai, aj, cnt, more, jj)

        ai, aj, cnt, _, j2 = jax.lax.while_loop(
            el_cond, el_body, (ai, aj, cnt, ext_left, j2)
        )

        # extend-up repair loop
        def eu_cond(s):
            return s[3]

        def eu_body(s):
            ai, aj, cnt, _, ii = s
            rr = ii - 1
            npr = garr["npreds"][jnp.maximum(rr, 0)]
            pidx = jnp.where(jnp.arange(p_cap) < jnp.maximum(npr, 1), garr["preds"][jnp.maximum(rr, 0)], 0)
            pm = jnp.arange(p_cap) < npr
            cond_a = pm & (
                (F[ii, j2] == F[pidx, j2] + e) | (O[ii, j2] == O[pidx, j2] + c)
            )
            hit_a = jnp.any(cond_a)
            pa = jnp.argmax(cond_a)
            cond_b = pm & (
                (F[ii, j2] == H[pidx, j2] + g) | (O[ii, j2] == H[pidx, j2] + q)
            )
            hit_b = jnp.any(cond_b)
            pb = jnp.argmax(cond_b)
            prev = jnp.where(hit_a, pidx[pa], jnp.where(hit_b, pidx[pb], 0))
            stop = ~hit_a
            ai = ai.at[cnt].set(ii - 1)
            aj = aj.at[cnt].set(-1)
            cnt = cnt + 1
            ii = prev
            more = ~stop & (ii != 0)
            return (ai, aj, cnt, more, ii)

        ai, aj, cnt, _, i2 = jax.lax.while_loop(
            eu_cond, eu_body, (ai, aj, cnt, ext_up, i2)
        )

        return dict(i=i2, j=j2, ai=ai, aj=aj, cnt=cnt)

    st = dict(i=max_i, j=max_j, ai=aln_i, aj=aln_j, cnt=jnp.int32(0))
    st = jax.lax.while_loop(tb_cond, tb_body, st)
    return st["ai"], st["aj"], st["cnt"]


def align_batch(graphs, seqs, params=(2, -4, -4, -2, -24, -1), n_cap=None, p_cap=16,
                w_cap=None, a_cap=None):
    """Host entry: align seqs[k] against graphs[k] for every window k.

    graphs: list of PoaGraph; seqs: list of str (codes via ACGT->0..3).
    Returns list of spoa Alignment lists [(node_id, seq_pos)].
    """
    from .oracle.poa import convex_nw_align

    code_map = {ch: i for i, ch in enumerate("ACGT")}
    b = len(graphs)
    if n_cap is None:
        n_cap = max(8, int(2 ** np.ceil(np.log2(max(len(g.nodes) for g in graphs) + 1))))
    if w_cap is None:
        w_cap = max(8, int(2 ** np.ceil(np.log2(max(len(s) for s in seqs) + 2))))
    if a_cap is None:
        a_cap = n_cap + w_cap + 4

    garrs = []
    fallback = [False] * b
    for gi, g in enumerate(graphs):
        # device codes are global ACGT codes, not the per-graph coder
        arr = graph_to_arrays(_with_global_codes(g, code_map), n_cap, p_cap)
        if arr is None or not g.nodes:
            fallback[gi] = True
            arr = graph_to_arrays(_EMPTY_GARR_GRAPH, n_cap, p_cap)
        garrs.append(arr)

    garr_stack = {
        k: jnp.asarray(np.stack([a[k] for a in garrs])) for k in garrs[0]
    }
    seq_arr = np.zeros((b, w_cap - 1), np.int32)
    seq_len = np.zeros(b, np.int32)
    for i, s in enumerate(seqs):
        codes = [code_map.get(ch, 9) for ch in s]
        seq_arr[i, : len(codes)] = codes
        seq_len[i] = len(codes)

    fn = jax.vmap(
        lambda sc, sl, ga: poa_align_device(sc, sl, ga, params, w_cap, a_cap),
        in_axes=(0, 0, 0),
    )
    ai, aj, cnt = fn(jnp.asarray(seq_arr), jnp.asarray(seq_len), garr_stack)
    ai, aj, cnt = np.asarray(ai), np.asarray(aj), np.asarray(cnt)

    out = []
    for gi, g in enumerate(graphs):
        if fallback[gi] or not g.nodes:
            out.append(convex_nw_align(seqs[gi], g))
            continue
        rank_to_node_id = g.rank_to_node_id
        aln = []
        for t in range(cnt[gi] - 1, -1, -1):
            r = int(ai[gi, t])
            j = int(aj[gi, t])
            aln.append((-1 if r < 0 else rank_to_node_id[r], j))
        out.append(aln)
    return out


class _EmptyGraph:
    nodes = []
    rank_to_node_id = []
    edges = []


_EMPTY_GARR_GRAPH = _EmptyGraph()


def _with_global_codes(graph, code_map):
    """View of a PoaGraph whose node codes are global ACGT codes."""

    class _View:
        pass

    v = _View()
    v.edges = graph.edges
    v.rank_to_node_id = graph.rank_to_node_id

    class _N:
        __slots__ = ("code", "in_edges", "out_edges")

    nodes = []
    for nd in graph.nodes:
        n2 = _N()
        ch = graph.decoder[nd.code]
        n2.code = code_map.get(ch, 9)
        n2.in_edges = nd.in_edges
        n2.out_edges = nd.out_edges
        nodes.append(n2)
    v.nodes = nodes
    return v


def msa_consensus_batch(batches, params=(2, -4, -4, -2, -24, -1),
                        timings: dict | None = None):
    """Consensus for many windows, sequences aligned in device lock-step.

    timings (optional dict) receives the reference driver's phase times
    (msa_spoa_omp.cpp:328: align / addToGraph / generateConsensus)."""
    import time as _time

    from .oracle.poa import PoaGraph

    t_align = t_add = t_cons = 0.0
    graphs = [PoaGraph() for _ in batches]
    max_rounds = max(len(b) for b in batches)
    for k in range(max_rounds):
        idxs = [i for i, b in enumerate(batches) if k < len(b)]
        sub_graphs = [graphs[i] for i in idxs]
        sub_seqs = [batches[i][k] for i in idxs]
        t0 = _time.perf_counter()
        alns = align_batch(sub_graphs, sub_seqs, params)
        t_align += _time.perf_counter() - t0
        t0 = _time.perf_counter()
        for i, aln in zip(idxs, alns):
            graphs[i].add_alignment(aln, batches[i][k])
        t_add += _time.perf_counter() - t0
    t0 = _time.perf_counter()
    out = [g.generate_consensus() for g in graphs]
    t_cons += _time.perf_counter() - t0
    if timings is not None:
        timings.update(align=t_align, add=t_add, consensus=t_cons)
    return out
