"""Independent SPOA oracle: a slow, obviously-correct partial-order-alignment
consensus written DIRECTLY from the SPOA algorithm definition (Lee, Grasso &
Sharlow 2002; SPOA's NW "algorithm=1" with two-piece affine gaps m=2, n=-4,
g=-4, e=-2, q=-24, c=-1 — the exact parameter set the reference passes at
SVIM_COMBINE.py:208).

This module deliberately shares NO code or structure with
svim_tpu/native/poa.cpp or svim_tpu/combine/consensus.py (VERDICT r3 #4: the
previous cross-impl diff backed the reference's `spoa.poa` with this repo's
own POA, which was self-referential).  Everything here is integer-scored
full DP over explicit per-state score tables — O(nodes * len) memory per
state with complete backpointers, no banding, no pruning.

Because SPOA's tie-breaking is implementation-defined, the oracle tracks tie
events ON THE CHOSEN PATH: every DP cell records whether an equal-score
alternative existed there, and the traceback ORs the flags of the cells it
actually visits (likewise for the heaviest-bundle consensus walk).  On a
tie-free instance every correct implementation of the definition must emit
the same consensus string, so the differential (tests/test_poa_oracle.py)
demands exact equality there and only quantifies divergence on tied
instances.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

MATCH = 2
MISMATCH = -4
GAP_OPEN_SHORT = -4     # g: first piece, opening
GAP_EXTEND_SHORT = -2   # e: first piece, extension
GAP_OPEN_LONG = -24     # q: second piece, opening
GAP_EXTEND_LONG = -1    # c: second piece, extension

NEG = -(10 ** 9)


@dataclass
class OracleGraph:
    """POA graph as parallel columns (no node objects, unlike poa.cpp)."""

    bases: List[str] = field(default_factory=list)
    coverage: List[int] = field(default_factory=list)
    # in-edges per node: {pred: weight}
    edges_in: List[Dict[int, int]] = field(default_factory=list)
    # "aligned ring": node ids occupying the same alignment column
    rings: List[List[int]] = field(default_factory=list)
    ties: bool = False

    def new_node(self, base: str) -> int:
        self.bases.append(base)
        self.coverage.append(0)
        self.edges_in.append({})
        self.rings.append([])
        return len(self.bases) - 1

    def bump_edge(self, pred: int, node: int) -> None:
        if pred < 0:
            return
        self.edges_in[node][pred] = self.edges_in[node].get(pred, 0) + 1

    def topo_order(self) -> List[int]:
        n = len(self.bases)
        indegree = [0] * n
        succs: List[List[int]] = [[] for _ in range(n)]
        for node in range(n):
            for pred in self.edges_in[node]:
                succs[pred].append(node)
                indegree[node] += 1
        order = [node for node in range(n) if indegree[node] == 0]
        head = 0
        while head < len(order):
            for nxt in succs[order[head]]:
                indegree[nxt] -= 1
                if indegree[nxt] == 0:
                    order.append(nxt)
            head += 1
        assert len(order) == n, "cycle in POA graph"
        return order


# DP states.  Columns consume sequence characters; rows consume graph nodes.
_M, _DS, _DL, _IS, _IL = 0, 1, 2, 3, 4


def _best_state(score, row: int, col: int) -> Tuple[int, bool]:
    """(state with the best score at (row, col), was there a tie)."""
    best, best_val, tie = _M, score[_M][row][col], False
    for state in (_DS, _DL, _IS, _IL):
        value = score[state][row][col]
        if value == best_val and value > NEG // 2:
            tie = True
        if value > best_val:
            best_val = value
            best = state
            tie = False
    return best, tie


def _align(graph: OracleGraph, seq: str) -> List[Tuple[int, int]]:
    """Global (NW) alignment of seq to the graph.

    Returns alignment steps [(node or -1, seq_index or -1), ...] from start
    to end.  Sets graph.ties when a cell ON THE TRACEBACK PATH had an
    equal-score alternative (a different optimal alignment exists through
    that cell)."""
    order = graph.topo_order()
    rank = {node: r for r, node in enumerate(order)}
    rows = len(order) + 1          # row 0 = virtual start (no node)
    width = len(seq) + 1

    # score[state][row][col]; back[state][row][col] = (state, row, col);
    # tied[state][row][col] = an equal-score alternative existed at the cell
    score = [[[NEG] * width for _ in range(rows)] for _ in range(5)]
    back: List[List[List[Optional[Tuple[int, int, int]]]]] = [
        [[None] * width for _ in range(rows)] for _ in range(5)]
    tied = [[[False] * width for _ in range(rows)] for _ in range(5)]

    def preds_of(row: int) -> List[int]:
        node = order[row - 1]
        incoming = graph.edges_in[node]
        if not incoming:
            return [0]
        return [rank[p] + 1 for p in incoming]

    def gap_choice(state, opn, ext, source_row, source_col):
        """Best of open-vs-extend into `state` from (source_row, source_col).
        Returns (value, backpointer, tie)."""
        prev_state, prev_tie = _best_state(score, source_row, source_col)
        from_open = score[prev_state][source_row][source_col] + opn
        from_ext = score[state][source_row][source_col] + ext
        if from_ext > from_open:
            return from_ext, (state, source_row, source_col), False
        tie = (from_ext == from_open and from_open > NEG // 2
               and prev_state != state)
        return from_open, (prev_state, source_row, source_col), (tie
                                                                 or prev_tie)

    score[_M][0][0] = 0
    # row 0: only insertions (sequence characters against no node)
    for col in range(1, width):
        for state, opn, ext in ((_IS, GAP_OPEN_SHORT, GAP_EXTEND_SHORT),
                                (_IL, GAP_OPEN_LONG, GAP_EXTEND_LONG)):
            value, source, tie = gap_choice(state, opn, ext, 0, col - 1)
            score[state][0][col] = value
            back[state][0][col] = source
            tied[state][0][col] = tie

    for row in range(1, rows):
        node = order[row - 1]
        base = graph.bases[node]
        prows = preds_of(row)
        for col in range(width):
            # deletions: consume the node, no character
            for state, opn, ext in ((_DS, GAP_OPEN_SHORT, GAP_EXTEND_SHORT),
                                    (_DL, GAP_OPEN_LONG, GAP_EXTEND_LONG)):
                best_val = NEG
                best_src: Optional[Tuple[int, int, int]] = None
                best_tie = False
                for prow in prows:
                    cand, src, tie = gap_choice(state, opn, ext, prow, col)
                    if cand == best_val and cand > NEG // 2:
                        best_tie = True
                    if cand > best_val:
                        best_val, best_src, best_tie = cand, src, tie
                score[state][row][col] = best_val
                back[state][row][col] = best_src
                tied[state][row][col] = best_tie
            if col >= 1:
                # match / mismatch: consume node + character
                sub = MATCH if base == seq[col - 1] else MISMATCH
                best_val = NEG
                best_src = None
                best_tie = False
                for prow in prows:
                    prev_state, prev_tie = _best_state(score, prow, col - 1)
                    cand = score[prev_state][prow][col - 1] + sub
                    if cand == best_val and cand > NEG // 2:
                        best_tie = True
                    if cand > best_val:
                        best_val = cand
                        best_src = (prev_state, prow, col - 1)
                        best_tie = prev_tie
                score[_M][row][col] = best_val
                back[_M][row][col] = best_src
                tied[_M][row][col] = best_tie
                # insertions: consume a character, stay on this row
                for state, opn, ext in ((_IS, GAP_OPEN_SHORT, GAP_EXTEND_SHORT),
                                        (_IL, GAP_OPEN_LONG, GAP_EXTEND_LONG)):
                    value, source, tie = gap_choice(state, opn, ext, row,
                                                    col - 1)
                    score[state][row][col] = value
                    back[state][row][col] = source
                    tied[state][row][col] = tie

    # global end: the best cell at col = len over sink rows (a node with no
    # successor, or row 0 for the empty graph)
    has_succ = [False] * rows
    for node in range(len(graph.bases)):
        for pred in graph.edges_in[node]:
            has_succ[rank[pred] + 1] = True
    end_state, end_row, end_val = _M, 0, NEG
    end_tie = False
    for row in range(rows):
        if row > 0 and has_succ[row]:
            continue
        for state in range(5):
            value = score[state][row][len(seq)]
            if value == end_val and value > NEG // 2 and (row, state) != (
                    end_row, end_state):
                end_tie = True
            if value > end_val:
                end_val, end_state, end_row = value, state, row
                end_tie = False
    if end_tie:
        graph.ties = True

    steps: List[Tuple[int, int]] = []
    state, row, col = end_state, end_row, len(seq)
    while row != 0 or col != 0:
        if tied[state][row][col]:
            graph.ties = True
        source = back[state][row][col]
        assert source is not None, "broken traceback"
        if state == _M:
            steps.append((order[row - 1], col - 1))
        elif state in (_DS, _DL):
            steps.append((order[row - 1], -1))
        else:
            steps.append((-1, col - 1))
        state, row, col = source
    steps.reverse()
    return steps


def _merge(graph: OracleGraph, seq: str,
           steps: List[Tuple[int, int]]) -> None:
    """Thread the aligned sequence into the graph (SPOA add_alignment:
    matches reuse nodes, mismatches join the node's aligned ring, insertions
    make fresh nodes; consecutive emitted nodes gain edge weight 1)."""
    previous = -1
    for node, seq_index in steps:
        if seq_index < 0:
            continue  # deletion: the sequence emits nothing here
        base = seq[seq_index]
        if node < 0:
            target = graph.new_node(base)
        elif graph.bases[node] == base:
            target = node
        else:
            target = -1
            for member in graph.rings[node]:
                if graph.bases[member] == base:
                    target = member
                    break
            if target < 0:
                target = graph.new_node(base)
                ring = graph.rings[node] + [node]
                graph.rings[target] = ring
                for member in ring:
                    graph.rings[member].append(target)
        graph.coverage[target] += 1
        graph.bump_edge(previous, target)
        previous = target


def _heaviest_bundle(graph: OracleGraph) -> str:
    """SPOA's consensus: the maximum-total-edge-weight path through the DAG.
    A tie is flagged only when it sits on the RETURNED path (an equal-weight
    alternative parent at a visited node, or an equal-weight global end)."""
    order = graph.topo_order()
    total: Dict[int, int] = {}
    parent: Dict[int, int] = {}
    parent_tie: Dict[int, bool] = {}
    for node in order:
        node_best, node_parent, node_tie = 0, -1, False
        for pred, weight in graph.edges_in[node].items():
            cand = total[pred] + weight
            if cand == node_best and node_parent >= 0:
                node_tie = True
            if cand > node_best:
                node_best, node_parent, node_tie = cand, pred, False
        total[node] = node_best
        parent[node] = node_parent
        parent_tie[node] = node_tie
    best_total = max(total.values())
    winners = [node for node in order if total[node] == best_total]
    if len(winners) > 1:
        graph.ties = True
    best_node = winners[0]
    out: List[str] = []
    node = best_node
    while node >= 0:
        if parent_tie[node]:
            graph.ties = True
        out.append(graph.bases[node])
        node = parent[node]
    return "".join(reversed(out))


@dataclass
class OracleResult:
    consensus: str
    ties: bool   # an equal-score choice existed ON the chosen path


def spoa_consensus_oracle(sequences: List[str]) -> OracleResult:
    """Consensus of `sequences` per the SPOA definition: seed the graph with
    the first sequence, globally align + merge each following one, return
    the heaviest-bundle path."""
    assert sequences, "empty cluster"
    graph = OracleGraph()
    previous = -1
    for base in sequences[0]:
        node = graph.new_node(base)
        graph.coverage[node] = 1
        graph.bump_edge(previous, node)
        previous = node
    for seq in sequences[1:]:
        steps = _align(graph, seq)
        _merge(graph, seq, steps)
    return OracleResult(_heaviest_bundle(graph), graph.ties)
