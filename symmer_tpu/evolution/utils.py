"""Hardware-topology utilities for ansatz construction.

(parity surface of symmer ``evolution/utils.py``)
"""
from __future__ import annotations

from collections import Counter
from itertools import combinations

import numpy as np

from ..operators import PauliwordOp


def get_CNOT_connectivity_graph(evolution_obj, print_graph=False):
    """Graph of nonlocal qubit interactions in a trotterized evolution.

    (reference evolution/utils.py:10-34) Accepts a PauliwordOp, or a qiskit
    QuantumCircuit when qiskit is installed.
    """
    from networkx import Graph, draw_spring

    if isinstance(evolution_obj, PauliwordOp):
        rows, cols = np.where(evolution_obj.X_block | evolution_obj.Z_block)
        support_indices = [
            evolution_obj.n_qubits - 1 - cols[rows == i] for i in np.unique(rows)
        ]
        qubit_coupling = [list(zip(x[:-1], x[1:])) for x in support_indices]
        edges = [a for b in qubit_coupling for a in b]
        weighted_edges = [(u, v, w * 2) for (u, v), w in Counter(edges).items()]
    else:  # qiskit circuit
        edges = [
            [q._index for q in step[1]]
            for step in evolution_obj.data
            if step[0].name != "barrier" and len(step[1]) > 1
        ]
        weighted_edges = [(u, v, w) for (u, v), w in Counter(map(tuple, edges)).items()]

    G = Graph()
    G.add_weighted_edges_from(weighted_edges)
    if print_graph:
        draw_spring(G)
    return G


def _subgraph_isomorphism_distance(G, target, depth=0):
    from networkx.algorithms.isomorphism.isomorphvf2 import GraphMatcher

    if depth == 0:
        if GraphMatcher(target, G).subgraph_is_isomorphic():
            return 0
        return None
    ordered_nodes = sorted(
        combinations(G.nodes, r=depth),
        key=lambda nodes: -np.sum([len(G.edges(n)) for n in nodes]),
    )
    for nodes in ordered_nodes:
        G_temp = G.copy()
        for n in nodes:
            G_temp.remove_node(n)
        if GraphMatcher(target, G_temp).subgraph_is_isomorphic():
            dropped = [G.edges[e]["weight"] for n in nodes for e in G.edges(n)]
            return sum(dropped)
    return None


def subgraph_isomorphism_distance(G, target, max_depth=3):
    for depth in range(max_depth):
        dist = _subgraph_isomorphism_distance(G, target, depth)
        if dist is not None:
            return dist
    return None


def topology_match_score(ansatz_operator, topology, max_depth=3):
    """(reference evolution/utils.py:71-83)"""
    n_entangling_gates = 2 * (
        np.count_nonzero(ansatz_operator.X_block | ansatz_operator.Z_block)
        - ansatz_operator.n_terms
    )
    if n_entangling_gates == 0:
        return 1
    entangling_graph = get_CNOT_connectivity_graph(ansatz_operator)
    subgraph_cost = subgraph_isomorphism_distance(
        entangling_graph, topology, max_depth=max_depth
    )
    if subgraph_cost is None:
        return 0
    return 1 - subgraph_cost / n_entangling_gates
