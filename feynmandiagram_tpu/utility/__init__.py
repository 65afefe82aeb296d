"""Production Taylor-mode AD: graph -> dict of counterterm graphs.

Reference: /root/reference/src/utility.jl.  ``taylorAD`` expands every graph
in truncated Taylor series whose coefficients are fresh Graph leaves (for
leaf nodes) or operator applications of child series (for internal nodes);
the resulting coefficient graphs share subgraphs across orders, and all
orders lower into ONE flat IR so that sharing survives on TPU.
"""
from __future__ import annotations

import string
from typing import Callable, Dict, List, Optional, Sequence, Tuple

from ..computational_graph import Graph, SUM
from ..computational_graph.graph import linear_combination, multi_product
from ..taylor import (TaylorSeries, get_numvars, get_orders, set_variables,
                      taylor_factorial)


def _apply_series(op, series_list: List[TaylorSeries], factors) -> TaylorSeries:
    """Lift a graph operator to Taylor-series algebra (utility.jl:11-13)."""
    if op.kind == "sum":
        result = None
        for s, f in zip(series_list, factors):
            term = s * f
            result = term if result is None else result + term
        return result
    if op.kind == "prod":
        result = None
        for s, f in zip(series_list, factors):
            term = s * f
            result = term if result is None else result * term
        return result
    if op.kind == "power":
        return (series_list[0] ** op.n) * factors[0]
    raise ValueError(f"cannot Taylor-expand operator {op}")


def taylorexpansion(graph: Graph,
                    var_dependence: Optional[Dict[int, List[bool]]] = None, *,
                    to_coeff_map: Optional[Dict[int, TaylorSeries]] = None
                    ) -> Tuple[TaylorSeries, Dict[int, TaylorSeries]]:
    """Taylor series of ``graph`` + a map node-id -> series (utility.jl:105-135).

    ``var_dependence[leaf_id]`` is a bool vector over the registered
    variables; leaves without an entry depend on nothing.  Leaf coefficient
    graphs carry ``orders=o`` and the same ``properties`` as the leaf, so
    downstream leafstates can evaluate them (G/V derivative towers).
    """
    if var_dependence is None:
        var_dependence = {}
    if to_coeff_map is None:
        to_coeff_map = {}
    return _expand(graph, var_dependence, to_coeff_map), to_coeff_map


def _expand(graph: Graph, var_dependence, to_coeff_map) -> TaylorSeries:
    from ..computational_graph.feynman_graph import FeynmanGraph

    if graph.id in to_coeff_map:
        return to_coeff_map[graph.id]
    if graph.isleaf():
        var = var_dependence.get(graph.id, [False] * get_numvars())
        ranges = [range(0, get_orders(idx) + 1) if var[idx] else range(0, 1)
                  for idx in range(get_numvars())]
        import itertools
        result = TaylorSeries()
        is_feynman = isinstance(graph, FeynmanGraph)
        for order in itertools.product(*ranges):
            o = tuple(order)
            if sum(o) == 0 and not is_feynman:
                result.coeffs[o] = graph  # zeroth coefficient is the leaf itself
            else:
                # FeynmanGraph leaves always get fresh Graph coefficients
                # (utility.jl:147-165); Graph leaves only for nonzero orders
                coeff = Graph([], operator=SUM, properties=graph.properties,
                              orders=list(o))
                result.coeffs[o] = coeff
        to_coeff_map[graph.id] = result
        return result
    child_series = [_expand(sub, var_dependence, to_coeff_map) for sub in graph.subgraphs]
    series = _apply_series(graph.operator, child_series, graph.subgraph_factors)
    for g in series.coeffs.values():
        g.properties = graph.properties
    to_coeff_map[graph.id] = series
    return series


def taylorexpansion_graphs(graphs: Sequence[Graph], var_dependence=None, *,
                           to_coeff_map=None):
    if to_coeff_map is None:
        to_coeff_map = {}
    result = []
    for g in graphs:
        series, _ = taylorexpansion(g, var_dependence, to_coeff_map=to_coeff_map)
        result.append(series)
    return result, to_coeff_map


def taylorexpansion_feynman(graphs: Sequence["Graph"],
                            propagator_var: Tuple[List[bool], List[bool]], *,
                            to_coeff_map=None):
    """Variable dependence by propagator statistics for FeynmanGraphs:
    fermionic propagators follow propagator_var[0], bosonic propagator_var[1]
    (utility.jl:187-203)."""
    from ..computational_graph.feynman_graph import DiagramType, diagram_type

    var_dependence: Dict[int, List[bool]] = {}
    for graph in graphs:
        for leaf in graph.leaves():
            if diagram_type(leaf) == DiagramType.PROPAGATOR:
                fermionic = leaf.properties.vertices[0].isfermionic()
                which = 0 if fermionic else 1
                var_dependence[leaf.id] = [bool(propagator_var[which][i])
                                           for i in range(get_numvars())]
    return taylorexpansion_graphs(graphs, var_dependence, to_coeff_map=to_coeff_map)


def taylorexpansion_by_leaftype(graphs: Sequence[Graph],
                                propagator_var: Dict[type, List[bool]], *,
                                to_coeff_map=None):
    """Variable dependence by leaf DiagramId type (utility.jl:217-226)."""
    var_dependence: Dict[int, List[bool]] = {}
    for graph in graphs:
        for leaf in graph.leaves():
            t = type(leaf.properties)
            if t in propagator_var:
                var_dependence[leaf.id] = [bool(x) for x in propagator_var[t]]
    return taylorexpansion_graphs(graphs, var_dependence, to_coeff_map=to_coeff_map)


def _variable_names(n: int) -> str:
    charset = string.ascii_lowercase
    names = []
    for i in range(n):
        if i < 26:
            names.append(charset[i])
        else:
            names.append(names[i - 26] + charset[i % 26])
    return " ".join(names)


def taylorAD(graphs: Sequence[Graph], deriv_orders: Sequence[int],
             leaf_dep_funcs: Sequence[Callable], *,
             dict_graphs: Optional[Dict[Tuple[int, ...], List[Graph]]] = None
             ) -> Dict[Tuple[int, ...], List[Graph]]:
    """Taylor-mode AD of ``graphs`` keyed by derivative order (utility.jl:48-93).

    - ``deriv_orders[i]``: max derivative order of variable i
    - ``leaf_dep_funcs[i]``: predicate on leaf ``properties`` deciding whether
      a leaf depends on variable i

    Returns {order-tuple: [coefficient graphs, one per input graph]}.
    """
    if len(deriv_orders) != len(leaf_dep_funcs):
        raise ValueError("deriv_orders and leaf_dep_funcs must have equal length")
    if dict_graphs is None:
        dict_graphs = {}

    set_variables(_variable_names(len(deriv_orders)), orders=list(deriv_orders))
    var_dependence: Dict[int, List[bool]] = {}
    visited = set()
    for diag in graphs:
        for leaf in diag.leaves():
            if leaf.id in visited:
                continue
            visited.add(leaf.id)
            var_dependence[leaf.id] = [bool(f(leaf.properties)) for f in leaf_dep_funcs]

    series_vec, _ = taylorexpansion_graphs(graphs, var_dependence)
    for series in series_vec:
        for orders, graph in series.coeffs.items():
            dict_graphs.setdefault(tuple(orders), []).append(graph)
    return dict_graphs
