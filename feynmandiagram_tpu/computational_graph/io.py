"""String representations for graphs (reference io.jl:76-114)."""
from __future__ import annotations


def _op_symbol(op) -> str:
    return {"sum": "⨁", "prod": "ⓧ", "unitary": "\U0001d7d9"}.get(op.kind, f"^{op.n}")


def stringrep(g, *, with_properties: bool = True) -> str:
    pieces = [str(g.id)]
    if g.name:
        pieces.append(f"{g.name}")
    if with_properties and g.properties is not None:
        pieces.append(f"[{g.properties}]")
    head = ",".join(pieces)
    if not g.subgraphs:
        return f"{head}={g.weight}"
    children = ",".join(str(s.id) for s in g.subgraphs)
    return f"{head}={g.weight}={_op_symbol(g.operator)} ({children})"


def show_tree(g, depth: int = 0, maxdepth: int = 6, _printed=None) -> str:
    """ASCII tree rendering for debugging (DOT export lives in backends.to_dot)."""
    if _printed is None:
        _printed = set()
    pad = "  " * depth
    line = pad + stringrep(g)
    out = [line]
    if depth < maxdepth and g.id not in _printed:
        _printed.add(g.id)
        for sub in g.subgraphs:
            out.append(show_tree(sub, depth + 1, maxdepth, _printed))
    return "\n".join(out)


def plot_tree(g, maxdepth: int = 6) -> str:
    """Print an ASCII rendering of the graph tree (the reference's ete3-based
    plot_tree, io.jl:126-175, maps to this + the DOT export in backends)."""
    out = show_tree(g, maxdepth=maxdepth)
    print(out)
    return out
