"""Compiler back-end tests (reference test/compiler.jl): generated source
evaluates to the same value as the interpreter; DOT export wellformedness."""
import numpy as np
import pytest

from feynmandiagram_tpu.computational_graph import Graph, PROD, SUM, Power, eval_graph
from feynmandiagram_tpu.backends import (compile_python, to_julia_str, to_c_str,
                                         to_dot_str, to_python_str)


def _example():
    x = Graph([], properties="x")
    y = Graph([], properties="y")
    s = Graph([x, y], subgraph_factors=[2.0, 3.0], operator=SUM)
    p = Graph([s, x], subgraph_factors=[1.0, -1.0], operator=PROD)
    pw = Graph([s], subgraph_factors=[0.5], operator=Power(3))
    root1 = Graph([p, pw], subgraph_factors=[1.0, 2.0], operator=SUM)
    root2 = s
    return [root1, root2], x, y


class TestSourceExports:
    def test_python_export_matches_interpreter(self):
        roots, x, y = _example()
        fn, leafmap = compile_python(roots, framework="numpy")
        vals = {x.id: 1.3, y.id: -0.7}
        leaf_arr = np.zeros((len(leafmap), 4))
        for uid, idx in leafmap.items():
            leaf_arr[idx] = vals[uid]
        out = fn(leaf_arr)
        expected = [eval_graph(r, {u: i for u, i in leafmap.items()},
                               [vals[u] for u, i in sorted(leafmap.items(), key=lambda kv: kv[1])])
                    for r in roots]
        np.testing.assert_allclose(out[:, 0], expected, rtol=1e-12)

    def test_julia_export_structure(self):
        roots, *_ = _example()
        src, leafmap = to_julia_str(roots)
        assert src.startswith("function eval_graph!")
        assert "root[1]" in src and "root[2]" in src
        assert f"leafVal[1]" in src

    def test_c_export_structure(self):
        roots, *_ = _example()
        src, leafmap = to_c_str(roots)
        assert "#include <math.h>" in src
        assert "pow(" in src
        assert "root[0]" in src

    def test_c_export_compiles_and_runs(self, tmp_path):
        import ctypes
        import subprocess

        roots, x, y = _example()
        src, leafmap = to_c_str(roots)
        cfile = tmp_path / "eval.c"
        sofile = tmp_path / "eval.so"
        cfile.write_text(src)
        subprocess.run(["gcc", "-O2", "-shared", "-fPIC", str(cfile), "-o",
                        str(sofile), "-lm"], check=True)
        lib = ctypes.CDLL(str(sofile))
        lib.eval_graph.argtypes = [ctypes.POINTER(ctypes.c_double),
                                   ctypes.POINTER(ctypes.c_double)]
        vals = {x.id: 0.9, y.id: 2.1}
        leaf = (ctypes.c_double * len(leafmap))()
        for uid, idx in leafmap.items():
            leaf[idx] = vals[uid]
        out = (ctypes.c_double * len(roots))()
        lib.eval_graph(out, leaf)
        leafvec = [0.0] * len(leafmap)
        for uid, idx in leafmap.items():
            leafvec[idx] = vals[uid]
        expected = [eval_graph(r, leafmap, leafvec) for r in roots]
        np.testing.assert_allclose(list(out), expected, rtol=1e-12)

    def test_dot_export(self):
        roots, *_ = _example()
        dot = to_dot_str(roots)
        assert dot.startswith("digraph")
        assert dot.rstrip().endswith("}")
        assert "->" in dot

    def test_plot_tree_graphical(self, tmp_path):
        """Graphical tree rendering (reference io.jl:126-175 plot_tree via
        ete3 -> matplotlib here): writes a non-trivial image file."""
        from feynmandiagram_tpu.computational_graph import plot_tree_graphical

        roots, *_ = _example()
        out = tmp_path / "tree.png"
        plot_tree_graphical(roots[0], str(out))
        assert out.exists() and out.stat().st_size > 2000
