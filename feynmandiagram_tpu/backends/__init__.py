"""Back ends: fused jitted evaluation, IR artifacts, and source exports.

The reference's Compilers module (Julia/C/Python emitters + DOT) maps to:
- ``compile_evaluator``: the in-process jitted batched evaluator (production)
- ``export_artifact`` / ``load_artifact``: the serialized flat-IR checkpoint
- ``to_python_str`` / ``to_julia_str`` / ``to_c_str`` / ``to_stablehlo``:
  source exports for interop
- ``to_dot_str`` / ``compile_dot``: Graphviz export
"""
from .compile import (CompiledEvaluator, compile_evaluator, export_artifact,
                      load_artifact, leafmap_of, leaf_graphs_of)
from .source import (to_python_str, to_julia_str, to_c_str, to_stablehlo,
                     compile_python, compile_julia, compile_c)
from .to_dot import to_dot_str, compile_dot
