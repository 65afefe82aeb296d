"""Scale-out: device meshes and sample-axis data parallelism.

The Monte-Carlo sample axis is embarrassingly parallel — each chip
evaluates its own sample shard through the identical lowered graph, and
observable estimates reduce with one ``psum`` over ICI.  Level-partitioned
evaluation of DAGs too large for one chip (BASELINE config 5) builds on the
same mesh and is the next scaling stage.
"""
from .sharding import (make_sample_mesh, shard_compiled, make_mc_step,
                       BATCH_AXIS)
from .graph_shard import (make_graph_sharded_evaluator,
                          make_graph_sharded_mc_step, GRAPH_AXIS)
