"""Utilities: profiling hooks, distributed bring-up, cost metrics."""
from .profiling import trace, lowered_cost
from .distributed import initialize_distributed
