"""GV .diag table parser (implementation landing next; see reference
GV_diagrams/readfile.jl)."""


def read_diagrams(*args, **kwargs):
    raise NotImplementedError("GV reader not yet implemented")


def read_vertex4_diagrams(*args, **kwargs):
    raise NotImplementedError("GV reader not yet implemented")
