"""GV table loading entry points (implementation landing next)."""


def diagsGV(*args, **kwargs):
    raise NotImplementedError("GV reader not yet implemented")


def diagsGV_ver4(*args, **kwargs):
    raise NotImplementedError("GV reader not yet implemented")
