def compose(*a, **kw):
    raise NotImplementedError("hydra shim: compose not supported")


def initialize(*a, **kw):
    raise NotImplementedError("hydra shim: initialize not supported")
