class CTCPrefixScore:
    def __init__(self, *a, **kw):
        raise NotImplementedError("espnet shim: not used in parity harness")


class CTCPrefixScoreTH:
    def __init__(self, *a, **kw):
        raise NotImplementedError("espnet shim")
