"""torchaudio shim: only the symbols fairseq's import graph touches.
Audio IO is never exercised in the parity harness (features are synthetic)."""


def load(*a, **kw):
    raise NotImplementedError("torchaudio shim")


class sox_effects:
    @staticmethod
    def apply_effects_tensor(*a, **kw):
        raise NotImplementedError("torchaudio shim")


class compliance:
    class kaldi:
        @staticmethod
        def fbank(*a, **kw):
            raise NotImplementedError("torchaudio shim")
