"""Import-time compatibility for running the reference fairseq on py3.12.

The reference targets older Pythons where ``field: Cfg = Cfg()`` mutable
defaults were legal.  Python 3.11+ rejects any default whose type is
unhashable.  Patch dataclasses._get_field to rewrite such defaults into
default_factory lambdas.  Import this module BEFORE importing fairseq.
"""
import copy
import dataclasses

_orig_get_field = dataclasses._get_field


def _get_field(cls, a_name, a_type, default_kw_only):
    try:
        return _orig_get_field(cls, a_name, a_type, default_kw_only)
    except ValueError:
        default = getattr(cls, a_name)
        setattr(
            cls, a_name,
            dataclasses.field(default_factory=lambda d=default: copy.deepcopy(d)),
        )
        return _orig_get_field(cls, a_name, a_type, default_kw_only)


dataclasses._get_field = _get_field

# torch>=2.6 flipped torch.load's weights_only default to True; the
# reference's checkpoint_utils loads argparse.Namespace metadata, which the
# weights-only unpickler rejects.  Restore the old default for the parity
# harness (we only ever load checkpoints the harness itself just wrote).
import torch as _torch  # noqa: E402

_orig_load = _torch.load


def _load_compat(*args, **kwargs):
    kwargs.setdefault("weights_only", False)
    return _orig_load(*args, **kwargs)


_torch.load = _load_compat
