"""Minimal omegaconf shim — just enough to import the reference fairseq
package for checkpoint-parity testing.  Not a functional omegaconf."""
from contextlib import contextmanager


class _Missing:
    def __repr__(self):
        return "???"


MISSING = "???"


def II(key):
    return "${" + key + "}"


def SI(s):
    return s


class Container(dict):
    pass


class DictConfig(dict):
    def __init__(self, content=None, **kw):
        super().__init__(content or {})

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)

    def __setattr__(self, k, v):
        self[k] = v


class ListConfig(list):
    pass


@contextmanager
def open_dict(cfg):
    yield cfg


@contextmanager
def read_write(cfg):
    yield cfg


class OmegaConf:
    @staticmethod
    def create(obj=None):
        if isinstance(obj, dict):
            return DictConfig(obj)
        return DictConfig({})

    @staticmethod
    def structured(obj):
        return obj

    @staticmethod
    def merge(*objs):
        out = DictConfig({})
        for o in objs:
            if isinstance(o, dict):
                out.update(o)
        return out

    @staticmethod
    def to_container(cfg, resolve=False, enum_to_str=False):
        return dict(cfg)

    @staticmethod
    def is_config(obj):
        return isinstance(obj, (DictConfig, ListConfig))

    @staticmethod
    def set_struct(cfg, flag):
        pass

    @staticmethod
    def is_missing(cfg, key):
        return cfg.get(key, MISSING) == MISSING
