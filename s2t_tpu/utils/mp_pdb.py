"""Multiprocessing-safe pdb (reference: fairseq/pdb.py:23-47).

The data-loader worker pool and any spawned prep subprocesses inherit a
closed/duplicated stdin; plain ``pdb.set_trace()`` there either crashes or
fights siblings for the terminal.  This wrapper (a) reopens the parent's
stdin by file descriptor around each interaction and (b) serialises entry
with a multiprocessing lock so only one process owns the prompt at a time.

Usage: ``from s2t_tpu.utils import mp_pdb; mp_pdb.set_trace()``
"""

from __future__ import annotations

import multiprocessing
import os
import pdb
import sys

__all__ = ["set_trace"]

_stdin = [None]
_stdin_lock = multiprocessing.Lock()
try:
    _stdin_fd = sys.stdin.fileno()
except Exception:
    _stdin_fd = None


class MultiprocessingPdb(pdb.Pdb):
    def __init__(self):
        pdb.Pdb.__init__(self, nosigint=True)

    def _cmdloop(self):
        stdin_bak = sys.stdin
        with _stdin_lock:
            try:
                if _stdin_fd is not None:
                    if not _stdin[0]:
                        _stdin[0] = os.fdopen(_stdin_fd)
                    sys.stdin = _stdin[0]
                self.cmdloop()
            finally:
                sys.stdin = stdin_bak


def set_trace():
    pdb_instance = MultiprocessingPdb()
    pdb_instance.set_trace(sys._getframe().f_back)
