"""Corpus-layout scanners feeding the generic audio prep pipeline."""

from s2t_tpu.data.prep.corpora import (  # noqa: F401
    CORPORA,
    decode_audio,
    scan_covost,
    scan_librispeech,
    scan_mtedx,
    scan_mustc,
)
