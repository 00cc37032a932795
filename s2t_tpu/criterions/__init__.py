"""Criterions: pure functions (model_out, batch, cfg) -> (loss, sample_size, logs).

Importing registers all criterions.
"""

from s2t_tpu.criterions import label_smoothed_ce  # noqa: F401
from s2t_tpu.criterions import latency  # noqa: F401
from s2t_tpu.criterions import composite  # noqa: F401
from s2t_tpu.criterions import adaptive_loss  # noqa: F401
from s2t_tpu.criterions import ctc  # noqa: F401
from s2t_tpu.criterions import masked_lm  # noqa: F401
from s2t_tpu.criterions import nat_loss  # noqa: F401
from s2t_tpu.criterions import wav2vec  # noqa: F401
from s2t_tpu.criterions.build import build_criterion  # noqa: F401
