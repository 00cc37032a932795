from s2t_tpu.ops.ctc import (  # noqa: F401
    ctc_loss,
    ctc_best_alignment,
    ctc_greedy_decode,
    imputer_loss,
)
