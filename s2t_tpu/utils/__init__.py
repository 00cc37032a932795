from s2t_tpu.utils.masking import (  # noqa: F401
    lengths_to_mask,
    lengths_to_padding_mask,
    mask_to_lengths,
)
