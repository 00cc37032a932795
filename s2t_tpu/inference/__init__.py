from s2t_tpu.inference.beam_search import beam_search  # noqa: F401
from s2t_tpu.inference.ctc_decoder import CTCDecoder  # noqa: F401
from s2t_tpu.inference.generator import SequenceGenerator  # noqa: F401
