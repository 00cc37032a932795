"""Model zoo. Importing this package registers all models/archs."""

from s2t_tpu.models import bart  # noqa: F401
from s2t_tpu.models import berard  # noqa: F401
from s2t_tpu.models import cmlm_transformer  # noqa: F401
from s2t_tpu.models import fconv  # noqa: F401
from s2t_tpu.models import hf_gpt2  # noqa: F401
from s2t_tpu.models import insertion_transformer  # noqa: F401
from s2t_tpu.models import levenshtein_transformer  # noqa: F401
from s2t_tpu.models import lightconv  # noqa: F401
from s2t_tpu.models import lstm  # noqa: F401
from s2t_tpu.models import multilingual_transformer  # noqa: F401
from s2t_tpu.models import pds  # noqa: F401
from s2t_tpu.models import roberta  # noqa: F401
from s2t_tpu.models import s2t_ctc  # noqa: F401
from s2t_tpu.models import s2t_transformer  # noqa: F401
from s2t_tpu.models import s2t_dual  # noqa: F401
from s2t_tpu.models import s2t_multibranch  # noqa: F401
from s2t_tpu.models import sate  # noqa: F401
from s2t_tpu.models import streaming  # noqa: F401
from s2t_tpu.models import s2t_w2v2_transformer  # noqa: F401
from s2t_tpu.models import transformer  # noqa: F401
from s2t_tpu.models import transformer_align  # noqa: F401
from s2t_tpu.models import transformer_lm  # noqa: F401
from s2t_tpu.models import wav2vec  # noqa: F401
from s2t_tpu.models import wav2vec2  # noqa: F401
from s2t_tpu.models.build import build_model  # noqa: F401
