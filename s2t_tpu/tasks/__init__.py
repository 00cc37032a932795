"""Tasks. Importing registers all tasks."""

from s2t_tpu.tasks import audio_pretraining  # noqa: F401
from s2t_tpu.tasks import denoising  # noqa: F401
from s2t_tpu.tasks import language_modeling  # noqa: F401
from s2t_tpu.tasks import masked_lm  # noqa: F401
from s2t_tpu.tasks import multilingual_translation  # noqa: F401
from s2t_tpu.tasks import sentence_prediction  # noqa: F401
from s2t_tpu.tasks import speech_to_text  # noqa: F401
from s2t_tpu.tasks import translation  # noqa: F401
from s2t_tpu.tasks import translation_lev  # noqa: F401
from s2t_tpu.tasks.base import Task, setup_task  # noqa: F401
