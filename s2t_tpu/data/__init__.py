from s2t_tpu.data.dictionary import Dictionary  # noqa: F401
