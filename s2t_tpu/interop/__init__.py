from s2t_tpu.interop.fairseq_import import (  # noqa: F401
    convert_s2t_transformer,
    infer_config_from_args,
    load_fairseq_checkpoint,
)
