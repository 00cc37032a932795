from s2t_tpu.optim.builders import build_lr_schedule, build_optimizer  # noqa: F401
