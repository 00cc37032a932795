from s2t_tpu.data.audio.fbank import fbank_jax, fbank_numpy, num_frames  # noqa: F401
