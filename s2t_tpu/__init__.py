"""s2t_tpu — a TPU-native speech-to-text framework (JAX / XLA / Pallas / pjit).

A from-scratch rebuild of the capabilities of the fairseq-based S2T toolkit
(reference: /root/reference) designed TPU-first:

- functional flax models compiled once with ``jax.jit`` / ``pjit``
- a single device-``Mesh`` ("data", "model", "seq") parallelism layer instead of
  five DDP wrappers (reference: fairseq/models/distributed_fairseq_model.py)
- CTC loss / Viterbi alignment / prefix scoring as ``lax.scan`` lattice
  recurrences on device (reference: fairseq/torch_imputer/*.cu)
- Kaldi-compatible log-mel fbank computed on device (reference:
  fairseq/data/audio/audio_utils.py host path)
- beam search as a jitted ``lax.scan`` with preallocated KV caches
  (reference: fairseq/sequence_generator.py)
"""

__version__ = "0.1.0"

import os as _os

if not _os.environ.get("S2T_USE_SHARDY"):
    # Work around a Shardy partitioner miscompilation (jax 0.9.0): the
    # kernel gradient of a strided conv whose output carries a sharding
    # constraint (e.g. the subsampler output constrained to
    # P("data","seq") under sequence parallelism) is silently multiplied
    # by the size of an idle mesh axis on meshes with >= 3 axes.
    # Repro + regression test: tests/test_partitioner_numerics.py.
    # The legacy GSPMD propagation computes it correctly; pin it until a
    # fixed jax/XLA lands (escape hatch: S2T_USE_SHARDY=1).
    import jax as _jax

    _jax.config.update("jax_use_shardy_partitioner", False)
