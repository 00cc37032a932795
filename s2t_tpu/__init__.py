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
