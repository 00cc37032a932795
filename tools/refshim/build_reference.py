"""Build reference (fairseq) models in-process for parity testing.

Requires sys.path to include tools/refshim (this dir) BEFORE /root/reference,
and `import refcompat` before any fairseq import (py3.12 dataclass compat).
Only used by tests; never imported by the framework itself.
"""

from __future__ import annotations

import argparse
import sys


REFSHIM = __file__.rsplit("/", 1)[0]
REFERENCE = "/root/reference"


def setup_paths():
    if REFSHIM not in sys.path:
        sys.path.insert(0, REFSHIM)
    if REFERENCE not in sys.path:
        sys.path.insert(1, REFERENCE)
    import refcompat  # noqa: F401

    # checkpoint_utils._upgrade_state_dict always converts args→omegaconf
    # (checkpoint_utils.py:553), which needs real hydra; the harness only
    # reads state["model"]/state["args"], so stub the conversion out
    try:
        from fairseq import checkpoint_utils as _cu

        _cu.convert_namespace_to_omegaconf = lambda args: None
    except Exception:
        pass


def make_dictionary(symbols=("aa", "bb", "cc", "dd")):
    setup_paths()
    from fairseq.data import Dictionary

    d = Dictionary()
    for s in symbols:
        d.add_symbol(s)
    return d


def build_s2t_model(arch="s2t_transformer_s", dictionary=None, seed=0,
                    **arg_overrides):
    """Construct a reference S2TTransformerModel with given arch preset.

    Returns (model.eval(), args, dictionary).
    """
    setup_paths()
    import torch
    from fairseq.models.speech_to_text import s2t_transformer as ref_mod

    d = dictionary if dictionary is not None else make_dictionary()

    class _Task:
        target_dictionary = d
        source_dictionary = d

    parser = argparse.ArgumentParser()
    group = parser.add_argument_group("model", argument_default=argparse.SUPPRESS)
    ref_mod.S2TTransformerModel.add_args(group)
    args = parser.parse_args([])
    args.max_source_positions = 6000
    args.max_target_positions = 1024
    args.input_feat_per_channel = 80
    args.input_channels = 1
    for k, v in arg_overrides.items():
        setattr(args, k, v)
    arch_fn = getattr(ref_mod, arch)
    arch_fn(args)
    # arch presets only set absent attrs; force explicit overrides to win
    for k, v in arg_overrides.items():
        setattr(args, k, v)
    torch.manual_seed(seed)
    model = ref_mod.S2TTransformerModel.build_model(args, _Task())
    model.eval()
    return model, args, d


def build_pds_model(arch="pdss2t_transformer_s_8", dictionary=None,
                    **arg_overrides):
    """Construct a reference PDSS2TTransformerModel
    (reference: fairseq/models/speech_to_text/pdss2t_transformer.py:147).

    Returns (model.eval(), args, dictionary)."""
    setup_paths()
    import torch
    from fairseq.models.speech_to_text import pdss2t_transformer as ref_mod

    d = dictionary if dictionary is not None else make_dictionary()

    class _Task:
        target_dictionary = d
        source_dictionary = d

        @staticmethod
        def get_source_dictionary(i):
            return d

    parser = argparse.ArgumentParser()
    group = parser.add_argument_group("model", argument_default=argparse.SUPPRESS)
    ref_mod.PDSS2TTransformerModel.add_args(group)
    args = parser.parse_args([])
    args.max_source_positions = 6000
    args.max_target_positions = 1024
    args.input_feat_per_channel = 80
    args.input_channels = 1
    for k, v in arg_overrides.items():
        setattr(args, k, v)
    arch_fn = getattr(ref_mod, arch)
    arch_fn(args)
    for k, v in arg_overrides.items():
        setattr(args, k, v)
    torch.manual_seed(0)
    model = ref_mod.PDSS2TTransformerModel.build_model(args, _Task())
    model.eval()
    return model, args, d


def build_sate_model(arch="s2t_sate_s", dictionary=None, **arg_overrides):
    """Construct a reference S2TSATEModel
    (reference: fairseq/models/speech_to_text/s2t_sate.py:38).

    Returns (model.eval(), args, dictionary)."""
    setup_paths()
    import torch
    from fairseq.models.speech_to_text import s2t_sate as ref_mod

    d = dictionary if dictionary is not None else make_dictionary()

    class _Task:
        target_dictionary = d
        source_dictionary = d

        @staticmethod
        def get_source_dictionary(i):
            return d

    parser = argparse.ArgumentParser()
    group = parser.add_argument_group("model", argument_default=argparse.SUPPRESS)
    ref_mod.S2TSATEModel.add_args(group)
    args = parser.parse_args([])
    args.max_source_positions = 6000
    args.max_target_positions = 1024
    args.input_feat_per_channel = 80
    args.input_channels = 1
    for k, v in arg_overrides.items():
        setattr(args, k, v)
    arch_fn = getattr(ref_mod, arch)
    arch_fn(args)
    for k, v in arg_overrides.items():
        setattr(args, k, v)
    torch.manual_seed(0)
    model = ref_mod.S2TSATEModel.build_model(args, _Task())
    model.eval()
    return model, args, d


def build_s2t_ctc_model(arch="s2t_ctc", dictionary=None, **arg_overrides):
    """Construct a reference encoder-only S2TCTCModel (NAST family;
    reference: fairseq/models/speech_to_text/s2t_ctc.py:28).

    Returns (model.eval(), args, dictionary)."""
    setup_paths()
    import torch
    from fairseq.models.speech_to_text import s2t_ctc as ref_mod

    d = dictionary if dictionary is not None else make_dictionary()

    class _Task:
        target_dictionary = d
        source_dictionary = d

        @staticmethod
        def get_source_dictionary(i):
            return d

    parser = argparse.ArgumentParser()
    group = parser.add_argument_group("model", argument_default=argparse.SUPPRESS)
    ref_mod.S2TCTCModel.add_args(group)
    args = parser.parse_args([])
    args.max_source_positions = 6000
    args.max_target_positions = 1024
    args.input_feat_per_channel = 80
    args.input_channels = 1
    for k, v in arg_overrides.items():
        setattr(args, k, v)
    arch_fn = getattr(ref_mod, arch, None)
    if arch_fn is None:
        from fairseq.models.speech_to_text.s2t_ctc import base_architecture
        arch_fn = base_architecture
    arch_fn(args)
    for k, v in arg_overrides.items():
        setattr(args, k, v)
    torch.manual_seed(0)
    model = ref_mod.S2TCTCModel.build_model(args, _Task())
    model.eval()
    return model, args, d


def build_convtransformer_model(arch="convtransformer", dictionary=None,
                                **arg_overrides):
    """Construct a reference ConvTransformerModel
    (reference: fairseq/models/speech_to_text/convtransformer.py:25).

    Returns (model.eval(), args, dictionary)."""
    setup_paths()
    import torch
    from fairseq.models.speech_to_text import convtransformer as ref_mod

    d = dictionary if dictionary is not None else make_dictionary()

    class _Task:
        target_dictionary = d
        source_dictionary = d

    parser = argparse.ArgumentParser()
    group = parser.add_argument_group("model", argument_default=argparse.SUPPRESS)
    ref_mod.ConvTransformerModel.add_args(group)
    args = parser.parse_args([])
    args.max_source_positions = 3000
    args.max_target_positions = 1024
    args.input_feat_per_channel = 80
    args.input_channels = 1
    for k, v in arg_overrides.items():
        setattr(args, k, v)
    arch_fn = getattr(ref_mod, arch, ref_mod.base_architecture)
    arch_fn(args)
    for k, v in arg_overrides.items():
        setattr(args, k, v)
    # S2T-fork TransformerDecoder reads fork-only args convtransformer's
    # add_args never defines (transformer.py:878 use_dec_dlcl etc.)
    for k, v in (
        ("use_dec_dlcl", False), ("decoder_attention_type", "selfattn"),
        ("max_decoder_relative_length", -1), ("decoder_concat_after", False),
        ("cross_self_attention", False), ("checkpoint_activations", False),
        ("offload_activations", False), ("decoder_layerdrop", 0.0),
    ):
        if not hasattr(args, k):
            setattr(args, k, v)
    torch.manual_seed(0)
    model = ref_mod.ConvTransformerModel.build_model(args, _Task())
    model.eval()
    return model, args, d


def build_berard_model(arch="berard_256_3_3", dictionary=None,
                       **arg_overrides):
    """Construct a reference BerardModel (LSTM ST baseline;
    reference: fairseq/models/speech_to_text/berard.py:20).

    Returns (model.eval(), args, dictionary)."""
    setup_paths()
    import importlib

    import torch

    # `berard` in the package namespace is the registered arch FUNCTION;
    # fetch the module itself
    ref_mod = importlib.import_module("fairseq.models.speech_to_text.berard")

    d = dictionary if dictionary is not None else make_dictionary()

    class _Task:
        target_dictionary = d
        source_dictionary = d

    parser = argparse.ArgumentParser()
    group = parser.add_argument_group("model", argument_default=argparse.SUPPRESS)
    ref_mod.BerardModel.add_args(group)
    args = parser.parse_args([])
    args.input_feat_per_channel = 80
    args.input_channels = 1
    for k, v in arg_overrides.items():
        setattr(args, k, v)
    arch_fn = getattr(ref_mod, arch)
    arch_fn(args)
    for k, v in arg_overrides.items():
        setattr(args, k, v)
    torch.manual_seed(0)
    model = ref_mod.BerardModel.build_model(args, _Task())
    model.eval()
    return model, args, d


def build_dual_model(arch="base_architecture", dictionary=None, **arg_overrides):
    """Construct a reference S2TDualModel
    (reference: fairseq/models/speech_to_text/s2t_dual.py:36).

    NOTE the upstream forward is bit-rotted (S2TDualEncoder.forward:334
    passes the speech tensor as ``return_all_hiddens`` and the padding mask
    as ``token_embeddings``); use ``dual_repaired_encoder_forward`` for the
    evidently-intended set_s2 wiring.  Returns (model.eval(), args, dict)."""
    setup_paths()
    import torch
    from fairseq.models.speech_to_text import s2t_dual as ref_mod

    d = dictionary if dictionary is not None else make_dictionary()

    class _Task:
        target_dictionary = d
        source_dictionary = d

        @staticmethod
        def get_source_dictionary(i):
            return d

    parser = argparse.ArgumentParser()
    group = parser.add_argument_group("model", argument_default=argparse.SUPPRESS)
    ref_mod.S2TDualModel.add_args(group)
    args = parser.parse_args([])
    args.max_source_positions = 6000
    args.max_target_positions = 1024
    args.input_feat_per_channel = 80
    args.input_channels = 1
    for k, v in arg_overrides.items():
        setattr(args, k, v)
    arch_fn = getattr(ref_mod, arch, ref_mod.base_architecture)
    arch_fn(args)
    for k, v in arg_overrides.items():
        setattr(args, k, v)
    torch.manual_seed(0)
    model = ref_mod.S2TDualModel.build_model(args, _Task())
    model.eval()
    return model, args, d


def dual_repaired_encoder_forward(encoder, speech, speech_lengths, text,
                                  text_lengths):
    """The evidently-intended S2TDualEncoder wiring: feed the speech stream
    to the MT encoder through its set_s2 hook (transformer_s2.py:70) instead
    of the broken 4-positional call (s2t_dual.py:334)."""
    asr_out = encoder.asr_encoder(speech, speech_lengths)
    rep = asr_out["encoder_out"][0]
    mask = asr_out["encoder_padding_mask"][0]
    encoder.mt_encoder.set_s2(rep, mask)
    try:
        out = encoder.mt_encoder(text, text_lengths)
    finally:
        encoder.mt_encoder.set_s2(None, None)
    out["ctc_logit"] = asr_out["ctc_logit"]
    out["ctc_padding_mask"] = asr_out["encoder_padding_mask"]
    return out


def build_multibranch_model(arch="base_architecture", dictionary=None,
                            **arg_overrides):
    """Construct a reference S2TMultiBranchModel
    (reference: fairseq/models/speech_to_text/s2t_multibranch.py:43).

    Returns (model.eval(), args, dictionary)."""
    setup_paths()
    import torch
    from fairseq.models.speech_to_text import s2t_multibranch as ref_mod

    d = dictionary if dictionary is not None else make_dictionary()

    class _Task:
        target_dictionary = d
        source_dictionary = d

        @staticmethod
        def get_source_dictionary(i):
            return d

    parser = argparse.ArgumentParser()
    group = parser.add_argument_group("model", argument_default=argparse.SUPPRESS)
    ref_mod.S2TMultiBranchModel.add_args(group)
    args = parser.parse_args([])
    args.max_source_positions = 6000
    args.max_target_positions = 1024
    args.input_feat_per_channel = 80
    args.input_channels = 1
    for k, v in arg_overrides.items():
        setattr(args, k, v)
    arch_fn = getattr(ref_mod, arch, ref_mod.base_architecture)
    arch_fn(args)
    for k, v in arg_overrides.items():
        setattr(args, k, v)
    torch.manual_seed(0)
    model = ref_mod.S2TMultiBranchModel.build_model(args, _Task())
    model.eval()
    return model, args, d


def build_mt_model(arch="transformer_iwslt_de_en", dictionary=None,
                   **arg_overrides):
    """Construct a reference MT TransformerModel (fairseq/models/transformer.py).

    Returns (model.eval(), args, dictionary)."""
    setup_paths()
    import torch
    from fairseq.models import transformer as ref_mt

    d = dictionary if dictionary is not None else make_dictionary()

    class _Task:
        target_dictionary = d
        source_dictionary = d

    parser = argparse.ArgumentParser()
    group = parser.add_argument_group("model", argument_default=argparse.SUPPRESS)
    ref_mt.TransformerModel.add_args(group)
    args = parser.parse_args([])
    args.max_source_positions = 1024
    args.max_target_positions = 1024
    for k, v in arg_overrides.items():
        setattr(args, k, v)
    arch_fn = getattr(ref_mt, arch)
    arch_fn(args)
    for k, v in arg_overrides.items():
        setattr(args, k, v)
    torch.manual_seed(0)
    model = ref_mt.TransformerModel.build_model(args, _Task())
    model.eval()
    return model, args, d


def build_lm_model(arch="transformer_lm", dictionary=None, **arg_overrides):
    """Construct a reference decoder-only TransformerLanguageModel
    (fairseq/models/transformer_lm.py:172 — the --lm-path shallow-fusion /
    eval_lm model).  Returns (model.eval(), args, dictionary)."""
    setup_paths()
    import torch
    from fairseq.models import ARCH_CONFIG_REGISTRY
    from fairseq.models import transformer_lm as ref_lm

    d = dictionary if dictionary is not None else make_dictionary()

    class _Task:
        target_dictionary = d
        source_dictionary = d
        dictionary = d

    parser = argparse.ArgumentParser()
    group = parser.add_argument_group("model", argument_default=argparse.SUPPRESS)
    ref_lm.TransformerLanguageModel.add_args(group)
    args = parser.parse_args([])
    args.tokens_per_sample = 1024
    args.max_target_positions = 1024
    for k, v in arg_overrides.items():
        setattr(args, k, v)
    ARCH_CONFIG_REGISTRY[arch](args)
    for k, v in arg_overrides.items():
        setattr(args, k, v)
    # the S2T fork's TransformerDecoder reads fork-added attrs the LM arch
    # functions were never updated to set (transformer.py:878 use_dec_dlcl)
    for k, v in (("use_dec_dlcl", False), ("decoder_history_type", "learnable_dense"),
                 ("max_decoder_relative_length", -1), ("k_only", True)):
        if not hasattr(args, k):
            setattr(args, k, v)
    torch.manual_seed(0)
    model = ref_lm.TransformerLanguageModel.build_model(args, _Task())
    model.eval()
    return model, args, d


def build_w2v2_model(**overrides):
    """Construct a reference Wav2Vec2Model from its dataclass config
    (reference: fairseq/models/wav2vec/wav2vec2.py:222).

    Returns (model.eval(), cfg)."""
    setup_paths()
    import torch
    from fairseq.models.wav2vec.wav2vec2 import Wav2Vec2Config, Wav2Vec2Model

    cfg = Wav2Vec2Config()
    for k, v in overrides.items():
        setattr(cfg, k, v)
    torch.manual_seed(0)
    model = Wav2Vec2Model(cfg)
    model.eval()
    return model, cfg


def load_cpu_sequence_generator():
    """Import the reference SequenceGenerator with its joint-CTC device bug
    patched: sequence_generator.py:379-381 hard-codes ``device="cuda"`` in
    the CTC blending (the upstream repo only ever ran that path on GPU).
    Everything else is the reference's own code, exec'd verbatim."""
    import importlib.util
    import sys as _sys

    setup_paths()
    # make sure dependency modules are importable first
    import fairseq  # noqa: F401

    src_path = REFERENCE + "/fairseq/sequence_generator.py"
    with open(src_path) as f:
        src = f.read()
    patched = src.replace('.to(device="cuda")', ".to(device=lprobs.device)")
    assert patched != src, "device patch no longer applies"
    spec = importlib.util.spec_from_loader("fairseq_seqgen_cpu", loader=None,
                                           origin=src_path)
    mod = importlib.util.module_from_spec(spec)
    mod.__dict__["__file__"] = src_path
    exec(compile(patched, src_path, "exec"), mod.__dict__)
    _sys.modules["fairseq_seqgen_cpu"] = mod
    return mod.SequenceGenerator


def save_fairseq_checkpoint(model, args, path):
    """Write a reference-layout checkpoint (fairseq/checkpoint_utils.py:244).

    Carries the optimizer_history/extra_state stubs the reference's
    _upgrade_state_dict (:453) expects when the checkpoint is re-loaded
    through checkpoint_utils (the pretrained-component path)."""
    import torch

    torch.save(
        {
            "model": model.state_dict(),
            "args": args,
            # explicit None skips _upgrade_state_dict's namespace→omegaconf
            # conversion (needs hydra, which the shim doesn't provide)
            "cfg": None,
            "optimizer_history": [
                {
                    "criterion_name": "LabelSmoothedCrossEntropyCriterion",
                    "optimizer_name": "adam",
                    "lr_scheduler_state": {"best": None},
                    "num_updates": 0,
                }
            ],
            "extra_state": {"train_iterator": {"epoch": 1}},
            "last_optimizer_state": {},
        },
        path,
    )
