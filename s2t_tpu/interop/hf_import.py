"""Hugging Face GPT-2 checkpoint importer.

Maps a ``transformers`` GPT2LMHeadModel state dict onto the
``hf_gpt2`` flax pytree (see s2t_tpu/models/hf_gpt2.py; reference wrapper:
fairseq/models/huggingface/hf_gpt2.py).

Key mapping (HF module → flax path):

  transformer.wte.weight            → decoder/embed_tokens/embedding
  transformer.wpe.weight            → decoder/embed_positions/embedding
  transformer.h.{i}.ln_1            → decoder/layer{i}/self_attn_norm
  transformer.h.{i}.attn.c_attn     → decoder/layer{i}/self_attn/{q,k,v}_proj
  transformer.h.{i}.attn.c_proj     → decoder/layer{i}/self_attn/out_proj
  transformer.h.{i}.ln_2            → decoder/layer{i}/ffn_norm
  transformer.h.{i}.mlp.c_fc / c_proj → decoder/layer{i}/ffn/fc1 / fc2
  transformer.ln_f                  → decoder/final_norm

HF's Conv1D stores weights as (in, out), which is already flax Dense kernel
layout — no transpose.  The LM head is tied to wte (share_input_output_embed).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def convert_gpt2_state(state: Dict[str, Any], num_layers: int) -> Dict[str, Any]:
    """HF GPT2LMHeadModel state_dict (torch tensors or numpy) → flax params."""

    def get(k):
        v = state[k]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    def ln(prefix):
        return {"scale": get(f"{prefix}.weight"), "bias": get(f"{prefix}.bias")}

    dec: Dict[str, Any] = {
        "embed_tokens": {"embedding": get("transformer.wte.weight")},
        "embed_positions": {"embedding": get("transformer.wpe.weight")},
        "final_norm": ln("transformer.ln_f"),
    }
    for i in range(num_layers):
        h = f"transformer.h.{i}"
        w = get(f"{h}.attn.c_attn.weight")  # (E, 3E), Conv1D = (in, out)
        b = get(f"{h}.attn.c_attn.bias")  # (3E,)
        E = w.shape[0]
        qw, kw, vw = w[:, :E], w[:, E : 2 * E], w[:, 2 * E :]
        qb, kb, vb = b[:E], b[E : 2 * E], b[2 * E :]
        dec[f"layer{i}"] = {
            "self_attn_norm": ln(f"{h}.ln_1"),
            "self_attn": {
                "q_proj": {"kernel": qw, "bias": qb},
                "k_proj": {"kernel": kw, "bias": kb},
                "v_proj": {"kernel": vw, "bias": vb},
                "out_proj": {
                    "kernel": get(f"{h}.attn.c_proj.weight"),
                    "bias": get(f"{h}.attn.c_proj.bias"),
                },
            },
            "ffn_norm": ln(f"{h}.ln_2"),
            "ffn": {
                "fc1": {
                    "kernel": get(f"{h}.mlp.c_fc.weight"),
                    "bias": get(f"{h}.mlp.c_fc.bias"),
                },
                "fc2": {
                    "kernel": get(f"{h}.mlp.c_proj.weight"),
                    "bias": get(f"{h}.mlp.c_proj.bias"),
                },
            },
        }
    return {"decoder": dec}


def import_gpt2(model_name_or_path: str):
    """Load a transformers GPT-2 checkpoint from disk and convert.

    Returns (params, HFGPT2Config).  Requires the files locally (this
    environment has no network egress); accepts anything
    ``GPT2LMHeadModel.from_pretrained`` accepts.
    """
    from transformers import GPT2LMHeadModel

    from s2t_tpu.models.hf_gpt2 import HFGPT2Config

    hf = GPT2LMHeadModel.from_pretrained(model_name_or_path)
    c = hf.config
    cfg = HFGPT2Config(
        decoder_embed_dim=c.n_embd,
        decoder_ffn_embed_dim=(c.n_inner or 4 * c.n_embd),
        decoder_layers=c.n_layer, decoder_attention_heads=c.n_head,
        vocab_size=c.vocab_size, max_target_positions=c.n_positions,
    )
    return convert_gpt2_state(hf.state_dict(), c.n_layer), cfg
