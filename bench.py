"""Benchmark: generation RTF (headline) + training throughput/MFU + WER sanity.

Prints ONE JSON line:
  {"metric": "rtf_beam5_s2t_transformer_s", "value": <RTF>, "unit":
   "x_realtime", "vs_baseline": <RTF / 10>, "extra": {...}}

Three sections (all on the one real chip):
  A. Generation RTF — s2t_transformer_s-equivalent (256d, 12 enc / 6 dec,
     10k vocab), 10 s utterances, beam 5: the reference MuST-C tst-COMMON
     decode regime (egs/mustc/st/run.sh beam 5 lenpen 1.0).  RTF =
     audio-seconds decoded per wall-second.  Baseline = the 10x-realtime
     north star (BASELINE.json); vs_baseline = RTF / 10.
  B. Training throughput — the full jitted train step (fwd + CTC/CE loss +
     bwd + adam) on the same arch in bf16; reports frames/sec, tokens/sec
     and MFU against the chip's advertised peak (XLA cost analysis).
  C. WER sanity — overfits a tiny deterministic synthetic corpus on-device
     and decodes it: proves the decode path produces *correct text*, not
     just fast tensors (VERDICT r1: "perf without quality is half a
     benchmark").
"""

import json
import time

import numpy as np


def bench_generation(jax, jnp):
    from s2t_tpu.inference.generator import SequenceGenerator
    from s2t_tpu.models.s2t_transformer import S2TTransformerModel, s2t_transformer_s

    # serving-throughput configuration: bigger batches amortize the
    # sequential decode steps (measured on v5e: B=16 -> 103 utt/s,
    # B=64 -> 124 utt/s, B=256 -> 137 utt/s)
    B, T, N_BATCHES = 256, 1000, 2  # 512 utts x 10 s
    VOCAB, BEAM, MAX_LEN = 10000, 5, 100

    cfg = s2t_transformer_s(
        vocab_size=VOCAB, dtype_str="bfloat16", max_target_positions=1024
    )
    model = S2TTransformerModel(cfg)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(B, T, 80)).astype(np.float32))
    lens = jnp.full((B,), T, jnp.int32)
    params = model.init(
        jax.random.PRNGKey(0), feats, lens, jnp.zeros((B, 4), jnp.int32)
    )["params"]
    gen = SequenceGenerator(
        model, beam_size=BEAM, max_len_a=0.0, max_len_b=MAX_LEN, lenpen=1.0
    )
    tokens, _, _ = gen.generate(params, {"features": feats, "feat_lengths": lens})
    np.asarray(tokens)  # force completion (compile + warmup)

    batches = [
        jnp.asarray(rng.normal(size=(B, T, 80)).astype(np.float32))
        for _ in range(N_BATCHES)
    ]
    # force host->device transfer to complete BEFORE the timer: remote
    # runtimes upload lazily and 20 MB/batch over a tunnel skews the decode
    # measurement otherwise
    for f in batches:
        np.asarray(f[0, 0, 0])
    t0 = time.perf_counter()
    for f in batches:
        tokens, _, _ = gen.generate(params, {"features": f, "feat_lengths": lens})
        np.asarray(tokens)
    wall = time.perf_counter() - t0
    n_utts = B * N_BATCHES
    rtf = n_utts * T * 0.01 / wall
    return rtf, {
        "utts_per_sec": round(n_utts / wall, 2),
        "gen_wall_s": round(wall, 3),
        "batch": B, "beam": BEAM, "frames": T,
    }


def bench_nast_generation(jax, jnp):
    """Non-autoregressive serving: encoder-only CTC greedy decode (the NAST
    deployment mode — reference: s2t_ctc.py CTCDecoder) at the same batch/
    shape regime as the AR bench."""
    from s2t_tpu.inference.ctc_decoder import CTCDecoder, CTCGenerator
    from s2t_tpu.models.s2t_ctc import S2TCTCModel, s2t_ctc_base

    B, T, N_BATCHES, VOCAB = 256, 1000, 2, 10000
    cfg = s2t_ctc_base(
        vocab_size=VOCAB, dtype_str="bfloat16", max_target_positions=1024
    )
    model = S2TCTCModel(cfg)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(B, T, 80)).astype(np.float32))
    lens = jnp.full((B,), T, jnp.int32)
    params = model.init(jax.random.PRNGKey(0), feats, lens)["params"]
    gen = CTCGenerator(model, CTCDecoder())
    toks, _, _ = gen.generate(params, {"features": feats, "feat_lengths": lens})
    np.asarray(toks)  # compile + warm
    batches = [
        jnp.asarray(rng.normal(size=(B, T, 80)).astype(np.float32))
        for _ in range(N_BATCHES)
    ]
    for f in batches:
        np.asarray(f[0, 0, 0])
    t0 = time.perf_counter()
    for f in batches:
        toks, _, _ = gen.generate(params, {"features": f, "feat_lengths": lens})
        np.asarray(toks)
    wall = time.perf_counter() - t0
    n = B * N_BATCHES
    return {
        "nast_rtf": round(n * T * 0.01 / wall, 2),
        "nast_utts_per_sec": round(n / wall, 2),
    }


def bench_training(jax, jnp, arch="s2t_transformer_m", prefix="train"):
    """Full train-step throughput + MFU for s2t_transformer_m (bf16) at the
    reference's --max-tokens 40000 regime (BASELINE.md: 40k frames/step).
    The m-model (512d) is the MuST-C/LibriSpeech workhorse; the s-model's
    256-dim matmuls structurally underfill the 128x128 MXU, so its MFU says
    more about the architecture than the implementation."""
    from s2t_tpu.config import OptimizationConfig
    from s2t_tpu.criterions import build_criterion
    from s2t_tpu.models.s2t_transformer import S2TTransformerModel
    from s2t_tpu.registry import ARCHS
    from s2t_tpu.trainer import Trainer

    B, T, U, VOCAB = 40, 1000, 30, 10000
    _, preset = ARCHS.get(arch)
    cfg = preset(
        vocab_size=VOCAB, dtype_str="bfloat16", max_target_positions=1024
    )
    model = S2TTransformerModel(cfg)
    criterion = build_criterion(
        "label_smoothed_cross_entropy_with_ctc", {"ctc": {"ctc_weight": 0.3}}
    )
    trainer = Trainer(
        model, criterion,
        OptimizationConfig(lr=2e-3, warmup_updates=10000, clip_norm=10.0),
    )
    rng = np.random.default_rng(0)
    targets = rng.integers(4, VOCAB, size=(B, U)).astype(np.int32)
    targets[:, -1] = 2
    prev = np.roll(targets, 1, 1)
    prev[:, 0] = 2
    batch = {
        "features": jnp.asarray(rng.normal(size=(B, T, 80)).astype(np.float32)),
        "feat_lengths": jnp.full((B,), T, jnp.int32),
        "prev_tokens": jnp.asarray(prev),
        "target": jnp.asarray(targets),
        "transcript": jnp.asarray(targets[:, :-1]),
        "transcript_lengths": jnp.full((B,), U - 1, jnp.int32),
        "ntokens": float(B * U),
    }
    state = trainer.init_state(batch)
    # K fused updates per dispatch, returning ONLY the final loss: measures
    # pure device training throughput.  (Returning the TrainState per call
    # is pathological over remote-attached runtimes, whose clients fetch all
    # outputs eagerly — ~30 s/step measured; fused loss-only: ~6 ms/step.)
    K = 20
    one = trainer._make_train_step(1)

    @jax.jit
    def run_k(state, batch, rng):
        def body(i, carry):
            s, _ = carry
            s2, m = one(s, batch, rng)
            return (s2, m["loss"])

        _, loss = jax.lax.fori_loop(0, K, body, (state, jnp.zeros((), jnp.float32)))
        return loss

    np.asarray(run_k(state, batch, trainer.base_rng))  # compile + warm
    t0 = time.perf_counter()
    np.asarray(run_k(state, batch, trainer.base_rng))
    wall = time.perf_counter() - t0
    steps_per_sec = K / wall

    # MFU on analytic MODEL flops (dense formulation, bwd = 2x fwd): counting
    # the compiled program's executed flops would penalize optimizations that
    # delete redundant work (s2t_tpu/utils/flops.py); executed flops are
    # reported alongside for transparency.
    dev = str(jax.devices()[0]).lower()
    peak = 275e12 if "v4" in dev else 197e12
    from s2t_tpu.utils.flops import s2t_train_flops

    flops_per_step = s2t_train_flops(
        B, T, U,
        d_model=cfg.encoder_embed_dim, ffn=cfg.encoder_ffn_embed_dim,
        enc_layers=cfg.encoder_layers, dec_layers=cfg.decoder_layers,
        vocab=VOCAB,
    )
    executed = None
    try:
        cost = jax.jit(one).lower(state, batch, jax.random.PRNGKey(0)).compile()
        analysis = cost.cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        executed = float(analysis.get("flops", 0.0)) or None
    except Exception:
        pass
    mfu = flops_per_step * steps_per_sec / peak

    return {
        f"{prefix}_steps_per_sec": round(steps_per_sec, 3),
        f"{prefix}_frames_per_sec": round(steps_per_sec * B * T, 0),
        f"{prefix}_tokens_per_sec": round(steps_per_sec * B * U, 0),
        f"{prefix}_flops_per_step": flops_per_step,
        f"{prefix}_executed_flops_per_step": executed,
        f"{prefix}_mfu" if prefix != "train" else "mfu":
            round(mfu, 4) if mfu is not None else None,
    }


def bench_pipeline(jax, jnp):
    """Train-step throughput fed by the REAL host input pipeline (VERDICT r3
    #5): a genuine on-disk corpus (fbank80.zip + TSV manifest + vocab) read
    through the production path — SpeechToTextTask.load_dataset → zip offset
    reads → bucketed static-shape batching → EpochBatchIterator prefetch
    thread → device — at the same 40k-frame s2t_transformer_m regime as
    section B (reference: egs/mustc/st/conf/basis.yaml max-tokens 40000,
    num-workers 8 DataLoader).

    Reports three numbers so the result is interpretable on any box:
      pipeline_host_frames_per_sec  — what the host pipeline alone sustains
                                      (the ">=967k frames/s" claim under test)
      pipeline_steps_per_sec        — end-to-end train steps/s on THIS box
      pipeline_transfer_mb_per_batch — host->device bytes each step moves
    On a remote-attached chip (axon tunnel, ~30-40 MB/s measured) the
    end-to-end rate is transfer-bound — an environment artifact, not a host
    pipeline property; a real TPU VM moves 12.8 MB/batch over PCIe in ~1 ms.
    pipeline_bound names the LARGEST MEASURED segment (host / put / device),
    where the segments are timestamped within the same timed window so the
    decomposition is exact; pipeline_put_jitter_frac reports the tunnel's
    draw-to-draw transfer variance.
    """
    import io
    import tempfile
    import zipfile
    from pathlib import Path

    from s2t_tpu.config import TrainConfig, from_dict
    from s2t_tpu.tasks import setup_task
    from s2t_tpu.trainer import Trainer

    B_TGT, T, U, VOCAB_WORDS = 40, 1000, 30, 9000
    N_UTTS = 320
    rng = np.random.default_rng(0)

    tmp = tempfile.TemporaryDirectory(prefix="s2t_bench_pipe_")
    root = Path(tmp.name)
    # real corpus layout: stored-entry feature zip + path:offset:length TSV,
    # exactly what cli/prep_audio.py emits (zip_data_offsets semantics)
    zpath = root / "fbank80.zip"
    n_frames = rng.integers(900, T + 1, size=N_UTTS)
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_STORED) as z:
        for i in range(N_UTTS):
            arr = rng.normal(size=(int(n_frames[i]), 80)).astype(np.float32)
            buf = io.BytesIO()
            np.save(buf, arr)
            z.writestr(f"u{i}.npy", buf.getvalue())
    specs = {}
    with zipfile.ZipFile(zpath) as z, open(zpath, "rb") as f:
        for info in z.infolist():
            f.seek(info.header_offset)
            hdr = f.read(30)
            data_off = (info.header_offset + 30
                        + int.from_bytes(hdr[26:28], "little")
                        + int.from_bytes(hdr[28:30], "little"))
            specs[info.filename] = f"fbank80.zip:{data_off}:{info.file_size}"
    words = [f"w{j}" for j in range(VOCAB_WORDS)]
    lines = ["id\taudio\tn_frames\ttgt_text"]
    for i in range(N_UTTS):
        # fixed U-1 words -> one token-bucket shape -> one compile
        text = " ".join(words[k] for k in rng.integers(0, VOCAB_WORDS, U - 1))
        lines.append(f"u{i}\t{specs[f'u{i}.npy']}\t{int(n_frames[i])}\t{text}")
    (root / "train.tsv").write_text("\n".join(lines))
    (root / "dict.txt").write_text("\n".join(f"{w} 1" for w in words))
    (root / "config.yaml").write_text("vocab_filename: dict.txt\n")

    cfg = from_dict(TrainConfig, {
        "task": "speech_to_text",
        "arch": "s2t_transformer_m",
        "criterion": "label_smoothed_cross_entropy_with_ctc",
        "criterion_cfg": {"ctc": {"ctc_weight": 0.3}},
        "model": {"dtype_str": "bfloat16"},
        "dataset": {
            "data": str(root), "max_tokens": B_TGT * T,
            "max_source_positions": T, "max_target_positions": 64,
            "num_buckets": 1, "required_batch_size_multiple": 8,
        },
        "optimization": {"lr": 2e-3, "warmup_updates": 10000,
                         "clip_norm": 10.0},
    })
    task = setup_task(cfg)
    ds = task.load_dataset("train", is_train=True)
    model = task.build_model()
    criterion = task.build_criterion()
    trainer = Trainer(model, criterion, cfg.optimization,
                      forward_fn=task.forward_fn())
    epoch_itr = task.get_batch_iterator(
        ds, max_tokens=cfg.dataset.max_tokens, seed=1, shuffle=True,
        buffer_size=4, batch_size_multiple=1,
    )

    def batches(k):
        got = 0
        while got < k:
            for b in epoch_itr.next_epoch_itr():
                yield b
                got += 1
                if got >= k:
                    return
            epoch_itr.next_epoch()  # roll into the next epoch (train.py loop)

    # --- host pipeline alone: zip reads + collate + prefetch, no device ---
    K_HOST = 24
    next(batches(1))  # touch pages / warm the zip TOC
    t0 = time.perf_counter()
    host_frames = 0
    mb_sum = 0.0
    for b in batches(K_HOST):
        host_frames += int(b["features"].shape[0] * b["features"].shape[1])
        mb_sum += sum(
            v.nbytes for v in b.values() if hasattr(v, "nbytes")) / 1e6
    host_wall = time.perf_counter() - t0
    host_fps = host_frames / host_wall
    mb_per_batch = mb_sum / K_HOST  # mean over the loop, not the last batch

    # --- end to end: same iterator feeding the real jitted train step.
    # K real batches are stacked into ONE host->device transfer and the K
    # updates fused into one dispatch (same methodology as section B: the
    # axon client fetches every per-call output eagerly, so per-step
    # dispatch "measures" ~30 s of tunnel round-trips, not training).  The
    # timed window includes the real collated-batch upload. ---
    def to_host(b):
        out = dict(b)
        out["ntokens"] = np.float32(b["ntokens"])
        return out

    it = batches(1000)
    first = {k: jnp.asarray(v) for k, v in to_host(next(it)).items()}
    state = trainer.init_state(first)
    K_E2E = 10
    one = trainer._make_train_step(1)

    @jax.jit
    def run_k(state, stacked, rng):
        def body(i, carry):
            s, _ = carry
            b = jax.tree.map(lambda x: x[i], stacked)
            s2, m = one(s, b, rng)
            return (s2, m["loss"])

        _, loss = jax.lax.fori_loop(
            0, K_E2E, body, (state, jnp.zeros((), jnp.float32)))
        return loss

    def stack_k():
        bs = [to_host(next(it)) for _ in range(K_E2E)]
        return {k: np.stack([b[k] for b in bs]) for k in bs[0]}

    # --- per-segment decomposition (VERDICT r4 #4): MEASURE each stage of
    # the same fused window — host batch assembly, host->device transfer of
    # the actual stacked tree, device compute on device-resident data —
    # then the combined window; the residual is reported, never attributed
    # by elimination. ---
    @jax.jit
    def _touch(tree):
        # consume one element of every leaf: forces all uploads to complete
        # before the host read returns (block_until_ready is unreliable
        # through the axon tunnel — docs/design.md "Measuring through...")
        import jax.numpy as _jnp

        return sum(_jnp.sum(v.ravel()[:1]) for v in jax.tree.leaves(tree))

    # warm EVERY timed program (incl. _touch — its first call compiles, and
    # through the axon tunnel that is seconds, not ms; r5 first run measured
    # the compile inside the put segment and went -147% residual)
    warm = jax.device_put(stack_k())
    np.asarray(_touch(warm))
    np.asarray(run_k(state, warm, trainer.base_rng))
    del warm

    # segments are timestamped WITHIN one window (3 windows, medians), so
    # the decomposition is exact by construction: every e2e second lands in
    # a measured segment.  The only perturbation is the forced _touch sync
    # between put and run (~one dispatch, <1% here).  put_jitter quantifies
    # the tunnel's draw-to-draw transfer variance — the reason separately
    # timed windows showed a 15-22% phantom "residual" (r5 probes).
    host_walls, put_walls, dev_walls, e2e_walls = [], [], [], []
    for _ in range(3):
        t0 = time.perf_counter()
        stacked_host = stack_k()
        t1 = time.perf_counter()
        stacked_dev = jax.device_put(stacked_host)
        np.asarray(_touch(stacked_dev))
        t2 = time.perf_counter()
        np.asarray(run_k(state, stacked_dev, trainer.base_rng))
        t3 = time.perf_counter()
        host_walls.append(t1 - t0)
        put_walls.append(t2 - t1)
        dev_walls.append(t3 - t2)
        e2e_walls.append(t3 - t0)
    med = lambda xs: float(np.median(xs))
    host_stack_wall, put_wall, dev_wall, e2e_wall = (
        med(host_walls), med(put_walls), med(dev_walls), med(e2e_walls)
    )
    e2e_sps = K_E2E / e2e_wall

    segs = {"host": host_stack_wall, "put": put_wall, "device": dev_wall}
    jitter = (max(put_walls) - min(put_walls)) / max(1e-9, med(put_walls))
    bound = max(segs, key=segs.get)
    tmp.cleanup()
    return {
        "pipeline_host_frames_per_sec": round(host_fps, 0),
        "pipeline_steps_per_sec": round(e2e_sps, 3),
        "pipeline_transfer_mb_per_batch": round(mb_per_batch, 1),
        "pipeline_segment_host_s_per_step": round(host_stack_wall / K_E2E, 4),
        "pipeline_segment_put_s_per_step": round(put_wall / K_E2E, 4),
        "pipeline_segment_device_s_per_step": round(dev_wall / K_E2E, 4),
        "pipeline_put_jitter_frac": round(jitter, 3),
        "pipeline_bound": bound,
    }


def bench_wer_sanity(jax, jnp):
    """Overfit a deterministic synthetic corpus on-device; decode and score
    WER — quality evidence alongside the speed numbers."""
    from s2t_tpu.config import OptimizationConfig
    from s2t_tpu.criterions import build_criterion
    from s2t_tpu.inference.generator import SequenceGenerator
    from s2t_tpu.models.s2t_transformer import S2TTransformerConfig, S2TTransformerModel
    from s2t_tpu.trainer import Trainer
    from s2t_tpu.utils.scoring import edit_distance

    B, T, V = 16, 48, 16
    rng = np.random.default_rng(7)
    # deterministic "utterances": token identity embedded in feature blocks
    refs = []
    feats = np.zeros((B, T, 80), np.float32)
    for b in range(B):
        toks = [4 + (b + j) % (V - 4) for j in range(3)]
        refs.append(toks)
        for j, tk in enumerate(toks):
            feats[b, j * (T // 3):(j + 1) * (T // 3), (tk - 4) * 6:(tk - 3) * 6] += 2.0
    feats += rng.normal(scale=0.05, size=feats.shape).astype(np.float32)
    targets = np.full((B, 4), 1, np.int32)
    for b, toks in enumerate(refs):
        targets[b, :3] = toks
        targets[b, 3] = 2
    prev = np.roll(targets, 1, 1)
    prev[:, 0] = 2

    cfg = S2TTransformerConfig(
        encoder_embed_dim=64, encoder_ffn_embed_dim=128, encoder_layers=2,
        encoder_attention_heads=2, decoder_embed_dim=64,
        decoder_ffn_embed_dim=128, decoder_layers=1, decoder_attention_heads=2,
        vocab_size=V, subsampling_filter=64, dropout=0.0,
        attention_dropout=0.0, activation_dropout=0.0, max_target_positions=32,
    )
    model = S2TTransformerModel(cfg)
    criterion = build_criterion(
        "label_smoothed_cross_entropy_with_ctc",
        {"label_smoothing": 0.0, "ctc": {"ctc_weight": 0.3}},
    )
    trainer = Trainer(
        model, criterion,
        OptimizationConfig(lr=5e-3, warmup_updates=10, clip_norm=5.0),
    )
    batch = {
        "features": jnp.asarray(feats),
        "feat_lengths": jnp.full((B,), T, jnp.int32),
        "prev_tokens": jnp.asarray(prev),
        "target": jnp.asarray(targets),
        "transcript": jnp.asarray(targets[:, :-1]),
        "transcript_lengths": jnp.full((B,), 3, jnp.int32),
        "ntokens": float(B * 4),
    }
    state = trainer.init_state(batch)
    for _ in range(4):
        state, _ = trainer.train_many(state, [batch] * 30)
    gen = SequenceGenerator(model, beam_size=2, max_len_b=8,
                            max_target_positions=32)
    tokens, _, _ = gen.generate(
        state.params, {"features": batch["features"],
                       "feat_lengths": batch["feat_lengths"]},
    )
    hyps = np.asarray(tokens)[:, 0]
    w_err = w_len = 0
    for b in range(B):
        hyp = [int(t) for t in hyps[b] if int(t) > 3]
        w_err += edit_distance(refs[b], hyp)
        w_len += len(refs[b])
    return {"wer_sanity": round(100.0 * w_err / w_len, 2),
            "wer_sanity_utts": B}


def main():
    import jax
    import jax.numpy as jnp

    rtf, gen_extra = bench_generation(jax, jnp)
    nast_extra = bench_nast_generation(jax, jnp)
    train_extra = bench_training(jax, jnp)
    # the L-model (268M) fills the MXU properly: its MFU is the
    # implementation-quality number, the m-model's is shape-limited
    train_extra.update(bench_training(jax, jnp, "s2t_transformer_l", "train_l"))
    train_extra.update(bench_pipeline(jax, jnp))
    wer_extra = bench_wer_sanity(jax, jnp)
    out = {
        "metric": "rtf_beam5_s2t_transformer_s",
        "value": round(rtf, 2),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / 10.0, 3),
        "extra": {
            **gen_extra, **nast_extra, **train_extra, **wer_extra,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
