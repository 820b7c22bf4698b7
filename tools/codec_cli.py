"""Codec CLI: compress audio to a packed .agc bitstream and back.

The user-facing "product" surface the reference implies but never ships —
its bitrate is only ever arithmetic (networks/utils.py:137-147). This tool
makes the codec usable on files:

    # compress (wav or flac in; levels <= num_quantizers trims bitrate;
    # --entropy range-codes against the model's codebook-usage priors,
    # typically ~40% smaller at identical reconstruction)
    python tools/codec_cli.py encode in.wav out.agc --yaml config/training.yml
    # decompress
    python tools/codec_cli.py decode out.agc recon.wav --yaml config/training.yml
    # inspect a bitstream (no model needed)
    python tools/codec_cli.py info out.agc

Loads the newest checkpoint of the experiment named in the YAML (the
reference's auto-resume discovery, networks/utils.py:201-210). `--stream`
runs the carried-state streaming codec (bounded memory for long files,
bit-exact encode); the default batch path is one jitted call. Both paths
produce the SAME .agc bytes and the SAME reconstruction: encode pads the
input so the padded length covers original_length + decoder latency, and
decode trims the pad (and, in stream mode, the latency shift) back off.
File coding always runs the f32 compute path even for bfloat16-trained
checkpoints (see _f32): bitstream indices must be platform-stable and
batch/stream-identical, and bf16 rounding is fusion-dependent.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


# ------------------------------------------------------------------------- #
# Core helpers (pure model+variables API; the CLI wraps checkpoint loading)
# ------------------------------------------------------------------------- #
def _f32(model):
    """File coding always runs the f32 compute path: indices must be
    platform-stable and identical between the batch and streaming encoders
    (the streaming codec is f32 by construction; a bfloat16 batch encode
    would round differently per fusion choice). bf16 is a training /
    bulk-throughput dtype, not a bitstream-determinism dtype."""
    import jax.numpy as jnp

    if model.compute_dtype == jnp.float32:
        return model
    return model.clone(compute_dtype=jnp.float32)


def _codec(model, variables, chunk_frames: int):
    from audio_generation_tpu.streaming import StatefulStreamingCodec

    return StatefulStreamingCodec(model, variables, chunk_frames=chunk_frames)


def padded_length(L: int, latency: int, chunk: int) -> int:
    """Encode pad law: cover L + decoder latency, aligned to whole chunks —
    identical for the batch and streaming paths so the bitstreams match."""
    return ((L + latency + chunk - 1) // chunk) * chunk


def encode_array(
    model,
    variables,
    wave: np.ndarray,
    sample_rate: int,
    levels: int | None = None,
    chunk_frames: int = 50,
    stream: bool = False,
):
    """wave (L,) float32 -> (packed_indices (T, n), meta kwargs dict)."""
    import jax

    model = _f32(model)
    if model.bottleneck == "rvq":
        codec = _codec(model, variables, chunk_frames)
        latency, chunk, stride = (codec.latency_samples, codec.chunk,
                                  codec.stride)
    else:
        # energy_rvq etc.: batch coding only (the energy descent attends
        # across the whole latent sequence — no carried-state stream form).
        # Same pad law with latency 0: batch decode has no emission delay.
        if stream:
            raise SystemExit(
                f"--stream supports the RVQ bottleneck only (model has "
                f"'{model.bottleneck}'); use the batch path")
        latency, stride = 0, model.scale_factor
        chunk = chunk_frames * stride
    L = int(wave.shape[-1])
    padded = np.zeros(padded_length(L, latency, chunk), np.float32)
    padded[:L] = wave
    if stream:
        idx = codec.encode_stream(padded[None, :])[0]
    else:
        x = padded[None, :, None] if model.input_format == "b l c" else padded[None, None, :]
        (_zq, _commit, idx), _ = jax.jit(
            lambda v, x: model.apply(v, x, method="encode", mutable=["codebook"])
        )(variables, x)
        idx = np.asarray(idx[0])
    n = idx.shape[-1] if levels is None else min(levels, idx.shape[-1])
    meta = dict(
        codebook_sizes=list(model.quantizer.codebook_sizes)[:n],
        sample_rate=sample_rate,
        stride=stride,
        original_length=L,
    )
    return idx[:, :n], meta


def decode_array(
    model,
    variables,
    indices: np.ndarray,
    original_length: int,
    chunk_frames: int = 50,
    stream: bool = False,
) -> np.ndarray:
    """indices (T, n<=nq) -> waveform (original_length,) float32."""
    import jax

    model = _f32(model)
    if stream and model.bottleneck != "rvq":
        raise SystemExit(
            f"--stream supports the RVQ bottleneck only (model has "
            f"'{model.bottleneck}'); use the batch path")
    if stream:
        codec = _codec(model, variables, chunk_frames)
        y = codec.decode_stream(indices[None])[0]
        y = y[codec.latency_samples :]  # carried-state emission delay
    else:
        y = np.asarray(
            jax.jit(lambda v, i: model.apply(v, i, method="decode_indices"))(
                variables, indices[None]
            )
        )
        y = y[0, :, 0] if model.input_format == "b l c" else y[0, 0, :]
    assert y.shape[0] >= original_length, "bitstream shorter than original_length"
    return np.asarray(y[:original_length], np.float32)


# ------------------------------------------------------------------------- #
# CLI plumbing
# ------------------------------------------------------------------------- #
def _load_trained(yaml_path: str):
    """Newest-checkpoint model from a training YAML (auto-resume semantics)."""
    from audio_generation_tpu.config import ExperimentConfig
    from audio_generation_tpu.train.trainer import Trainer

    cfg = ExperimentConfig.from_yaml(yaml_path)
    cfg.scratch_train = False
    trainer = Trainer(cfg)
    step = int(trainer.state.step)
    if step == 0:
        print("warning: no checkpoint found — encoding with INITIAL weights")
    else:
        print(f"loaded {cfg.experiment_name} at step {step}")
    return trainer.model, trainer._variables(), cfg.sample_rate


def _load_snapshot(npz_path: str):
    """Model + variables from a committed npz snapshot (artifacts/ckpt/
    <name>.npz, train/checkpoint.save_params_npz). The snapshot embeds its
    own vae_args/sample_rate, so no YAML or Orbax run dir is needed — this
    is the VM-reset-durable product path (the Orbax dirs live outside git
    and have been wiped twice; the committed snapshots are what survives)."""
    from audio_generation_tpu.config import ExperimentConfig
    from audio_generation_tpu.models.vae import model_from_config
    from audio_generation_tpu.train.checkpoint import load_params_npz

    params, codebook, meta = load_params_npz(npz_path)
    if "vae_args" not in meta or "sample_rate" not in meta:
        sys.exit(f"{npz_path} has no embedded vae_args/sample_rate meta — "
                 "re-snapshot with tools/quality_r04.snapshot or use --yaml")
    vae_args = dict(meta["vae_args"])
    vae_args["compute_dtype"] = "float32"  # file coding is f32 (see _f32)
    cfg = ExperimentConfig.from_dict({
        "experiment_name": str(meta.get("config", "snapshot")),
        "dataset": "synthetic",
        "sample_rate": int(meta["sample_rate"]),
        "save_path_root": "/tmp/codec_cli/",
        "vae_args": vae_args,
    })
    model = model_from_config(cfg.vae)
    step = int(meta.get("step", 0))
    if step == 0:
        print("warning: snapshot carries step 0 — UNTRAINED weights")
    else:
        print(f"loaded snapshot {npz_path} at step {step}")
    return model, {"params": params, "codebook": codebook}, cfg.sample_rate


def _load_model(args):
    """--snapshot (npz) takes precedence over --yaml (Orbax discovery)."""
    if getattr(args, "snapshot", None):
        return _load_snapshot(args.snapshot)
    return _load_trained(args.yaml)


def _read_input(path: str, target_sr: int) -> np.ndarray:
    from audio_generation_tpu.data.flacio import read_audio
    from audio_generation_tpu.ops.signal import resample

    x, sr = read_audio(path)
    mono = x.mean(axis=0) if x.ndim == 2 else x
    if sr != target_sr:
        print(f"resampling {sr} -> {target_sr} Hz")
        mono = np.asarray(resample(mono, sr, target_sr), np.float32)
    return mono.astype(np.float32)


def _entropy_priors(model, variables, levels: int):
    """Per-level range-coder seeds from the checkpoint's codebook-usage EMA
    (models/quantizer.entropy_priors), truncated to the stored levels."""
    qstate = (variables.get("codebook") or {}).get("state")
    if qstate is None:
        sys.exit("model has no codebook state — entropy coding needs a "
                 "trained RVQ checkpoint/snapshot")
    return model.quantizer.entropy_priors(qstate)[:levels]


def cmd_encode(args):
    from audio_generation_tpu.bitstream import write_bitstream

    model, variables, sr = _load_model(args)
    wave = _read_input(args.input, sr)
    idx, meta = encode_array(
        model, variables, wave, sr,
        levels=args.levels, chunk_frames=args.chunk_frames, stream=args.stream,
    )
    priors = (
        _entropy_priors(model, variables, idx.shape[1])
        if args.entropy else None
    )
    nbytes = write_bitstream(args.output, idx, **meta, entropy_priors=priors)
    secs = meta["original_length"] / sr
    kind = "entropy-coded" if priors is not None else "packed"
    print(
        f"{args.output}: {nbytes} bytes for {secs:.2f} s "
        f"({8 * nbytes / secs:.0f} bps incl. header, {kind}; "
        f"{idx.shape[1]} levels x {idx.shape[0]} frames)"
    )


def cmd_decode(args):
    from audio_generation_tpu.bitstream import read_bitstream, read_header
    from audio_generation_tpu.data.wavio import write_wav

    header = read_header(args.input)
    model, variables, sr = _load_model(args)
    priors = (
        _entropy_priors(model, variables, header.num_levels)
        if header.entropy_coded else None
    )
    idx, meta = read_bitstream(
        args.input, max_levels=args.levels, entropy_priors=priors
    )
    if sr != meta.sample_rate:
        print(
            f"warning: model rate {sr} != bitstream rate {meta.sample_rate}; "
            "decoding at the model rate"
        )
    y = decode_array(
        model, variables, idx, meta.original_length,
        chunk_frames=args.chunk_frames, stream=args.stream,
    )
    # the decoder produces samples on the MODEL's timeline — stamp the wav
    # at the model rate (== bitstream rate unless the warning above fired)
    write_wav(args.output, y, sr)
    rate = (
        f"{meta.coded_bitrate_bps:.0f} bps entropy-coded"
        if meta.entropy_coded else f"{meta.bitrate_bps:.0f} bps"
    )
    print(
        f"{args.output}: {meta.duration_seconds:.2f} s decoded from "
        f"{meta.num_levels} levels @ {rate}"
    )


def cmd_info(args):
    from audio_generation_tpu.bitstream import read_header

    meta = read_header(args.input)
    print(f"{args.input}:")
    print(f"  sample_rate      {meta.sample_rate} Hz")
    print(f"  stride           {meta.stride} samples/frame "
          f"({meta.sample_rate / meta.stride:.1f} fps)")
    print(f"  frames           {meta.num_frames}")
    print(f"  duration         {meta.duration_seconds:.3f} s")
    print(f"  levels           {meta.num_levels} "
          f"(codebooks {list(meta.codebook_sizes)})")
    print(f"  bits/frame       {meta.bits_per_frame}")
    if meta.entropy_coded:
        print(f"  bitrate          {meta.coded_bitrate_bps:.0f} bps "
              f"entropy-coded (payload {meta.coded_bytes} bytes; "
              f"nominal {meta.bitrate_bps:.0f} bps)")
    else:
        payload_bits = meta.bits_per_frame * meta.num_frames
        print(f"  bitrate          {meta.bitrate_bps:.0f} bps "
              f"(payload {payload_bits // 8} bytes)")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp, model=True):
        if model:
            sp.add_argument("--yaml", default="config/training.yml",
                            help="training YAML naming the experiment/checkpoint")
            sp.add_argument("--snapshot", default=None,
                            help="committed npz snapshot (artifacts/ckpt/"
                                 "<name>.npz) — overrides --yaml; no run "
                                 "dir needed")
            sp.add_argument("--levels", type=int, default=None,
                            help="use only the first N RVQ levels (lower bitrate)")
            sp.add_argument("--stream", action="store_true",
                            help="carried-state streaming (bounded memory)")
            sp.add_argument("--chunk-frames", type=int, default=50)

    e = sub.add_parser("encode", help="audio file -> .agc bitstream")
    e.add_argument("input"); e.add_argument("output")
    e.add_argument("--entropy", action="store_true",
                   help="range-code the payload seeded from the model's "
                        "codebook-usage priors (decode needs the same "
                        "checkpoint/snapshot; typically ~40%% smaller)")
    common(e); e.set_defaults(fn=cmd_encode)

    d = sub.add_parser("decode", help=".agc bitstream -> wav")
    d.add_argument("input"); d.add_argument("output")
    common(d); d.set_defaults(fn=cmd_decode)

    i = sub.add_parser("info", help="print bitstream header")
    i.add_argument("input"); i.set_defaults(fn=cmd_info)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
