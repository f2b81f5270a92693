"""Convert HF/torch checkpoints into the framework's .npz format.

Usage (requires the source checkpoint locally — this image is offline):

    python scripts/convert_checkpoint.py --family smollm2-1.7b \
        --src /path/to/model.safetensors --out smollm2.npz
    python scripts/convert_checkpoint.py --family whisper-tiny \
        --src /path/to/pytorch_model.bin --out whisper_tiny.npz
    python scripts/convert_checkpoint.py --family silero-vad \
        --src /path/to/silero_vad_state_dict.pt --out silero.npz

The npz stores the param pytree flattened with '/'-joined paths (lists as
integer segments); ``s2s_tpu.registry._load_checkpoint`` reads it back and
every handler accepts ``--*_checkpoint path.npz``.
"""

from __future__ import annotations

import argparse

import numpy as np


def load_state_dict(path: str) -> dict:
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return load_file(path)
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if isinstance(sd, torch.Tensor):  # e.g. a kokoro voicepack .pt
        return {"pack": sd.numpy()}
    flat = {}
    for k, v in sd.items():
        if isinstance(v, dict):  # kokoro-v1_0.pth: {module: state_dict} nesting
            for k2, v2 in v.items():
                k2 = k2[7:] if k2.startswith("module.") else k2
                flat[f"{k}.{k2}"] = v2.numpy()
        else:
            flat[k] = v.numpy()
    return flat


def flatten(tree, prefix="") -> dict[str, np.ndarray]:
    flat: dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            flat.update(flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            flat.update(flatten(v, f"{prefix}{i}/"))
    else:
        flat[prefix[:-1]] = np.asarray(tree)
    return flat


def parse_kaldi_mvn(path: str) -> tuple[np.ndarray, np.ndarray]:
    """FunASR am.mvn (Kaldi nnet text): <AddShift> vector = -mean,
    <Rescale> vector = 1/std.  Returns (add_shift, rescale)."""
    import re

    text = open(path).read()
    vectors = re.findall(r"\[([^\]]+)\]", text)
    arrays = [np.fromstring(v, sep=" ", dtype=np.float32) for v in vectors]
    arrays = [a for a in arrays if a.size > 1]
    if len(arrays) < 2:
        raise ValueError(f"Could not find AddShift/Rescale vectors in {path}")
    return arrays[0], arrays[1]


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--family", required=True,
                        choices=["smollm2-1.7b", "smollm2-360m", "whisper-tiny", "whisper-base",
                                 "whisper-small", "whisper-large-v3", "distil-large-v3", "silero-vad",
                                 "parakeet-tdt-0.6b-v2", "parakeet-tdt-0.6b-v3",
                                 "qwen3-tts-12hz-1.7b", "smart-turn", "mms-vits",
                                 "kokoro", "kokoro-voice", "smolvlm-vision",
                                 "paraformer-large", "mimi", "pocket-tts",
                                 "pocket-voice", "chattts", "deepfilter"])
    parser.add_argument("--mvn", default=None,
                        help="paraformer: FunASR am.mvn (Kaldi text) for CMVN")
    parser.add_argument("--pred-layers", type=int, default=1,
                        help="parakeet prediction-network LSTM layers (per the checkpoint)")
    parser.add_argument("--src", required=True)
    parser.add_argument("--out", required=True)
    args = parser.parse_args()

    sd = load_state_dict(args.src)
    if args.family.startswith("smollm2"):
        from s2s_tpu.models import decoder_lm

        cfg = {
            "smollm2-1.7b": decoder_lm.DecoderLMConfig.smollm2_1_7b,
            "smollm2-360m": decoder_lm.DecoderLMConfig.smollm2_360m,
        }[args.family]()
        params = decoder_lm.convert_hf_state_dict(sd, cfg)
    elif args.family.startswith("parakeet-tdt"):
        from dataclasses import replace

        from s2s_tpu.models import parakeet

        cfg = {
            "parakeet-tdt-0.6b-v2": parakeet.ParakeetConfig.tdt_0_6b_v2,
            "parakeet-tdt-0.6b-v3": parakeet.ParakeetConfig.tdt_0_6b_v3,
        }[args.family]()
        cfg = replace(cfg, pred_layers=args.pred_layers)
        params = parakeet.convert_state_dict(sd, cfg)
    elif args.family == "qwen3-tts-12hz-1.7b":
        from s2s_tpu.models import qwen3_tts

        params = qwen3_tts.convert_state_dict(sd, qwen3_tts.Qwen3TTSConfig.qwen3_tts_12hz_1_7b())
    elif args.family == "mms-vits":
        import json
        import os

        from s2s_tpu.models import vits

        sd = {k[5:] if k.startswith("vits.") else k: v for k, v in sd.items()}
        vocab_size = sd["text_encoder.embed_tokens.weight"].shape[0]
        from dataclasses import replace as _replace

        params = vits.convert_hf_state_dict(sd, _replace(vits.VitsConfig(), vocab_size=vocab_size))
        vocab_path = os.path.join(os.path.dirname(args.src) or ".", "vocab.json")
        if os.path.exists(vocab_path):
            with open(vocab_path) as f:
                vocab = json.load(f)
            with open(args.out + ".vocab.json", "w") as f:
                json.dump(vocab, f, ensure_ascii=False)
            print(f"wrote {args.out}.vocab.json ({len(vocab)} symbols)")
    elif args.family == "paraformer-large":
        from s2s_tpu.models import paraformer

        cfg = paraformer.ParaformerConfig()
        params = paraformer.convert_state_dict(sd, cfg)
        if args.mvn:
            mean, scale = parse_kaldi_mvn(args.mvn)
            params["cmvn_mean"] = mean
            params["cmvn_scale"] = scale
    elif args.family == "smolvlm-vision":
        from s2s_tpu.models import vision

        params = vision.convert_hf_state_dict(sd, vision.VisionConfig())
    elif args.family == "kokoro":
        import json
        import os

        from s2s_tpu.models import kokoro

        params = kokoro.convert_state_dict(sd, kokoro.KokoroConfig())
        # hexgrad/Kokoro-82M ships the phoneme vocab in config.json
        cfg_path = os.path.join(os.path.dirname(args.src) or ".", "config.json")
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                vocab = json.load(f).get("vocab")
            if vocab:
                with open(args.out + ".vocab.json", "w") as f:
                    json.dump(vocab, f, ensure_ascii=False)
                print(f"wrote {args.out}.vocab.json ({len(vocab)} phonemes)")
    elif args.family == "kokoro-voice":
        # a voicepack .pt: (510, 1, 2*style) length-indexed style table
        pack = next(iter(sd.values())) if isinstance(sd, dict) and len(sd) == 1 else sd
        params = {"pack": np.asarray(pack, np.float32).reshape(-1, 256)}
    elif args.family == "mimi":
        from s2s_tpu.models import mimi

        params = mimi.convert_state_dict(sd, mimi.MimiConfig())
    elif args.family == "pocket-tts":
        from s2s_tpu.models import pocket_tts

        params = pocket_tts.convert_state_dict(sd, pocket_tts.PocketTTSConfig())
    elif args.family == "chattts":
        from s2s_tpu.models import chattts

        params = chattts.convert_state_dict(sd, chattts.ChatTTSConfig())
    elif args.family == "deepfilter":
        from s2s_tpu.models import deepfilter

        params = deepfilter.convert_state_dict(sd, deepfilter.DeepFilterConfig())
    elif args.family == "pocket-voice":
        # a kyutai tts-voices embedding file: (T_v, d_model) prefix rows
        arr = next(iter(sd.values())) if isinstance(sd, dict) and len(sd) == 1 else sd
        params = {"voice": np.asarray(arr, np.float32)}
    elif args.family == "smart-turn":
        from s2s_tpu.vad import smart_turn

        params = smart_turn.convert_state_dict(sd)
    elif args.family == "silero-vad":
        from s2s_tpu.models.silero_vad import convert_silero_state_dict

        params = convert_silero_state_dict(sd)
    else:
        from s2s_tpu.models import whisper

        cfg = {
            "whisper-tiny": whisper.WhisperConfig.tiny,
            "whisper-base": whisper.WhisperConfig.base,
            "whisper-small": whisper.WhisperConfig.small,
            "whisper-large-v3": whisper.WhisperConfig.large_v3,
            "distil-large-v3": whisper.WhisperConfig.distil_large_v3,
        }[args.family]()
        params = whisper.convert_hf_state_dict(sd, cfg)

    flat = flatten(params)
    np.savez_compressed(args.out, **{k: np.asarray(v) for k, v in flat.items()})
    print(f"wrote {args.out}: {len(flat)} arrays, "
          f"{sum(v.size for v in flat.values())/1e6:.1f}M params")


if __name__ == "__main__":
    main()
