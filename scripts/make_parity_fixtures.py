"""Regenerate the torch architecture-parity fixtures in tests/data/.

Builds config-initialized (random-weight, no download) transformers models,
saves their state dicts + input/output tensors; ``tests/test_torch_parity.py``
then requires our JAX implementations to reproduce the torch logits after
conversion.  Run offline when the fixture configs change (importing
transformers costs minutes in the TPU image).
"""

from __future__ import annotations

import numpy as np
import torch


def make_whisper_fixture(path: str = "tests/data/whisper_parity.npz") -> None:
    from transformers import WhisperConfig, WhisperForConditionalGeneration

    torch.manual_seed(0)
    cfg = WhisperConfig(
        vocab_size=1024, num_mel_bins=80, d_model=64,
        encoder_layers=2, encoder_attention_heads=4,
        decoder_layers=2, decoder_attention_heads=4,
        encoder_ffn_dim=256, decoder_ffn_dim=256,
        max_source_positions=64, max_target_positions=32,
        pad_token_id=0, bos_token_id=1, eos_token_id=2, decoder_start_token_id=1,
    )
    model = WhisperForConditionalGeneration(cfg).eval()
    mel = torch.randn(1, 80, 128, generator=torch.Generator().manual_seed(1))
    tokens = torch.randint(0, 1024, (1, 8), generator=torch.Generator().manual_seed(2))
    with torch.no_grad():
        out = model(input_features=mel, decoder_input_ids=tokens)
        enc = model.model.encoder(mel).last_hidden_state
    sd = {k: v.numpy() for k, v in model.state_dict().items() if k.startswith("model.")}
    np.savez_compressed(
        path, mel=mel.numpy(), tokens=tokens.numpy(),
        enc_out=enc.numpy(), logits=out.logits.numpy(),
        **{"sd__" + k: v for k, v in sd.items()},
    )


def make_llama_fixture(path: str = "tests/data/llama_parity.npz") -> None:
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    cfg = LlamaConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0, rms_norm_eps=1e-5,
        tie_word_embeddings=True, attention_bias=False,
    )
    model = LlamaForCausalLM(cfg).eval()
    tokens = torch.randint(0, 512, (1, 12), generator=torch.Generator().manual_seed(3))
    with torch.no_grad():
        logits = model(input_ids=tokens).logits
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    np.savez_compressed(
        path, tokens=tokens.numpy(), logits=logits.numpy(),
        **{"sd__" + k: v for k, v in sd.items()},
    )


if __name__ == "__main__":
    make_whisper_fixture()
    make_llama_fixture()
    print("fixtures written to tests/data/")
