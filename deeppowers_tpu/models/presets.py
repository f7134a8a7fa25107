"""Model family presets for the north-star configs (BASELINE.json).

Maps well-known architectures onto TransformerConfig. Equivalent role to the
reference's model registry + config.json scan (reference:
src/api/python/deeppowers/__init__.py:75-114).
"""

from __future__ import annotations

from .transformer import TransformerConfig

# config 1: GPT-2 124M (learned positions, LayerNorm, GELU, tied embeddings)
GPT2_SMALL = TransformerConfig(
    vocab_size=50257, hidden_size=768, num_layers=12, num_heads=12,
    max_seq_len=1024, norm="layernorm", activation="gelu", positions="learned",
    qkv_bias=True, attn_out_bias=True, mlp_bias=True, tie_embeddings=True,
)

GPT2_MEDIUM = TransformerConfig(
    vocab_size=50257, hidden_size=1024, num_layers=24, num_heads=16,
    max_seq_len=1024, norm="layernorm", activation="gelu", positions="learned",
)

# config 2: TinyLlama 1.1B (GQA 32/4, RMSNorm, SiLU-GLU, RoPE)
TINYLLAMA_1_1B = TransformerConfig(
    vocab_size=32000, hidden_size=2048, num_layers=22, num_heads=32,
    num_kv_heads=4, intermediate_size=5632, max_seq_len=2048,
    norm="rmsnorm", activation="silu", glu=True, positions="rope",
    qkv_bias=False, attn_out_bias=False, mlp_bias=False, tie_embeddings=False,
)

# config 3: Llama-2-7B
LLAMA2_7B = TransformerConfig(
    vocab_size=32000, hidden_size=4096, num_layers=32, num_heads=32,
    intermediate_size=11008, max_seq_len=4096,
    norm="rmsnorm", activation="silu", glu=True, positions="rope",
    qkv_bias=False, attn_out_bias=False, mlp_bias=False, tie_embeddings=False,
)

# config 4: Llama-3-70B (GQA 64/8, rope theta 500k)
LLAMA3_70B = TransformerConfig(
    vocab_size=128256, hidden_size=8192, num_layers=80, num_heads=64,
    num_kv_heads=8, intermediate_size=28672, max_seq_len=8192,
    norm="rmsnorm", activation="silu", glu=True, positions="rope",
    rope_theta=500000.0,
    qkv_bias=False, attn_out_bias=False, mlp_bias=False, tie_embeddings=False,
)

# config 5: Mixtral-8x7B (8 experts, top-2)
MIXTRAL_8X7B = TransformerConfig(
    vocab_size=32000, hidden_size=4096, num_layers=32, num_heads=32,
    num_kv_heads=8, intermediate_size=14336, max_seq_len=4096,
    norm="rmsnorm", activation="silu", glu=True, positions="rope",
    qkv_bias=False, attn_out_bias=False, mlp_bias=False, tie_embeddings=False,
    num_experts=8, num_experts_per_tok=2,
)

# Config-5-shaped MoE that fits ONE v5e chip at int4 (~2.3 GB weights):
# same routing structure as Mixtral (8 experts, top-2, GQA) at 1/4 width —
# lets the expert-routing decode path be MEASURED on real hardware (the
# full 8x7B needs a multi-chip mesh; see BASELINE.md scaling points).
MIXTRAL_MINI = TransformerConfig(
    vocab_size=32000, hidden_size=2048, num_layers=16, num_heads=16,
    num_kv_heads=4, intermediate_size=5632, max_seq_len=4096,
    norm="rmsnorm", activation="silu", glu=True, positions="rope",
    qkv_bias=False, attn_out_bias=False, mlp_bias=False, tie_embeddings=False,
    num_experts=8, num_experts_per_tok=2,
)

PRESETS = {
    "gpt2": GPT2_SMALL,
    "gpt2-medium": GPT2_MEDIUM,
    "tinyllama-1.1b": TINYLLAMA_1_1B,
    "llama2-7b": LLAMA2_7B,
    "llama3-70b": LLAMA3_70B,
    "mixtral-8x7b": MIXTRAL_8X7B,
    "mixtral-mini": MIXTRAL_MINI,
}


def tiny_test_config(**overrides) -> TransformerConfig:
    """A tiny GPT-2-style config for fast tests."""
    base = dict(
        vocab_size=128, hidden_size=64, num_layers=2, num_heads=4,
        max_seq_len=64, norm="layernorm", activation="gelu",
        positions="learned",
    )
    base.update(overrides)
    return TransformerConfig(**base)


def tiny_llama_config(**overrides) -> TransformerConfig:
    """A tiny Llama-style (GQA + RoPE + GLU) config for fast tests."""
    base = dict(
        vocab_size=128, hidden_size=64, num_layers=2, num_heads=4,
        num_kv_heads=2, intermediate_size=128, max_seq_len=64,
        norm="rmsnorm", activation="silu", glu=True, positions="rope",
        qkv_bias=False, attn_out_bias=False, mlp_bias=False,
        tie_embeddings=False,
    )
    base.update(overrides)
    return TransformerConfig(**base)


def tiny_moe_config(**overrides) -> TransformerConfig:
    """A tiny Mixtral-style MoE config for fast tests."""
    base = dict(
        vocab_size=128, hidden_size=64, num_layers=2, num_heads=4,
        num_kv_heads=2, intermediate_size=128, max_seq_len=64,
        norm="rmsnorm", activation="silu", glu=True, positions="rope",
        qkv_bias=False, attn_out_bias=False, mlp_bias=False,
        tie_embeddings=False, num_experts=4, num_experts_per_tok=2,
    )
    base.update(overrides)
    return TransformerConfig(**base)


# Tiny random-init presets, addressable by name through Model.from_pretrained
# — used by the in-process C++ API demo, examples and CI (compile in seconds
# on CPU; the named production presets above take minutes to even init).
PRESETS["tiny-test"] = tiny_test_config()
PRESETS["tiny-llama"] = tiny_llama_config()
PRESETS["tiny-moe"] = tiny_moe_config()
