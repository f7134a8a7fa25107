"""The Δppl acceptance gate, runnable on any local checkpoint.

BASELINE.md: "Δppl <= 0.1 vs FP16 at same bit-width". The reference left
its quantization-accuracy test as a TODO metric
(reference: tests/test_quantization.cpp:70-94); this script measures it for
real: perplexity of the fp reference vs int8 / int4-g128 / int4-g128+AWQ on
a text file, via the jitted NLL in runtime/evaluate.py.

Usage:
  python scripts/eval_ppl.py --checkpoint /path/to/hf_dir --text wiki.txt
  python scripts/eval_ppl.py --synthetic            # harness self-check

--checkpoint: a HuggingFace directory (config.json + *.safetensors +
tokenizer files) for gpt2 / llama / mistral / mixtral / qwen2 families
(models/hf_import.py). This environment has zero egress and ships no model
weights, so the committed benchmark table uses --synthetic (random-init
weights: Δppl measures the quantizer's numerics, not language quality —
documented as such in docs/benchmarks.md). Point it at any real local
checkpoint and the same gate fires on real weight distributions.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# the axon TPU plugin ignores the JAX_PLATFORMS env var; honor an explicit
# platform request (DPT_PLATFORM=cpu) via the config knob it does respect
import os as _os
if _os.environ.get("DPT_PLATFORM"):
    jax.config.update("jax_platforms", _os.environ["DPT_PLATFORM"])
import jax.numpy as jnp
import numpy as np


def _sequences(token_ids, seq_len):
    return [token_ids[i:i + seq_len]
            for i in range(0, len(token_ids) - 1, seq_len)
            if len(token_ids[i:i + seq_len]) >= 2]


def _ep_perplexity(params, cfg, seqs, ep=2, batch_size=8):
    """Perplexity with the MoE experts SHARDED over an expert-parallel mesh
    (shard_map over the expert axis — each shard computes its local experts'
    routed pairs; psum combines). Gates the EP compute path itself, not just
    its exactness tests."""
    from functools import partial

    import numpy as np

    from deeppowers_tpu.config import MeshConfig
    from deeppowers_tpu.models.transformer import forward_prefill
    from deeppowers_tpu.parallel import sharding as shd
    from deeppowers_tpu.parallel.mesh import EXPERT_AXIS, make_mesh
    try:
        shard_map = jax.shard_map
    except AttributeError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh(MeshConfig(expert=ep))
    sp = shd.shard_params(params, mesh, cfg)
    specs = shd.param_spec_tree(cfg, params, tp=1)
    lcfg = shd.local_config(cfg, mesh)

    def nll(p, ids, lens):
        logits, _ = forward_prefill(p, lcfg, ids, lens, dtype=jnp.float32,
                                    ep_axis=EXPERT_AXIS)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tgt = ids[:, 1:]
        tlp = jnp.take_along_axis(logp[:, :-1], tgt[..., None],
                                  axis=-1)[..., 0]
        pos = jnp.arange(ids.shape[1] - 1)
        valid = pos[None] < (lens[:, None] - 1)
        return (-jnp.where(valid, tlp, 0.0)).sum(), valid.sum()

    fn = jax.jit(shard_map(nll, mesh=mesh, in_specs=(specs, P(), P()),
                           out_specs=(P(), P()), check_vma=False))
    pad_to = max(len(s) for s in seqs)
    total_nll, total_tokens = 0.0, 0
    for i in range(0, len(seqs), batch_size):
        chunk = seqs[i:i + batch_size]
        ids = np.zeros((batch_size, pad_to), dtype=np.int32)
        lens = np.zeros((batch_size,), dtype=np.int32)
        for j, s in enumerate(chunk):
            ids[j, :len(s)] = s
            lens[j] = len(s)
        s_nll, cnt = fn(sp, jnp.asarray(ids), jnp.asarray(lens))
        total_nll += float(s_nll)
        total_tokens += int(cnt)
    return float(np.exp(total_nll / max(total_tokens, 1)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", help="HF checkpoint dir")
    ap.add_argument("--text", help="UTF-8 text file for evaluation")
    ap.add_argument("--synthetic", action="store_true",
                    help="random-init tiny model + synthetic corpus "
                         "(harness validation when no checkpoint exists)")
    ap.add_argument("--seq-len", type=int, default=512)
    ap.add_argument("--max-seqs", type=int, default=16)
    ap.add_argument("--group-size", type=int, default=128)
    ap.add_argument("--calib-seqs", type=int, default=0,
                    help="calibration sequences for GPTQ/AWQ (0 = auto: 4 "
                         "dense, 16 MoE — per-expert Hessians see ~1/E of "
                         "the tokens, so MoE needs E-scaled calibration; "
                         "measured on the trained MoE: calib=4 +0.057, "
                         "calib=16 +0.024, calib=32 -0.007 delta-ppl)")
    ap.add_argument("--gate", type=float, default=0.1,
                    help="max allowed delta_ppl (exit 1 above)")
    args = ap.parse_args()

    from deeppowers_tpu.config import QuantConfig, QuantMode
    from deeppowers_tpu.models.transformer import quantize_params
    from deeppowers_tpu.quant.gptq import gptq_quantize
    from deeppowers_tpu.quant.smooth import awq_quantize
    from deeppowers_tpu.runtime.evaluate import cached_perplexity, perplexity

    if args.synthetic or not args.checkpoint:
        if args.checkpoint:
            raise SystemExit("--checkpoint and --synthetic are exclusive")
        from deeppowers_tpu.models.presets import tiny_llama_config
        from deeppowers_tpu.models.transformer import init_params
        cfg = tiny_llama_config(vocab_size=512, max_seq_len=512)
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
        rng = np.random.RandomState(0)
        ids = rng.randint(2, 512, size=(args.max_seqs * args.seq_len,)
                          ).tolist()
        print("synthetic harness check (random-init tiny-llama; measures "
              "quantizer numerics, not language quality)")
    else:
        if os.path.exists(os.path.join(args.checkpoint, "manifest.json")):
            # native checkpoint (e.g. scripts/train_tiny.py output)
            from deeppowers_tpu.runtime.checkpoint import load_checkpoint
            params, cfg, extra = load_checkpoint(args.checkpoint)
            params = jax.tree_util.tree_map(
                lambda x: jnp.asarray(x, jnp.float32), params)
            if extra.get("trained", {}).get("tokenizer") == "byte":
                from deeppowers_tpu.serving.tokenizer import ByteTokenizer
                tok = ByteTokenizer()
            else:
                from deeppowers_tpu.serving.tokenizer import load_tokenizer
                tok = load_tokenizer(args.checkpoint)
        else:
            from deeppowers_tpu.models.hf_import import load_checkpoint
            from deeppowers_tpu.serving.tokenizer import load_tokenizer
            cfg, params = load_checkpoint(args.checkpoint, dtype=jnp.float32)
            tok = load_tokenizer(args.checkpoint)
        if not args.text:
            default_text = os.path.join(args.checkpoint, "ppl_eval.txt")
            if os.path.exists(default_text):
                args.text = default_text
            else:
                raise SystemExit("--text required with --checkpoint")
        with open(args.text, encoding="utf-8") as f:
            ids = tok.encode(f.read())
        print(f"checkpoint {args.checkpoint}: {cfg.num_layers} layers, "
              f"vocab {cfg.vocab_size}")

    all_seqs = _sequences(ids, args.seq_len)
    seqs = all_seqs[:args.max_seqs]
    ncal = args.calib_seqs or (16 if getattr(cfg, "num_experts", 0) else 4)
    # draw calibration from BEYOND the eval window when the corpus allows —
    # no calib/eval overlap; fall back to the eval window otherwise
    calib = all_seqs[args.max_seqs:args.max_seqs + ncal]
    if len(calib) < ncal:
        calib = (calib + seqs)[:ncal]
    print(f"{len(seqs)} sequences of <= {args.seq_len} tokens "
          f"(+{len(calib)} calibration)")

    ppl_ref = perplexity(params, cfg, seqs, dtype=jnp.float32)
    print(f"{'fp32 reference':<22} ppl {ppl_ref:8.4f}")

    g = args.group_size
    variants = {
        "int8 per-channel": lambda: quantize_params(
            params, QuantConfig(mode=QuantMode.INT8)),
        f"int4 g{g}": lambda: quantize_params(
            params, QuantConfig(mode=QuantMode.INT4, group_size=g)),
        f"int4 g{g} + AWQ": lambda: awq_quantize(
            params, cfg, calib,
            QuantConfig(mode=QuantMode.INT4, group_size=g)),
        f"int4 g{g} + GPTQ": lambda: gptq_quantize(
            params, cfg, calib,
            QuantConfig(mode=QuantMode.INT4, group_size=g)),
        # the engine's int4 DEFAULT since round 3: dynamic per-row int8
        # activations on top of int4 g128 weights
        f"W4A8 g{g}": lambda: quantize_params(
            params, QuantConfig(mode=QuantMode.INT4, group_size=g,
                                act_bits=8)),
        f"W4A8 g{g} + GPTQ": lambda: gptq_quantize(
            params, cfg, calib,
            QuantConfig(mode=QuantMode.INT4, group_size=g, act_bits=8)),
        "W8A8": lambda: quantize_params(
            params, QuantConfig(mode=QuantMode.INT8, act_bits=8)),
    }
    # The gate judges the SHIPPED recipes: int8/W8A8 as-is, int4 via GPTQ
    # (the calibrated path apply_quantization uses). Plain RTN / AWQ rows
    # are diagnostic — they show what the cheaper paths cost.
    gated = {"int8 per-channel", "W8A8",
             f"int4 g{g} + GPTQ", f"W4A8 g{g} + GPTQ"}
    worst = 0.0
    rows = []
    for name, build in variants.items():
        qp = build()
        ppl = perplexity(qp, cfg, seqs, dtype=jnp.float32)
        d = ppl - ppl_ref
        rows.append((name, ppl, d))
        tag = "  [gated]" if name in gated else ""
        print(f"{name:<22} ppl {ppl:8.4f}  delta {d:+.4f}{tag}")
        if name in gated:
            worst = max(worst, d)

    # --- quantized-KV gate (VERDICT r3 missing #1): the rows above are
    # teacher-forced PREFILL ppl, which never executes the quantized-KV read
    # path — yet the shipped 7B config is W4A8 weights + int4 KV. These rows
    # run the same corpus step-by-step through forward_decode so every
    # attention read hits the (possibly quantized) cache. Reference anchor:
    # the KV compression the reference attempted
    # (src/core/execution/models/gpt_model.cpp:532-545) with the accuracy
    # acceptance left TODO (tests/test_quantization.cpp:70-94).
    print("--- KV-cache gate (decode path, cached forward) ---")
    ppl_cached_ref = cached_perplexity(params, cfg, seqs, dtype=jnp.float32)
    print(f"{'fp32 KV (control)':<22} ppl {ppl_cached_ref:8.4f}  "
          f"delta {ppl_cached_ref - ppl_ref:+.4f} vs prefill")
    qp_ship = variants[f"W4A8 g{g} + GPTQ"]()
    kv_rows = [
        ("bf16 weights + int8 KV", params, "int8"),
        ("bf16 weights + int4 KV", params, "int4"),
        ("bf16 weights + k8v4 KV", params, "k8v4"),
        (f"W4A8 g{g} GPTQ + int8 KV", qp_ship, "int8"),
        # int4 KV FAILED this gate on both trained models (K-side scores
        # are the sensitive half); the shipped int4-class recipe is k8v4:
        (f"W4A8 g{g} GPTQ + k8v4 KV", qp_ship, "k8v4"),
        (f"W4A8 g{g} GPTQ + int4 KV", qp_ship, "int4"),
    ]
    if args.synthetic:
        # harness self-check (CI): one bf16-KV + one combined row exercise
        # every code path; the full matrix runs on trained checkpoints
        kv_rows = [kv_rows[2], kv_rows[4]]
    for name, p, kvd in kv_rows:
        ppl = cached_perplexity(p, cfg, seqs, kv_cache_dtype=kvd,
                                dtype=jnp.float32)
        d = ppl - ppl_cached_ref
        rows.append((name, ppl, d))
        # int4-KV rows are DIAGNOSTIC: the gate fired on them in round 4
        # (+0.13/+0.21 on the trained models) and the shipped int4-class
        # default moved to k8v4; shipped KV recipes stay gated
        is_gated = kvd != "int4"
        tag = "  [gated]" if is_gated else ""
        print(f"{name:<26} ppl {ppl:8.4f}  delta {d:+.4f}{tag}")
        if is_gated:
            worst = max(worst, d)

    # --- MoE paths (BASELINE config 5; VERDICT r4 item 3): the rows above
    # run the stacked per-expert paths — the SERVED MoE engine cat-fuses
    # experts (two wide matmuls at decode, grouped-cat routed pairs at
    # prefill) and may shard experts (EP). Gate the shipped recipe through
    # each of those exact compute paths.
    if getattr(cfg, "num_experts", 0):
        from deeppowers_tpu.models.transformer import fuse_params
        print("--- MoE paths: grouped-cat prefill / cat decode / EP ---")
        qpf = fuse_params(qp_ship, cfg, tp=1, fuse_moe=True)
        first = qpf["layers"][0]
        assert "experts_cat" in first.get("moe", {}), "cat fuse did not apply"
        moe_rows = [
            (f"W4A8 g{g} GPTQ grouped-cat prefill",
             lambda: perplexity(qpf, cfg, seqs, dtype=jnp.float32), ppl_ref),
            (f"W4A8 g{g} GPTQ cat decode + int8 KV",
             lambda: cached_perplexity(qpf, cfg, seqs, kv_cache_dtype="int8",
                                       dtype=jnp.float32), ppl_cached_ref),
        ]
        if len(jax.devices()) >= 2:
            moe_rows.append(
                (f"W4A8 g{g} GPTQ EP=2 prefill",
                 lambda: _ep_perplexity(qpf, cfg, seqs, ep=2), ppl_ref))
        else:
            print("  (EP row needs >= 2 devices — run with DPT_PLATFORM=cpu "
                  "XLA_FLAGS=--xla_force_host_platform_device_count=2)")
        for name, build, ref in moe_rows:
            ppl = build()
            d = ppl - ref
            rows.append((name, ppl, d))
            print(f"{name:<34} ppl {ppl:8.4f}  delta {d:+.4f}  [gated]")
            worst = max(worst, d)

    # BASELINE.md's 0.1 bar is an ABSOLUTE ppl delta for trained models
    # (ppl ~2-30). The --synthetic harness self-check runs at random-init
    # ppl ~vocab (hundreds), where 0.1 absolute is below measurement noise
    # — gate it at 0.1% relative instead (deltas there measure quantizer
    # numerics, not language quality; documented in the module docstring).
    gate = args.gate if args.checkpoint else max(args.gate,
                                                 1e-3 * ppl_ref)
    status = "PASS" if worst <= gate else "FAIL"
    print(f"gate (shipped recipes): worst delta_ppl {worst:+.4f} vs limit "
          f"{gate:.4g} -> {status}")
    if status == "FAIL":
        sys.exit(1)


if __name__ == "__main__":
    main()
