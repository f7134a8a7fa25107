"""Train a small byte-level LM on local text, in-repo, so the Δppl
quantization gate fires on REAL weight distributions.

VERDICT r2 item 5: every committed quantization-quality number so far was
measured on random-init synthetic weights, which lack the activation/weight
outlier structure that decides int4 accuracy. This environment has zero
egress and ships no pretrained weights — so train one here: a Llama-style
byte-level model on the English prose that ships with the OS
(/usr/share/common-licenses + /usr/share/doc copyright/README files).
A few thousand AdamW steps are enough to develop the heavy-tailed weight
and activation distributions real LMs show (per-channel dynamic ranges
spanning orders of magnitude), which is what the gate needs to be honest.

Reference analogue: tests/test_quantization.cpp:70-94 left the accuracy
acceptance as a TODO metric; scripts/eval_ppl.py measures it on this model.

Usage:
  python scripts/train_tiny.py --out /tmp/tinylm --steps 3000
  python scripts/eval_ppl.py --checkpoint /tmp/tinylm \
      --text /tmp/tinylm/ppl_eval.txt
"""

import argparse
import glob
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("DPT_PLATFORM"):   # axon ignores JAX_PLATFORMS; honor ours
    jax.config.update("jax_platforms", os.environ["DPT_PLATFORM"])

import jax.numpy as jnp
import numpy as np


def build_corpus(max_mb: float) -> str:
    """English prose from the OS image: licenses, copyright, READMEs."""
    paths = sorted(glob.glob("/usr/share/common-licenses/*"))
    paths += sorted(glob.glob("/usr/share/doc/*/copyright"))
    paths += sorted(glob.glob("/usr/share/doc/*/README*"))
    out, total, cap = [], 0, int(max_mb * 1e6)
    for p in paths:
        if not os.path.isfile(p):
            continue
        try:
            with open(p, "rb") as f:
                data = f.read()
            text = data.decode("utf-8")
        except (OSError, UnicodeDecodeError):
            continue
        out.append(text)
        total += len(text)
        if total >= cap:
            break
    if total < 1e5:
        raise SystemExit("not enough local text to train on")
    return "\n\n".join(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True, help="checkpoint dir")
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seq-len", type=int, default=256)
    ap.add_argument("--hidden", type=int, default=512)
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--experts", type=int, default=0,
                    help="MoE expert count (0 = dense FFN)")
    ap.add_argument("--top-k", type=int, default=2)
    ap.add_argument("--aux-weight", type=float, default=0.01,
                    help="Switch-style load-balance loss weight (MoE only)")
    ap.add_argument("--corpus-mb", type=float, default=8.0)
    ap.add_argument("--inter", type=int, default=0,
                    help="intermediate size override (MoE cat fusing needs "
                         "group_size | inter/2, e.g. 768 at g128)")
    ap.add_argument("--eval-frac", type=float, default=0.02,
                    help="held-out tail fraction written as ppl_eval.txt")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import optax

    from deeppowers_tpu.models.presets import tiny_llama_config
    from deeppowers_tpu.models.transformer import forward_prefill, init_params
    from deeppowers_tpu.runtime.checkpoint import save_checkpoint
    from deeppowers_tpu.serving.tokenizer import ByteTokenizer

    tok = ByteTokenizer()
    text = build_corpus(args.corpus_mb)
    split = int(len(text) * (1 - args.eval_frac))
    train_text, eval_text = text[:split], text[split:]
    ids = np.asarray(tok.encode(train_text), dtype=np.int32)
    print(f"corpus: {len(text) / 1e6:.1f} MB text, "
          f"{ids.size / 1e6:.1f}M train tokens")

    moe_kw = {}
    if args.experts:
        # Mixtral-style routed FFN (BASELINE config 5 shape at tiny scale)
        moe_kw = dict(num_experts=args.experts,
                      num_experts_per_tok=args.top_k)
    cfg = tiny_llama_config(
        vocab_size=tok.vocab_size, hidden_size=args.hidden,
        num_layers=args.layers, num_heads=args.heads,
        num_kv_heads=max(1, args.heads // 2),
        intermediate_size=args.inter
        or int(args.hidden * 8 / 3 // 128 * 128) or 256,
        max_seq_len=max(512, args.seq_len), **moe_kw)
    # training forward uses the dense-combine MoE (differentiable einsum
    # path); the saved cfg keeps moe_impl "auto" for inference
    import dataclasses
    train_cfg = dataclasses.replace(cfg, moe_impl="dense") \
        if args.experts else cfg
    params = init_params(cfg, jax.random.PRNGKey(args.seed),
                         dtype=jnp.float32)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"model: {args.layers}L x {args.hidden}h"
          + (f" x {args.experts}e top-{args.top_k}" if args.experts else "")
          + f", {n_params / 1e6:.1f}M params")

    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup_steps=min(200, args.steps // 10),
        decay_steps=args.steps, end_value=args.lr * 0.1)
    opt = optax.chain(optax.clip_by_global_norm(1.0),
                      optax.adamw(sched, weight_decay=0.01))
    opt_state = opt.init(params)
    S = args.seq_len

    from deeppowers_tpu.models import transformer as tf_mod

    def loss_fn(p, batch_ids):
        lens = jnp.full((batch_ids.shape[0],), S, jnp.int32)
        aux = jnp.float32(0.0)
        if args.experts:
            # Switch-style load balancing: E * sum_e f_e * P_e, where f_e is
            # the top-k routing fraction and P_e the mean router probability
            # — without it tiny MoEs collapse onto one expert and the
            # quantization gate would measure an unrepresentative model
            tf_mod.MOE_ROUTER_TAP = taps = []
            try:
                logits, _ = forward_prefill(p, train_cfg, batch_ids, lens,
                                            dtype=jnp.float32)
            finally:
                tf_mod.MOE_ROUTER_TAP = None
            for rl in taps:                                # (T, E)
                probs = jax.nn.softmax(rl, axis=-1)
                p_e = probs.mean(axis=0)
                _, ti = jax.lax.top_k(rl, args.top_k)
                f_e = jnp.zeros((args.experts,), jnp.float32).at[
                    ti.reshape(-1)].add(1.0) / (rl.shape[0] * args.top_k)
                aux = aux + args.experts * jnp.sum(f_e * p_e)
            aux = aux / max(len(taps), 1)
        else:
            logits, _ = forward_prefill(p, train_cfg, batch_ids, lens,
                                        dtype=jnp.float32)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tgt = batch_ids[:, 1:]
        tlp = jnp.take_along_axis(logp[:, :-1], tgt[..., None],
                                  axis=-1)[..., 0]
        return -tlp.mean() + args.aux_weight * aux

    # K optimizer steps per device dispatch (lax.scan over a pre-uploaded
    # batch chunk): per-step host dispatch through a remote-tunneled runtime
    # costs ~0.5s — amortize it. Donation keeps params/opt state in place.
    CHUNK = 25

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_chunk(p, o, chunk_ids):          # chunk_ids: (CHUNK, B, S)
        def body(carry, batch_ids):
            p, o = carry
            loss, grads = jax.value_and_grad(loss_fn)(p, batch_ids)
            updates, o = opt.update(grads, o, p)
            return (optax.apply_updates(p, updates), o), loss
        (p, o), losses = jax.lax.scan(body, (p, o), chunk_ids)
        return p, o, losses.mean()

    rng = np.random.RandomState(args.seed)
    n_windows = ids.size - S - 1
    t0 = time.time()
    if args.steps % CHUNK:
        args.steps = -(-args.steps // CHUNK) * CHUNK
        print(f"steps rounded up to {args.steps} (multiple of the "
              f"{CHUNK}-step dispatch chunk)")
    step = 0
    while step < args.steps:
        starts = rng.randint(0, n_windows, size=(CHUNK * args.batch,))
        chunk = np.stack([ids[s:s + S] for s in starts]).reshape(
            CHUNK, args.batch, S)
        params, opt_state, loss = train_chunk(params, opt_state,
                                              jnp.asarray(chunk))
        step += CHUNK
        loss_v = float(loss)                # fetch = completion fence
        if step % 200 < CHUNK or step >= args.steps:
            tps = step * args.batch * S / (time.time() - t0)
            print(f"step {step:5d}  loss {loss_v:.4f} "
                  f"(ppl {np.exp(loss_v):7.2f})  {tps / 1e3:.0f}k tok/s",
                  flush=True)

    os.makedirs(args.out, exist_ok=True)
    save_checkpoint(args.out, jax.device_get(params), cfg,
                    extra={"trained": {"steps": args.steps,
                                       "corpus_mb": args.corpus_mb,
                                       "tokenizer": "byte"}})
    with open(os.path.join(args.out, "ppl_eval.txt"), "w") as f:
        f.write(eval_text)
    print(f"saved {args.out} (+ ppl_eval.txt, "
          f"{len(eval_text) / 1e3:.0f}k chars held out)")


if __name__ == "__main__":
    main()
