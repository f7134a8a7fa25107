"""Structured outputs: regex->DFA compiler, token masks, guided decoding.

The reference has no constrained-decoding subsystem; coverage here follows
the same strategy as the sampling tests (exactness against an independent
oracle — Python `re` for the automaton, json.loads for end-to-end)."""

import json
import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeppowers_tpu.config import GenerationConfig, RuntimeConfig
from deeppowers_tpu.models.presets import tiny_llama_config
from deeppowers_tpu.models.transformer import init_params
from deeppowers_tpu.runtime.engine import InferenceEngine
from deeppowers_tpu.serving.structured import (
    Guide,
    build_guide,
    compile_guide,
    compile_regex,
    guide_for_choice,
    guide_for_json,
    json_schema_to_regex,
    token_strings,
)
from deeppowers_tpu.serving.tokenizer import ByteTokenizer


# ---------------------------------------------------------------------------
# DFA compiler vs Python re (oracle)
# ---------------------------------------------------------------------------

PATTERNS = [
    r"abc",
    r"a(b|c)*d",
    r"[a-f]{2,4}",
    r"-?(0|[1-9][0-9]*)",
    r'"(?:[^"\\]|\\.)*"',
    r"(?:red|green|blue)",
    r"a+b?c*",
    r"\d{3}-\d{4}",
    r"[^x]*x",
    r"(ab){2,}",
]


@pytest.mark.parametrize("pattern", PATTERNS)
def test_dfa_matches_re(pattern):
    import random
    rng = random.Random(hash(pattern) & 0xFFFF)
    dfa = compile_regex(pattern)
    alphabet = 'abcdefx0123456789"-\\.'
    for _ in range(400):
        s = "".join(rng.choice(alphabet)
                    for _ in range(rng.randint(0, 10)))
        assert dfa.matches(s) == (re.fullmatch(pattern, s) is not None), \
            (pattern, s)


def test_escaped_range_endpoints():
    """[\\x00-\\x1f]-style ranges (escaped START endpoint) must expand as a
    range — regression: control chars leaked into JSON strings."""
    dfa = compile_regex(r'[^\x00-\x1f"]*')
    assert dfa.matches("abc") and dfa.matches("")
    assert not dfa.matches("a\x06b")
    assert not dfa.matches("\x1f")
    assert not dfa.matches('"')
    # JSON string grammar bans raw control chars
    sdfa = compile_regex(json_schema_to_regex({"type": "string"}))
    assert sdfa.matches('"hello"')
    assert not sdfa.matches('"he\x06llo"')
    assert sdfa.matches('"he\\nllo"')      # escaped is fine


def test_dfa_dead_state_pruning():
    """Every reachable DFA state can still reach accept — the mask can never
    trap generation."""
    dfa = compile_regex(r"ab(c|d)e")
    # walk 'ab' then check both continuations stay live
    st = 0
    for ch in "ab":
        st = int(dfa.trans[st, dfa.alphabet.class_of_char(ch)])
        assert st >= 0
    for ch in "cd":
        nxt = int(dfa.trans[st, dfa.alphabet.class_of_char(ch)])
        assert nxt >= 0
    assert int(dfa.trans[st, dfa.alphabet.class_of_char("x")]) == -1


def test_minimization_collapses_nested_json():
    """The generic JSON grammar duplicates sub-automata per nesting level;
    minimized size must stay bounded (table memory scales with S x V)."""
    dfa = compile_regex(json_schema_to_regex(None, depth=3))
    assert dfa.n_states < 800


# ---------------------------------------------------------------------------
# JSON schema -> regex
# ---------------------------------------------------------------------------

def test_schema_regex_object():
    schema = {
        "type": "object",
        "properties": {
            "name": {"type": "string"},
            "age": {"type": "integer"},
            "tags": {"type": "array", "items": {"type": "string"}},
            "ok": {"type": "boolean"},
        },
        "required": ["name", "age"],
    }
    dfa = compile_regex(json_schema_to_regex(schema))
    good = [
        '{"name":"bob","age":3}',
        '{ "name":"x", "age":0, "ok":true}',
        '{"name":"a","age":42,"tags":["x","y"],"ok":false}',
    ]
    bad = ['{"age":3}', '{"name":"bob"}', '{"name":bob,"age":3}',
           '{"age":3,"name":"bob"}', "", "null"]
    for s in good:
        assert dfa.matches(s), s
    for s in bad:
        assert not dfa.matches(s), s


def test_schema_regex_enum_and_anyof():
    dfa = compile_regex(json_schema_to_regex(
        {"enum": ["a", 1, True, None]}))
    for s in ['"a"', "1", "true", "null"]:
        assert dfa.matches(s), s
    assert not dfa.matches('"b"')
    dfa = compile_regex(json_schema_to_regex(
        {"anyOf": [{"type": "integer"}, {"type": "boolean"}]}))
    assert dfa.matches("-12") and dfa.matches("false")
    assert not dfa.matches('"x"')


def test_schema_regex_array_bounds():
    dfa = compile_regex(json_schema_to_regex(
        {"type": "array", "items": {"type": "integer"},
         "minItems": 1, "maxItems": 3}))
    assert dfa.matches("[1]") and dfa.matches("[1, 2, 3]")
    assert not dfa.matches("[]")
    assert not dfa.matches("[1,2,3,4]")


def test_generic_json_value():
    dfa = compile_regex(json_schema_to_regex(None, depth=3))
    for s in ['{"a": [1, 2, {"b": null}]}', '[true, "x"]', "3.5e-2", '"hi"']:
        assert dfa.matches(s), s
    assert not dfa.matches('{"a":}')


# ---------------------------------------------------------------------------
# Token masks
# ---------------------------------------------------------------------------

class _ToyTok:
    vocab_size = 8
    _strs = ["a", "b", "c", "ab", "bc", "x", "", "abc"]

    def decode(self, ids):
        return self._strs[ids[0]]


def test_guide_masks_brute_force():
    """allow[s, t] iff walking token t's chars from state s stays live —
    checked against a per-char walk."""
    dfa = compile_regex("a(b|c)*")
    strs = token_strings(_ToyTok())
    g = build_guide(dfa, strs, key="toy")
    for s in range(dfa.n_states):
        for tid, t in enumerate(strs):
            if t is None:
                assert not g.allow[s, tid]
                continue
            st, ok = s, True
            for ch in t:
                st = int(dfa.trans[st, dfa.alphabet.class_of_char(ch)])
                if st < 0:
                    ok = False
                    break
            assert bool(g.allow[s, tid]) == ok, (s, t)
            if ok:
                assert int(g.next_state[s, tid]) == st


def test_piece_bytes_byte_level():
    from deeppowers_tpu.serving.structured import _piece_bytes
    # GPT-2 style: Ġ = space, Ċ = newline
    out = _piece_bytes(["Ġhello", "Ċ", "abc", "<pad>"], special={3})
    assert out[0] == b" hello"
    assert out[1] == b"\n"
    assert out[2] == b"abc"
    assert out[3] is None   # special ids are always banned
    # sentencepiece style: ▁ marker + <0xNN> byte pieces + special-looking.
    # <0xE4> is a PARTIAL UTF-8 byte — the byte-level DFA takes it raw
    # (pre-rewrite it was conservatively banned).
    out = _piece_bytes(["▁the", "<0x0A>", "<0xE4>", "<s>"], special=set())
    assert out == [b" the", b"\n", b"\xe4", None]


# ---------------------------------------------------------------------------
# End-to-end guided generation (tiny model, CPU)
# ---------------------------------------------------------------------------

TOK = ByteTokenizer()


@pytest.fixture(scope="module")
def guided_engine_factory():
    cfg = tiny_llama_config(vocab_size=260, max_seq_len=64)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)

    def make(**kw):
        kw.setdefault("runtime", RuntimeConfig(
            max_batch_size=4, max_seq_len=64, prefill_buckets=(16, 32)))
        kw.setdefault("act_dtype", jnp.float32)
        kw.setdefault("eos_token_id", TOK.eos_token_id)
        return InferenceEngine(params, cfg, **kw)

    return make


def _run_guided(engine, guide, prompt="say:", max_tokens=40, temperature=0.0,
                seed=0):
    gen = GenerationConfig(max_tokens=max_tokens, temperature=temperature,
                           do_sample=temperature > 0, guide=guide, seed=seed)
    res = engine.generate(TOK.encode(prompt), gen)
    toks = res.token_ids
    if toks and toks[-1] == TOK.eos_token_id:
        toks = toks[:-1]
    return TOK.decode(toks), res


def test_guided_choice_e2e(guided_engine_factory):
    eng = guided_engine_factory()
    guide = guide_for_choice(["yes", "no", "maybe"], TOK)
    for seed in range(3):
        text, res = _run_guided(eng, guide, temperature=1.0, seed=seed)
        assert text in ("yes", "no", "maybe"), text
        assert res.stop_reason == "eos"


def test_guided_regex_e2e(guided_engine_factory):
    eng = guided_engine_factory()
    pattern = r"-?[1-9][0-9]{2,5}"
    guide = compile_guide(pattern, TOK)
    text, _ = _run_guided(eng, guide, temperature=0.8, seed=7)
    assert re.fullmatch(pattern, text), text


def test_guided_json_schema_e2e(guided_engine_factory):
    eng = guided_engine_factory()
    schema = {"type": "object",
              "properties": {"a": {"type": "integer"},
                             "b": {"type": "boolean"}},
              "required": ["a", "b"]}
    guide = guide_for_json(schema, TOK)
    text, _ = _run_guided(eng, guide, max_tokens=60, temperature=0.9, seed=3)
    obj = json.loads(text)
    assert isinstance(obj["a"], int) and isinstance(obj["b"], bool)


def test_guided_multistep_dispatch(guided_engine_factory):
    """The DFA advances on-device inside the multi-step scan — output must
    satisfy the grammar under decode_steps_per_dispatch > 1."""
    eng = guided_engine_factory(runtime=RuntimeConfig(
        max_batch_size=4, max_seq_len=64, prefill_buckets=(16, 32),
        decode_steps_per_dispatch=4))
    pattern = r"(ab|cd)+e"
    guide = compile_guide(pattern, TOK)
    text, _ = _run_guided(eng, guide, temperature=1.0, seed=11)
    assert re.fullmatch(pattern, text), text


def test_guided_and_unguided_share_batch(guided_engine_factory):
    """A guided and an unguided request decode in the same batch without
    cross-contamination."""
    eng = guided_engine_factory()
    guide = guide_for_choice(["alpha", "beta"], TOK)
    g_gen = GenerationConfig(max_tokens=20, temperature=1.0, do_sample=True,
                             guide=guide, seed=1)
    u_gen = GenerationConfig(max_tokens=8, temperature=0.0, do_sample=False)
    s1 = eng.add_request(TOK.encode("pick:"), g_gen, request_id="g")
    s2 = eng.add_request(TOK.encode("free:"), u_gen, request_id="u")
    del s1, s2
    while eng.active_requests:
        eng.step()
    done = {r.request_id: r for r in eng.pop_finished()}
    g_toks = done["g"].token_ids
    if g_toks and g_toks[-1] == TOK.eos_token_id:
        g_toks = g_toks[:-1]
    assert TOK.decode(g_toks) in ("alpha", "beta")
    assert len(done["u"].token_ids) == 8   # unguided ran to max_tokens


def test_guide_no_eos_stops_at_accept(guided_engine_factory):
    """With no EOS id, a guided slot must stop at an accept-only DFA state
    instead of emitting masked-garbage tokens."""
    eng = guided_engine_factory(eos_token_id=None)
    guide = guide_for_choice(["xy"], TOK)
    gen = GenerationConfig(max_tokens=20, temperature=0.0, do_sample=False,
                           guide=guide)
    res = eng.generate(TOK.encode("q:"), gen)
    assert TOK.decode(res.token_ids) == "xy"


@pytest.mark.parametrize("mesh_kw", [dict(model=2), dict(data=2),
                                     dict(data=2, model=2)])
def test_guided_under_mesh_matches_single_device(mesh_kw):
    """Guide tables replicate across the mesh; greedy guided decode must be
    bit-identical to single-device greedy guided decode."""
    from deeppowers_tpu.config import MeshConfig
    from deeppowers_tpu.parallel.mesh import make_mesh

    cfg = tiny_llama_config(vocab_size=260, max_seq_len=64)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    rt = RuntimeConfig(max_batch_size=4, max_seq_len=64,
                       prefill_buckets=(16,))
    guide = compile_guide(r"(ab|cd){1,6}e", TOK)
    gen = GenerationConfig(max_tokens=16, temperature=0.0, do_sample=False,
                           guide=guide)

    def run(mesh):
        eng = InferenceEngine(params, cfg, mesh=mesh, runtime=rt,
                              act_dtype=jnp.float32,
                              eos_token_id=TOK.eos_token_id)
        return eng.generate(TOK.encode("go:"), gen).token_ids

    ref = run(None)
    got = run(make_mesh(MeshConfig(**mesh_kw)))
    assert got == ref
    toks = ref[:-1] if ref and ref[-1] == TOK.eos_token_id else ref
    assert re.fullmatch(r"(ab|cd){1,6}e", TOK.decode(toks))


# ---------------------------------------------------------------------------
# Structured outputs x speculative decoding: the verify distribution is
# masked per DFA state and the row advances per ACCEPTED token
# (runtime/speculative._accept_window) — constrained decoding stays exact
# under speculation.
# ---------------------------------------------------------------------------

def test_guided_speculative_greedy_matches_plain(guided_engine_factory):
    """Greedy guided decode under prompt-lookup speculation must be
    bit-identical to guided decode without speculation (speculative sampling
    is exact with the masked target as p)."""
    pattern = r"(ab|cd){1,8}e"
    guide = compile_guide(pattern, TOK)
    plain = guided_engine_factory()
    spec = guided_engine_factory(runtime=RuntimeConfig(
        max_batch_size=4, max_seq_len=64, prefill_buckets=(16, 32),
        speculative_tokens=3))
    t_plain, _ = _run_guided(plain, guide, max_tokens=20)
    t_spec, res = _run_guided(spec, guide, max_tokens=20)
    assert t_spec == t_plain
    assert re.fullmatch(pattern, t_spec), t_spec
    assert spec.spec_steps > 0


def test_guided_speculative_sampled_respects_grammar(guided_engine_factory):
    """Sampled guided generation under speculation (with multi-step
    dispatch) always satisfies the grammar."""
    eng = guided_engine_factory(runtime=RuntimeConfig(
        max_batch_size=4, max_seq_len=64, prefill_buckets=(16, 32),
        speculative_tokens=2, decode_steps_per_dispatch=2))
    schema = {"type": "object",
              "properties": {"a": {"type": "integer"},
                             "b": {"type": "boolean"}},
              "required": ["a", "b"]}
    guide = guide_for_json(schema, TOK)
    for seed in range(3):
        text, _ = _run_guided(eng, guide, max_tokens=50, temperature=0.9,
                              seed=seed)
        obj = json.loads(text)
        assert isinstance(obj["a"], int) and isinstance(obj["b"], bool)


def test_guided_draft_model_speculation(guided_engine_factory):
    """Draft-model speculation: the draft masks its proposals to the grammar
    (hypothetical DFA walk) and verification stays exact — greedy guided
    output matches the non-speculative engine."""
    cfg = tiny_llama_config(vocab_size=260, max_seq_len=64)
    draft_params = init_params(cfg, jax.random.PRNGKey(9), dtype=jnp.float32)
    pattern = r"(ab|cd){1,8}e"
    guide = compile_guide(pattern, TOK)
    plain = guided_engine_factory()
    spec = guided_engine_factory(
        draft_params=draft_params, draft_cfg=cfg,
        runtime=RuntimeConfig(max_batch_size=4, max_seq_len=64,
                              prefill_buckets=(16, 32),
                              speculative_tokens=2))
    t_plain, _ = _run_guided(plain, guide, max_tokens=20)
    t_spec, _ = _run_guided(spec, guide, max_tokens=20)
    assert t_spec == t_plain
    assert re.fullmatch(pattern, t_spec), t_spec


def test_guided_speculative_no_eos_stops_at_accept(guided_engine_factory):
    """Under speculation, a guided slot with no EOS id must stop at the
    accept-only DFA state mid-window (no masked-garbage emission)."""
    eng = guided_engine_factory(
        eos_token_id=None,
        runtime=RuntimeConfig(max_batch_size=4, max_seq_len=64,
                              prefill_buckets=(16, 32),
                              speculative_tokens=3))
    guide = guide_for_choice(["xyz"], TOK)
    gen = GenerationConfig(max_tokens=20, temperature=0.0, do_sample=False,
                           guide=guide)
    res = eng.generate(TOK.encode("q:"), gen)
    assert TOK.decode(res.token_ids) == "xyz"
    assert res.stop_reason == "guide_complete"


def test_guided_speculative_under_mesh():
    """Spec + guide + mesh: greedy output matches the single-device
    non-speculative guided engine."""
    from deeppowers_tpu.config import MeshConfig
    from deeppowers_tpu.parallel.mesh import make_mesh

    cfg = tiny_llama_config(vocab_size=260, max_seq_len=64)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    guide = compile_guide(r"(ab|cd){1,6}e", TOK)
    gen = GenerationConfig(max_tokens=16, temperature=0.0, do_sample=False,
                           guide=guide)

    def run(mesh, spec_k):
        rt = RuntimeConfig(max_batch_size=4, max_seq_len=64,
                           prefill_buckets=(16,), speculative_tokens=spec_k)
        eng = InferenceEngine(params, cfg, mesh=mesh, runtime=rt,
                              act_dtype=jnp.float32,
                              eos_token_id=TOK.eos_token_id)
        return eng.generate(TOK.encode("go:"), gen).token_ids

    ref = run(None, 0)
    got = run(make_mesh(MeshConfig(model=2)), 3)
    assert got == ref


def test_guide_cache_reuse():
    g1 = compile_guide("abc", TOK)
    g2 = compile_guide("abc", TOK)
    assert g1 is g2


def test_engine_guide_registration_idempotent(guided_engine_factory):
    eng = guided_engine_factory()
    guide = guide_for_choice(["aa", "bb"], TOK)
    off1 = eng._register_guide(guide)
    off2 = eng._register_guide(guide)
    assert off1 == off2
    assert eng._guide_dev[0].shape[0] == guide.n_states
    # second distinct guide appends rows
    guide2 = compile_guide("zz+", TOK)
    off3 = eng._register_guide(guide2)
    assert off3 == guide.n_states
    assert isinstance(guide2, Guide)


# ---------------------------------------------------------------------------
# Byte-level DFA: non-ASCII without escapes (VERDICT round 1 item 10)
# ---------------------------------------------------------------------------


def test_unicode_regex_dfa():
    dfa = compile_regex("[α-ω]+")
    assert dfa.matches("αβγ")
    assert not dfa.matches("abc")
    assert not dfa.matches("Ω")          # uppercase outside the range
    dfa2 = compile_regex("héllo|wörld")
    assert dfa2.matches("héllo") and dfa2.matches("wörld")
    assert not dfa2.matches("hello")


def test_negated_class_spans_unicode():
    # [^"] must admit any non-quote codepoint, including multi-byte ones
    dfa = compile_regex(r'"[^"]*"')
    assert dfa.matches('"日本語 ok"')
    assert not dfa.matches('"a"b"')


def test_partial_utf8_tokens_walk_the_dfa():
    """Byte tokens that are invalid UTF-8 alone (0xC3, 0xA9, ...) must be
    allowed mid-character — the pre-rewrite char DFA banned them everywhere."""
    dfa = compile_regex("é")             # bytes C3 A9
    tb = token_strings  # noqa: F841  (API still exported)
    from deeppowers_tpu.serving.structured import token_bytes
    toks = token_bytes(TOK)
    assert toks[0xC3 + 4] == b"\xc3"     # ByteTokenizer raw byte ids
    g = build_guide(dfa, toks, key="e")
    t_c3 = 0xC3 + 4
    t_a9 = 0xA9 + 4
    assert bool(g.allow[0, t_c3])        # partial byte legal at start
    mid = int(g.next_state[0, t_c3])
    assert bool(g.allow[mid, t_a9])      # completes the character
    fin = int(g.next_state[mid, t_a9])
    assert bool(g.eos_allowed[fin])
    assert not bool(g.allow[0, t_a9])    # lone continuation byte illegal


def test_guided_nonascii_end_to_end(guided_engine_factory):
    """Guided generation emits multi-byte UTF-8 assembled from single-byte
    tokens — no \\uXXXX escapes."""
    eng = guided_engine_factory()
    guide = guide_for_choice(["héllo", "wörld", "日本"], TOK)
    for seed in range(3):
        text, res = _run_guided(eng, guide, temperature=1.0, seed=seed)
        assert text in ("héllo", "wörld", "日本"), text
        assert res.stop_reason == "eos"


def test_guided_json_nonascii_string(guided_engine_factory):
    """A schema-guided string may contain raw non-ASCII content."""
    eng = guided_engine_factory()
    schema = {"type": "string", "minLength": 1, "maxLength": 6}
    guide = guide_for_json(schema, TOK)
    text, _ = _run_guided(eng, guide, max_tokens=40, temperature=1.2, seed=11)
    decoded = json.loads(text)
    assert isinstance(decoded, str)
